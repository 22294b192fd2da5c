"""Training-shard export — deterministic shuffle + bounded shard files.

The last step of a training-data pipeline: write the corpus as N
shards whose assignment and internal order are a pure function of row
content, so (a) example order is pseudo-random (breaks source/crawl
locality, which harms training), (b) re-running the export on the same
corpus produces byte-identical shard membership — no RNG, no
dependence on partition layout, and (c) downstream loaders can read
`shard=K/` directories independently.

Scale shape: one shuffle (the repartition onto shards), map-side sort
within each shard, and `maxRecordsPerFile` keeps individual parquet
files bounded regardless of shard row counts — at 100 TB the file
size, shard count, and record cap are the three knobs; nothing here is
driver-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.sampling import _BUCKETS, hash_bucket

SHARD_COL = "shard"


def with_shard(
    df: DataFrame, key_cols: Sequence[str], n_shards: int, seed: int = 0
) -> DataFrame:
    """Content-keyed shard id in [0, n_shards) + the order key column."""
    b = hash_bucket(key_cols, seed)
    return df.withColumn("__order", b).withColumn(
        SHARD_COL, F.expr(f"__order * {n_shards} div {_BUCKETS}").cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    n_shards: int,
    max_records_per_file: int | None = None,
    seed: int = 0,
) -> None:
    """Write `path/shard=K/part-*.parquet`, deterministically sharded.

    Rows within a shard are sorted by (hash bucket, key) — a stable
    pseudo-random order independent of input partitioning.
    """
    out = with_shard(df, key_cols, n_shards, seed)
    w = (
        out.repartition(F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, "__order", *key_cols)
        .drop("__order")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
