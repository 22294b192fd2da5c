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


MANIFEST_NAME = "_MANIFEST.json"


def _shard_stats(spark, path: str) -> DataFrame:
    """Per-shard (n_rows, content fingerprint) computed from what is ON
    DISK — the manifest describes the written artifact, not the frame
    that produced it. The fingerprint is bit_xor of per-row xxhash64
    over all data columns: order- and partition-independent (XOR
    commutes), no overflow (unlike an int64 sum under ANSI). One scan
    of the shard tree."""
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != SHARD_COL]
    h = F.xxhash64(*[F.col(c) for c in sorted(data_cols)])
    return (
        df.withColumn("__h", h)
        .groupBy(SHARD_COL)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__h)").alias("fingerprint"),
        )
    )


def write_shard_manifest(spark, path: str) -> dict:
    """Write `path/_MANIFEST.json`: per-shard row counts + content
    fingerprints plus the column schema — the integrity contract a
    training loader checks before (and a `verify_shards` call checks
    after) shipping shards between systems. Returns the manifest."""
    import json
    import os

    df = spark.read.parquet(path)
    shards = {
        str(r[SHARD_COL]): {
            "n_rows": r["n_rows"],
            "fingerprint": str(r["fingerprint"]),
        }
        for r in _shard_stats(spark, path).collect()
    }
    manifest = {
        "shards": shards,
        "n_shards": len(shards),
        "total_rows": sum(s["n_rows"] for s in shards.values()),
        "columns": [
            c for c in sorted(df.columns) if c != SHARD_COL
        ],
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_shards(spark, path: str) -> list[str]:
    """Re-fingerprint the shard tree and diff against its manifest.
    Returns problem strings (empty = verified): missing manifest,
    missing/extra shards, row-count or fingerprint mismatches —
    the post-transfer / post-restore integrity check."""
    import json
    import os

    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return [f"no {MANIFEST_NAME} at {path}"]
    with open(mpath) as fh:
        manifest = json.load(fh)
    on_disk_cols = [
        c
        for c in sorted(spark.read.parquet(path).columns)
        if c != SHARD_COL
    ]
    if on_disk_cols != manifest.get("columns"):
        # schema drift invalidates every fingerprint; report it ONCE
        # instead of attributing a bogus mismatch to every shard
        return [
            f"schema mismatch: manifest columns {manifest.get('columns')} "
            f"!= on-disk {on_disk_cols}"
        ]
    actual = {
        str(r[SHARD_COL]): (r["n_rows"], str(r["fingerprint"]))
        for r in _shard_stats(spark, path).collect()
    }
    problems: list[str] = []
    expected = manifest["shards"]
    for shard in sorted(set(expected) | set(actual), key=int):
        if shard not in actual:
            problems.append(f"shard {shard}: missing on disk")
        elif shard not in expected:
            problems.append(f"shard {shard}: not in manifest")
        else:
            n, fp = actual[shard]
            e = expected[shard]
            if n != e["n_rows"]:
                problems.append(
                    f"shard {shard}: n_rows {n} != manifest {e['n_rows']}"
                )
            elif fp != e["fingerprint"]:
                problems.append(f"shard {shard}: fingerprint mismatch")
    return problems
