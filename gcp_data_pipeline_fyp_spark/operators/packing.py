"""Sequence packing — concatenate-and-chunk documents into token bins.

Training pipelines concatenate tokenized documents in a deterministic
order and slice the stream into fixed-length examples (`max_tokens`).
The assignment each document needs is its global START OFFSET in the
concatenated token stream; `pack_id = start_offset div max_tokens` is
then the training example its first token lands in (documents may span
pack boundaries — that is the concatenate-then-chunk semantics, the
splitting itself happens at tokenization time).

A global cumulative sum is the textbook scale trap: a single
`Window.orderBy(id)` moves the whole corpus to ONE partition. This
implementation is a two-level distributed prefix sum instead:

1. rows are bucketed by `id div bucket_span` (order-preserving);
2. an intra-bucket cumulative sum runs partitioned by bucket — fully
   parallel, no global shuffle to one node;
3. per-bucket totals (one row per bucket) get a cumulative offset via
   a window over the tiny bucket table — the only single-partition
   step, sized corpus_rows / bucket_span (1B docs @ span 4096 ->
   ~250k bucket rows);
4. offsets broadcast-join back and add to the intra-bucket sums.

Rows with NULL token counts keep NULL offsets (they contribute nothing
to the stream) — coalesce counts to 0 upstream if they should pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__pack_bucket"
_BTOTAL = "__pack_btotal"
_BOFFSET = "__pack_boffset"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    max_tokens: int,
    bucket_span: int = 4096,
) -> DataFrame:
    """Add `start_offset` and `pack_id` columns (ordered by `id_col`).

    Deterministic: the pack layout is a pure function of the
    (id, n_tokens) pairs — stable across partitioning, retries, and
    engines, like everything else keyed in this package.
    """
    # integral `div`, not float division + floor: exact for any int64 id
    bucketed = df.withColumn(_BUCKET, F.expr(f"{id_col} div {bucket_span}"))
    w_intra = (
        Window.partitionBy(_BUCKET)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # inclusive cumsum within the bucket; subtract the row's own count
    # afterwards to get its start offset
    intra = F.sum(F.col(n_tokens_col)).over(w_intra)
    totals = bucketed.groupBy(_BUCKET).agg(F.sum(n_tokens_col).alias(_BTOTAL))
    # tiny table (one row per bucket): the single-partition window is
    # bounded by corpus_rows / bucket_span, not corpus_rows
    w_bucket = (
        Window.orderBy(F.col(_BUCKET).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col(_BUCKET),
        F.coalesce(F.sum(_BTOTAL).over(w_bucket), F.lit(0)).alias(_BOFFSET),
    )
    out = bucketed.join(F.broadcast(offsets), _BUCKET)
    start = (F.col(_BOFFSET) + intra - F.col(n_tokens_col)).alias("start_offset")
    return (
        out.select("*", start)
        .withColumn("pack_id", F.expr(f"start_offset div {max_tokens}"))
        .drop(_BUCKET, _BOFFSET)
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    length_col: str,
    batch_size: int,
    seed: int = 0,
) -> DataFrame:
    """Assign rows to fixed-size batches of SIMILAR length ->
    (id, length bucket, batch_id) — the batching layout inference and
    training loops want: padding waste inside a batch is bounded by
    the bucket's length spread instead of the corpus-wide maximum.

    Buckets are powers of two of the length (floor(log2 n), computed
    as binary-digit count minus one — pure integer logic, no float
    log whose last ulp could disagree across engines at exact powers
    of two); within a
    bucket rows order by content hash (the `hash_sample` basis — an
    unbiased deterministic shuffle, so batch composition is stable
    across runs/engines and batches mix sources instead of clumping
    input order), and consecutive `batch_size` rows share a batch id.
    One shuffle (partition by bucket) + per-bucket rank; a single
    giant bucket serializes its sort — at corpus scale sub-split the
    hot bucket on a hash range exactly like `token_budget_sample`
    documents."""
    from gcp_data_pipeline_fyp_spark.operators.sampling import hash_bucket

    n = F.col(length_col).cast("long")
    bucket = (F.length(F.bin(F.greatest(n, F.lit(1)))) - 1).cast("int")
    w = Window.partitionBy(bucket).orderBy(
        hash_bucket([id_col], seed).asc(), F.col(id_col).asc()
    )
    rn = F.row_number().over(w)
    return df.filter(n > 0).select(
        F.col(id_col),
        bucket.alias("len_bucket"),
        F.floor((rn - 1) / batch_size).cast("int").alias("batch_id"),
    )


def epoch_shuffle_order(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic per-epoch global training order — every training
    run needs "shuffle the corpus differently each epoch, identically
    on every retry/restart". Adds `global_pos` (0-based, a bijection
    onto 0..n-1): the row's rank under the keyed permutation
    md5(epoch || '_' || id), tie-broken by id.

    A global `Window.orderBy(key)` is the same single-partition trap
    pack_sequences documents; the rank here uses the same two-level
    escape, with a twist that makes it UNCONDITIONALLY balanced: the
    bucket is the hash key's high bits, and the key is uniform by
    construction, so bucket occupancy is ~n/n_buckets REGARDLESS of
    the id distribution (the id-div bucketing above is only as
    balanced as the ids). Intra-bucket ranks run parallel per bucket;
    only the n_buckets-sized totals table sees a window.

    The key is the md5-60-bit engine standard (functions/ids.py), so
    a DuckDB oracle replays the exact permutation; chain the output
    into `pack_sequences` (ordered by global_pos) to get the epoch's
    packed layout.
    """
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_", F.lit(int(epoch)), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    span = (1 << 60) // n_buckets
    keyed = df.withColumn("__key", key).withColumn(
        "__b", F.expr(f"__key div {span}")
    )
    w_intra = Window.partitionBy("__b").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    totals = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__bt"))
    w_bucket = (
        Window.orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__bt").over(w_bucket), F.lit(0)).alias("__off"),
    )
    return (
        keyed.join(F.broadcast(offsets), "__b")
        .withColumn(
            "global_pos",
            (F.col("__off") + F.row_number().over(w_intra) - 1).cast("long"),
        )
        .drop("__key", "__b", "__off")
    )


def interleave_by_source(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    epoch: int = 0,
    n_buckets: int = 4096,
) -> DataFrame:
    """Mixture-preserving training order — stride scheduling over
    sources: within each source rows take a seeded random order
    (rank_in_source, the same md5(epoch_id) permutation as
    `epoch_shuffle_order`), and the cross-source order key is
    `(rank_in_source + 0.5) / weight` — a weight-2 source appears
    twice as often as a weight-1 source at EVERY prefix of the stream,
    not just in expectation (the classic stride-scheduler invariant).
    `epoch_shuffle_order` randomizes globally; this keeps the mixture
    locally uniform, which is what curriculum-free training schedules
    want from a source mix.

    Emits `rank_in_source` (dense 0-based within source) and
    `interleave_micro` (the stride key in integer micro-units — write
    shards ordered by it; ties share a micro grain only when strides
    collide exactly, broken by id downstream). Ranks use the
    uniform-hash-bucket two-level pattern partitioned by (source,
    bucket): parallel within every source, only (sources·buckets)-
    sized frames see windows — no per-source single-partition sort.

    Unknown sources (no weight entry) are dropped with the filter
    stated here: a silent weight default would skew the mixture.
    Weights must be strictly positive, enforced eagerly: a 0.0 weight
    would make the stride division yield NULL interleave_micro
    (rows silently unsortable, not an error) and a negative weight
    would invert the source's order — both are configuration bugs,
    rejected with the same strictness as unknown sources.
    """
    bad = {s: w for s, w in weights.items() if not float(w) > 0.0}
    if bad:
        raise ValueError(
            f"interleave_by_source weights must be > 0; got {bad!r}"
        )
    src_w = [(s, float(w)) for s, w in sorted(weights.items())]
    wmap = F.create_map(
        *[F.lit(x) for sw in src_w for x in sw]
    )
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_",
                    F.lit(int(epoch)),
                    F.col(source_col).cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    span = (1 << 60) // n_buckets
    keyed = (
        df.filter(F.col(source_col).isin([s for s, _ in src_w]))
        .withColumn("__key", key)
        .withColumn("__b", F.expr(f"__key div {span}"))
    )
    w_intra = Window.partitionBy(source_col, "__b").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    totals = keyed.groupBy(source_col, "__b").agg(
        F.count(F.lit(1)).alias("__bt")
    )
    w_bucket = (
        Window.partitionBy(source_col)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        source_col,
        "__b",
        F.coalesce(F.sum("__bt").over(w_bucket), F.lit(0)).alias("__off"),
    )
    ranked = keyed.join(F.broadcast(offsets), [source_col, "__b"]).withColumn(
        "rank_in_source",
        (F.col("__off") + F.row_number().over(w_intra) - 1).cast("long"),
    )
    stride = (F.col("rank_in_source").cast("double") + 0.5) / wmap[
        F.col(source_col)
    ]
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    return ranked.withColumn(
        "interleave_micro", micro6(stride)
    ).drop("__key", "__b", "__off")
