"""Incremental rollup maintenance (partial-aggregate merge).

The reference rebuilds its aggregate layer from the full fact on every
load; at 100 TB the cheap maintenance strategy is the classic
materialized-rollup one: keep PARTIAL STATES (count + exact sums) per
group, aggregate only the new delta, and MERGE states — count and sum
are self-mergeable, and avg is derived at read time (sum/n). A daily
delta then costs one delta-sized aggregation plus a group-key-sized
union re-aggregation, never a re-scan of the base.

States use exact decimal sums (queries_util parity rule), so the merge
is bit-stable regardless of how many increments it went through or how
partials were partitioned — merging (base + d1 + d2) in any order
yields identical bytes to a from-scratch rebuild.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.queries_util import roundn


def rollup_state(
    df: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Partial-aggregate state per key group: `__n` + exact decimal sums.

    The state schema is `keys..., __n, __sum_<col>...` — mergeable with
    `merge_states` and readable with `finalize_state`.
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.col(c).cast("decimal(18,2)")).alias(f"__sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge partial states (count/sum are distributive: re-sum them).

    The inputs are group-key-sized, so this union + re-agg shuffles
    state rows, not fact rows.
    """
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    sum_cols = [c for c in u.columns if c.startswith("__sum_")]
    aggs = [F.sum("__n").alias("__n")] + [
        F.sum(c).alias(c) for c in sum_cols
    ]
    return u.groupBy(*keys).agg(*aggs)


def finalize_state(
    state: DataFrame, sum_cols: Sequence[str], avg_cols: Sequence[str] = ()
) -> DataFrame:
    """Readable rollup from a state: n, per-col double sums, derived avgs."""
    out = state.withColumnRenamed("__n", "n")
    for c in sum_cols:
        out = out.withColumn(f"sum_{c}", F.col(f"__sum_{c}").cast("double"))
    for c in avg_cols:
        out = out.withColumn(
            f"avg_{c}",
            roundn(F.col(f"__sum_{c}").cast("double") / F.col("n"), 6),
        )
    return out.drop(*[f"__sum_{c}" for c in sum_cols])


# ---------------------------------------------------------------- HLL states
def hll_state(
    df: DataFrame, keys: Sequence[str], distinct_cols: Sequence[str]
) -> DataFrame:
    """Distinct-count partial state per group: one Datasketches HLL
    sketch (binary) per column.

    COUNT DISTINCT is the aggregate that breaks naive rollup
    maintenance — distinct sets don't add. HLL sketches DO merge
    (union), so a distinct-count rollup over 100 TB is maintainable
    from per-delta sketch states a few KB per group, never by
    re-scanning the base or storing key sets.
    """
    aggs = [
        F.hll_sketch_agg(F.col(c)).alias(f"__hll_{c}") for c in distinct_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_hll_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Union HLL states across increments (sketch union, group-key-sized)."""
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    hll_cols = [c for c in u.columns if c.startswith("__hll_")]
    aggs = [F.hll_union_agg(F.col(c)).alias(c) for c in hll_cols]
    return u.groupBy(*keys).agg(*aggs)


def finalize_hll_state(state: DataFrame) -> DataFrame:
    """Sketch states -> approx distinct counts (`n_distinct_<col>`)."""
    out = state
    for c in [c for c in state.columns if c.startswith("__hll_")]:
        out = out.withColumn(
            f"n_distinct_{c[len('__hll_'):]}",
            F.hll_sketch_estimate(F.col(c)).cast("long"),
        )
    return out.drop(*[c for c in state.columns if c.startswith("__hll_")])


# ----------------------------------------------------------- quantile states
# Log-bucket histogram sketch: bucket(v) = floor(ln v / ln g)+1 (sign-
# mirrored for negatives, 0 for zero), so every bucket spans a fixed
# RELATIVE width g and any quantile read back from the histogram is
# within a factor sqrt(g) of the true value. Unlike percentile_approx
# (whose KLL-like state Spark does not expose for persistence), these
# states are plain (key, bucket, count) rows: exactly mergeable across
# deltas by re-summing, storable in any warehouse table, and identical
# no matter how the input was partitioned or how many increments were
# merged — the quantile analog of rollup_state above. Public technique:
# log-width histogram quantiles as in HdrHistogram / DDSketch
# (Masson et al., VLDB 2019).

QUANTILE_GROWTH = 1.02  # ~1% relative error per bucket boundary


def quantile_bucket(col, growth: float = QUANTILE_GROWTH):
    """Deterministic log-bucket index for a double column."""
    import math

    v = F.col(col) if isinstance(col, str) else col
    v = v.cast("double")
    lng = F.lit(math.log(growth))
    return (
        F.when(v > 0, F.floor(F.log(v) / lng) + 1)
        .when(v < 0, -(F.floor(F.log(-v) / lng) + 1))
        .otherwise(0)
        .cast("long")
    )


def quantile_state(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    growth: float = QUANTILE_GROWTH,
) -> DataFrame:
    """Quantile partial state per key group: `keys..., __qb, __qn` rows.

    One shuffle, group-key x O(log range) rows out — a few hundred
    buckets cover 12 orders of magnitude at g=1.02, so per-delta states
    stay tiny regardless of fact size.
    """
    v = F.col(col).cast("double")
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys, quantile_bucket(v, growth).alias("__qb"))
        .agg(F.count(F.lit(1)).alias("__qn"))
    )


def merge_quantile_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Merge quantile states across increments (histograms add)."""
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy(*keys, "__qb").agg(F.sum("__qn").alias("__qn"))


def quantiles_from_state(
    state: DataFrame,
    keys: Sequence[str],
    ps: Sequence[float] = (0.5, 0.95, 0.99),
    growth: float = QUANTILE_GROWTH,
) -> DataFrame:
    """Read quantiles off a state: `keys..., n, p<pp>...` (rounded).

    Picks the first bucket whose cumulative count reaches ceil(p*n) and
    returns the bucket's geometric midpoint — deterministic on any
    partitioning (cumsum is over the total bucket order per key).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy("__qb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = state.withColumn("__cum", F.sum("__qn").over(w)).withColumn(
        "__tot", F.sum("__qn").over(Window.partitionBy(*keys))
    )

    def _label(p: float) -> str:
        return "p" + str(p * 100 if p * 100 % 1 else int(p * 100)).replace(".", "_")

    aggs = [F.max("__tot").alias("n")]
    for p in ps:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") >= F.ceil(F.lit(p) * F.col("__tot")),
                    F.col("__qb"),
                )
            ).alias(f"__b_{_label(p)}")
        )
    out = cum.groupBy(*keys).agg(*aggs)
    for p in ps:
        b = F.col(f"__b_{_label(p)}")
        val = (
            F.when(b > 0, F.pow(F.lit(growth), b.cast("double") - 0.5))
            .when(b < 0, -F.pow(F.lit(growth), (-b).cast("double") - 0.5))
            .otherwise(F.lit(0.0))
        )
        out = out.withColumn(_label(p), roundn(val, 6)).drop(f"__b_{_label(p)}")
    return out
