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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
            F.round(F.col(f"__sum_{c}").cast("double") / F.col("n"), 6),
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
