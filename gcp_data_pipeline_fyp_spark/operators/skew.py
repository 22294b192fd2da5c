"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles sort-merge joins at runtime; these
operators cover the cases AQE does not: hot-key *aggregations* (a
single reducer owning one giant key) and skewed joins that must stay
hash-based. Salts are deterministic (xxhash64 of a chosen column mod
buckets), never `rand()` — plans stay rerun-stable and retry-safe
(a retried task re-salts identically).

- `salted_agg`: two-phase aggregation — partial groupBy((keys, salt))
  spreads a hot key over `buckets` reducers, final groupBy(keys)
  combines the partials. Works for any algebraic aggregate (sum,
  count, min, max); averages = sum/count at the final step.
- `salted_join`: replicate the build side `buckets`× with an explicit
  salt column, salt the probe side deterministically, join on
  (keys, salt). Output equals the plain join, but no reducer sees a
  whole hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column | str, buckets: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    salt_from: str | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase sum/count per key, hot keys spread over `buckets` reducers.

    `salt_from` must be a NON-key column (ideally high-cardinality, e.g.
    a row id): salting by a grouping key is a constant per group and
    spreads nothing — that misuse is rejected loudly.
    """
    if salt_from is None or salt_from in keys:
        raise ValueError(
            "salted_agg needs salt_from set to a non-grouping column; "
            "a salt derived from a grouping key is constant per group "
            "and cannot spread a hot key"
        )
    salted = df.withColumn("__salt", _salt(salt_from, buckets))
    partial_aggs = []
    for c in sum_cols:
        partial_aggs.append(F.sum(c).alias(f"__sum_{c}"))
    if count:
        partial_aggs.append(F.count(F.lit(1)).alias("__cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = []
    for c in sum_cols:
        final_aggs.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    if count:
        final_aggs.append(F.sum("__cnt").alias("n_rows"))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    salt_from: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join equal to left.join(right, keys, how) with hot keys spread.

    `salt_from` is a left-side column giving each left row a
    deterministic bucket; the (smaller) right side is replicated
    `buckets`x. Supported how: inner / left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    l_salted = left.withColumn("__salt", _salt(salt_from, buckets))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l_salted.join(r_salted, [*keys, "__salt"], how)
    return out.drop("__salt")
