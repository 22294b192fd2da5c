"""k-anonymity suppression — group-size privacy gating for corpus export.

Training-data pipelines ship slices of a corpus to third parties; the
standard release gate next to span-level PII redaction
(`functions/text.py` redact_pii) is row-level k-anonymity: a row may
only be released if at least k rows share its quasi-identifier tuple
(the attacker-joinable columns — language, source, size band, ...).
Groups smaller than k are SUPPRESSED outright; numeric identifiers are
first GENERALIZED into bands so grouping is coarse enough to be
meaningful.

Spark-native rendering: one aggregation for the group sizes, then a
null-safe inner join back — never a window over the full frame (the
counts side is |distinct quasi tuples| rows, typically ~10^2-10^6 at
100 TB, so AQE broadcasts it; a window would shuffle every corpus row
into quasi-tuple partitions AND carry full rows through the sort).
NULL is a legitimate quasi value (groupBy keeps it as its own group;
the join condition is eqNullSafe to match).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def generalize_band(col: Column | str, width: int) -> Column:
    """Generalize a numeric quasi-identifier into a band floor
    (`floor(v / width) * width` — exact integer arithmetic for integer
    inputs, so every engine bands identically)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / F.lit(width)) * F.lit(width)).cast("bigint")


def _group_sizes(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__gsize"))


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Release only rows whose quasi-identifier group has >= k members.

    Returns the input rows (original columns) of released groups.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # re-alias the size side: groupBy keeps the grouping attributes'
    # exprIds, so joining back on the bare names is the ambiguous
    # self-join trap (Spark resolves it by plan id but warns
    # "trivially true equals predicate")
    sizes = (
        _group_sizes(df, quasi_cols)
        .filter(F.col("__gsize") >= k)
        .select(*[F.col(c).alias(f"__q_{c}") for c in quasi_cols])
    )
    cond = None
    for c in quasi_cols:
        e = df[c].eqNullSafe(F.col(f"__q_{c}"))
        cond = e if cond is None else cond & e
    return df.join(sizes, cond, "left_semi")


def kanonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Release audit: per-group size and released/suppressed verdict —
    the reviewable artifact that accompanies a gated export."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return _group_sizes(df, quasi_cols).select(
        *quasi_cols,
        F.col("__gsize").alias("group_size"),
        (F.col("__gsize") >= k).alias("released"),
    )


def ldiversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_distinct: int,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): k-anonymity
    alone leaks when a released group is homogeneous in the SENSITIVE
    attribute — every member shares it, so group membership reveals
    it. A group is l-diverse when the sensitive column takes >= l
    distinct values inside it. One exact groupBy — the same shape and
    scale posture as `kanonymity_report`."""
    if l_distinct < 1:
        raise ValueError(f"l must be >= 1, got {l_distinct}")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
        (F.countDistinct(sensitive_col) >= l_distinct).alias("released"),
    )


def suppress_low_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_distinct: int,
) -> DataFrame:
    """Release only rows whose quasi-group is l-diverse in
    `sensitive_col` (null-safe semi join back, like
    `suppress_small_groups`)."""
    if l_distinct < 1:
        raise ValueError(f"l must be >= 1, got {l_distinct}")
    ok = (
        df.groupBy(*quasi_cols)
        .agg(F.countDistinct(sensitive_col).alias("__nd"))
        .filter(F.col("__nd") >= l_distinct)
        .select(*[F.col(c).alias(f"__q_{c}") for c in quasi_cols])
    )
    cond = None
    for c in quasi_cols:
        e = df[c].eqNullSafe(F.col(f"__q_{c}"))
        cond = e if cond is None else cond & e
    return df.join(ok, cond, "left_semi")
