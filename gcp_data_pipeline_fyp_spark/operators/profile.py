"""Data-quality profiling + statistical anomaly detection.

Operational layer for a large-scale pipeline: before training on (or
loading) a table you profile it — null fractions, cardinalities,
moments, ranges — and you flag statistical outliers per group. Both
are single-pass aggregations:

- `profile_numeric` computes every column's metrics in ONE `agg`
  (one scan, one reduce) and reshapes to a row-per-column via an
  explode of struct literals — never one job per column.
- `zscore_outliers` is the classic per-key anomaly gate: group stats
  (one shuffle over the key), broadcast back, filter. The stats side
  is |keys|-sized, so the join is a broadcast at any corpus scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.queries_util import roundn


def profile_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per column: counts, distincts, moments, range.

    Moments are rounded to 6 decimals (the package's float
    canonicalization convention) so results are reproducible across
    engines and partition orders.
    """
    aggs: list = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            roundn(F.avg(c), 6).alias(f"{c}__mean"),
            roundn(F.stddev_samp(c), 6).alias(f"{c}__std"),
            roundn(F.min(c).cast("double"), 6).alias(f"{c}__min"),
            roundn(F.max(c).cast("double"), 6).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nonnull").alias("n_nonnull"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__std").alias("std"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def zscore_outliers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Rows whose value exceeds mean + z*std of their key group.

    The threshold is rounded to 6 decimals before comparison so the
    outlier set is stable across engines and aggregation orders
    (double summation order perturbs moments at ~1e-12 — far below
    the rounding grain).
    """
    stats = df.groupBy(*key_cols).agg(
        F.avg(value_col).alias("__mean"), F.stddev_samp(value_col).alias("__std")
    )
    thresh = roundn(F.col("__mean") + F.lit(z) * F.col("__std"), 6)
    return (
        df.join(F.broadcast(stats), list(key_cols))
        .filter(F.col(value_col) > thresh)
        .drop("__mean", "__std")
    )


def exact_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    alias: str = "corr_micro",
) -> DataFrame:
    """Pearson correlation with DETERMINISTIC results -> one row per
    group carrying `n` and the correlation in micro-units.

    Engine-native `corr()` streams floating-point co-moments, so the
    result depends on partition/merge order — it can never hash-certify
    and two runs of the same job can disagree in the last ulps. This
    form accumulates the five sufficient statistics (Σx, Σy, Σxy, Σx²,
    Σy²) as EXACT decimals (order-independent by construction), then
    evaluates the closed-form correlation once in double — identical
    inputs, identical expression order, identical result on any
    partitioning and in any engine. One aggregation pass; NULL when
    either variance is zero.

    Domain: inputs are cast to decimal(18,4) (values up to ~10^14 at
    4 dp); a column beyond that raises under ANSI mode rather than
    silently truncating — rescale such columns before correlating."""
    # (18,4) inputs -> (37,8) products: inside both engines' 38-digit
    # decimal ceiling without overflow or silent rescaling
    x = F.col(x_col).cast("decimal(18,4)")
    y = F.col(y_col).cast("decimal(18,4)")
    g = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(y).cast("double").alias("__sy"),
        F.sum((x * y).cast("decimal(38,8)")).cast("double").alias("__sxy"),
        F.sum((x * x).cast("decimal(38,8)")).cast("double").alias("__sxx"),
        F.sum((y * y).cast("decimal(38,8)")).cast("double").alias("__syy"),
    )
    nn = F.col("n").cast("double")
    cov = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = nn * F.col("__syy") - F.col("__sy") * F.col("__sy")
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    # try_divide: a zero-variance group yields NULL (ANSI division
    # would throw mid-job); SQL mirror uses nullif on the denominator
    return g.select(
        *group_cols,
        "n",
        micro6(F.try_divide(cov, F.sqrt(vx * vy))).alias(alias),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    id_cols: Sequence[str],
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outliers by modified z-score: |value - median| /
    (1.4826 * MAD) > threshold, per group.

    The mean/stddev z-score (`zscore_outliers`) breaks exactly when
    you need it — heavy outliers inflate the stddev and mask
    themselves; median and MAD have a 50% breakdown point. Two exact
    percentile passes (group medians broadcast between them), flagged
    rows only. `robust_z_micro` emits in micro-units; a zero-MAD
    group yields NULL scores (try_divide) and flags nothing.

    Spark's exact `percentile` buffers each GROUP's values on one
    executor — right for the certified path and the usual many-groups
    shape; for a single corpus-sized group swap in approx_percentile
    (same call shape, documented accuracy trade)."""
    gcols = [F.col(c) for c in group_cols]
    med = df.groupBy(*gcols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), list(group_cols)).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(*gcols).agg(
        F.expr("percentile(__ad, 0.5)").alias("__mad")
    )
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    scored = dev.join(F.broadcast(mad), list(group_cols)).select(
        *id_cols,
        *group_cols,
        micro6(
            F.try_divide(
                F.col(value_col) - F.col("__med"),
                F.lit(1.4826) * F.col("__mad"),
            )
        ).alias("robust_z_micro"),
    )
    t = int(round(threshold * 1_000_000))
    return scored.filter(
        (F.col("robust_z_micro") >= t) | (F.col("robust_z_micro") <= -t)
    )


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group least-squares trend line (slope + intercept), exact
    and deterministic — one row per group with `n`, `slope_micro`,
    `intercept_micro`.

    The closed form needs the same five sufficient statistics as
    `exact_corr` and inherits its whole design: Σ as exact decimals
    (order-independent on any partitioning), closed form evaluated
    ONCE in double with a pinned expression order, try_divide ->
    NULL on zero x-variance. One aggregation pass; no per-group
    iteration, no driver loop — trend detection over a trillion-row
    fact is a single groupBy at 100 TB. Same (18,4) input domain as
    `exact_corr` (rescale wider columns first).
    """
    x = F.col(x_col).cast("decimal(18,4)")
    y = F.col(y_col).cast("decimal(18,4)")
    g = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum(y).cast("double").alias("__sy"),
        F.sum((x * y).cast("decimal(38,8)")).cast("double").alias("__sxy"),
        F.sum((x * x).cast("decimal(38,8)")).cast("double").alias("__sxx"),
    )
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    nn = F.col("n").cast("double")
    cov = nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.try_divide(cov, vx)
    intercept = (F.col("__sy") - slope * F.col("__sx")) / nn
    return g.select(
        *group_cols,
        "n",
        micro6(slope).alias("slope_micro"),
        micro6(intercept).alias("intercept_micro"),
    )


def group_znormalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alias: str = "z_micro",
) -> DataFrame:
    """Per-row z-score against the row's group, deterministic — the
    cross-source score calibration step of a corpus-mixing pipeline
    (a length/quality score is only comparable across crawls after
    per-source normalization).

    Same design as `exact_corr`: the group's sufficient statistics
    (n, Σx, Σx²) accumulate as EXACT decimals (order-independent),
    then mean/variance/z evaluate once in double with a pinned
    expression order — identical bytes on any partitioning and in any
    engine. Population variance; `greatest(·, 0)` absorbs the tiny
    negative fp residue of the two-pass-free var formula; try_divide
    -> NULL z for constant groups. One shuffle (the group agg); the
    stats side is |groups|-sized so the join back is a broadcast at
    any corpus scale. Same (18,4) input domain as `exact_corr`.
    """
    x = F.col(value_col).cast("decimal(18,4)")
    stats = df.filter(F.col(value_col).isNotNull()).groupBy(
        *[F.col(c) for c in group_cols]
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).cast("double").alias("__sx"),
        F.sum((x * x).cast("decimal(38,8)")).cast("double").alias("__sxx"),
    )
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    nn = F.col("__n").cast("double")
    mean = F.col("__sx") / nn
    var = F.greatest(F.col("__sxx") / nn - mean * mean, F.lit(0.0))
    z = F.try_divide(F.col(value_col).cast("double") - mean, F.sqrt(var))
    keep = list(df.columns)
    return (
        df.join(F.broadcast(stats), list(group_cols))
        .select(*keep, micro6(z).alias(alias))
    )
