"""As-of and range (interval) joins — operators Spark lacks natively.

Both are built as compositions of existing DataFrame ops (the
preferred strategy for custom operators): no Pandas UDF, no
mapPartitions, fully shuffle-planned by Catalyst.

- `asof_join`: for every left row, the most recent right row with
  `right.ts <= left.ts` per key. Implemented with the union+window
  technique: tag both sides, sort within key by (ts, side, tie), carry
  right values forward with `last(ignorenulls=True)`, keep left rows.
  One shuffle on the key — same cost as a regular join — instead of a
  per-row correlated lookup. Ties: the right row with the greatest
  (ts, tie_col) wins, so results are deterministic.
- `range_join_points`: point-in-interval join. A naive theta join is a
  cross product; here intervals are exploded into coarse buckets
  (`bucket = floor(x / width)`), points join on their bucket
  (equi-join, shuffle-friendly), then the exact predicate filters.
  Choose `bucket_width` near the typical interval length: each
  interval lands in O(len/width + 1) buckets and the join stays
  linear-ish. This is the standard bucketed range-join strategy (what
  Databricks' range-join hints do under the hood).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the latest right `value_cols` as of each left ts."""
    lt = left.withColumn("__side", F.lit(1))
    rt_cols = [*on, ts_col, *value_cols]
    # all value columns (and the tie) travel in ONE struct: filling a
    # single column with last(ignorenulls) can never stitch values from
    # different right rows, and a NULL inside the struct is preserved
    # (the struct itself is non-null for every right row)
    rt = right.select(*rt_cols).withColumn("__side", F.lit(0))
    rt = rt.withColumn("__vals", F.struct(*[F.col(c) for c in value_cols])).drop(
        *value_cols
    )
    struct_type = dict(rt.dtypes)["__vals"]
    lt = lt.withColumn("__vals", F.lit(None).cast(struct_type))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts -> `<=`
    # inclusivity; among right rows with equal ts the greatest tie wins
    # (ascending + last). The tie expr is NULL for left rows, ordered
    # last within their (ts, side) group, which cannot affect fills.
    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    if tie_col is not None:
        tie_base = tie_col.removesuffix(suffix)
        order.append(
            F.when(F.col("__side") == 0, F.col("__vals")[tie_base]).asc_nulls_last()
        )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__vals_filled", F.last("__vals", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__vals_filled")[c])
    return out.drop("__side", "__vals", "__vals_filled")


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Pairs (point row × interval row) with start <= point < end.

    `extra_keys` optionally restricts matches to equal keys on both
    sides (making the bucket join even narrower).
    """
    p_bucket = F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    i_from = F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long")
    i_to = F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long")
    p = points.withColumn("__bucket", p_bucket)
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(i_from, i_to))
    )
    join_keys = ["__bucket", *extra_keys]
    out = p.join(i, join_keys).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return out.drop("__bucket")


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 70.0,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) point pairs within `radius_km` great-circle
    distance — the spatial join, grid-bucketed so it NEVER compares
    all pairs: left points explode into their 3x3 neighborhood of
    grid cells, right points key on their own cell, the equality
    join meets only nearby points, and exact haversine verifies
    candidates.

    The cell edge is sized so `radius_km` never spans more than one
    cell in either axis up to `max_abs_lat` (longitude degrees
    shrink by cos(lat), so the cell is sized for the worst latitude
    you promise; points beyond it are excluded — raise the bound
    for polar data and accept coarser cells). Recall is therefore
    exact by construction inside the bound; the 3x3 explode is the
    pigeonhole guarantee. Left points within one cell of the ±180°
    antimeridian additionally key on their wrapped cell (lon∓360 for
    cell assignment only — output and haversine keep the raw lon, and
    sin² is ±360°-shift invariant, so the distance is the true
    great-circle one), closing the wraparound recall gap; the wrapped
    neighborhood is ~360/cell_deg cells away from the raw one, so no
    pair can meet twice.

    Determinism: cells are floor() of scaled doubles (identical IEEE
    expressions both engines); the haversine is ONE pinned float
    chain; `distance_km_micro` (integer micro-km) is the emission
    and the radius gate compares in that integer domain. Shuffle
    carries (cell, id, 2 doubles) rows; candidate density follows
    cell occupancy — size radius/cells so a cell holds O(100)
    points, the LSH-bucket discipline applied to space.
    """
    import math

    cell_deg = radius_km / (111.32 * math.cos(math.radians(max_abs_lat)))
    lat_ok = (F.abs(F.col(lat_col)) <= max_abs_lat) & F.col(lat_col).isNotNull()

    # antimeridian wrap is only sound when the wrapped cell
    # neighborhood cannot overlap the raw one (always true for
    # realistic radii; a >40-cell-wide world would be near-all-pairs)
    wrap = 3.0 * cell_deg < 360.0

    def cells(df: DataFrame, explode_neighbors: bool) -> DataFrame:
        la = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
        lo = F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long")
        base = df.filter(lat_ok & F.col(lon_col).isNotNull())
        if not explode_neighbors:
            return base.withColumn("__cla", la).withColumn("__clo", lo)
        if wrap:
            shifts = (
                F.when(
                    F.col(lon_col) >= F.lit(180.0 - cell_deg),
                    F.array(F.lit(0.0), F.lit(-360.0)),
                )
                .when(
                    F.col(lon_col) <= F.lit(-180.0 + cell_deg),
                    F.array(F.lit(0.0), F.lit(360.0)),
                )
                .otherwise(F.array(F.lit(0.0)))
            )
        else:
            shifts = F.array(F.lit(0.0))
        base = base.withColumn("__sh", F.explode(shifts))
        lo = F.floor(
            (F.col(lon_col) + F.col("__sh")) / F.lit(cell_deg)
        ).cast("long")
        d = F.explode(
            F.array(*[F.lit(i) for i in (-1, 0, 1)])
        )
        return (
            base.withColumn("__dla", d)
            .withColumn(
                "__dlo", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
            )
            .withColumn("__cla", la + F.col("__dla"))
            .withColumn("__clo", lo + F.col("__dlo"))
            .drop("__dla", "__dlo", "__sh")
        )

    lcols = [F.col(c).alias(c) for c in left.columns]
    rcols = [F.col(c).alias(f"{c}{suffix}") for c in right.columns]
    lc = cells(left, True).select(*lcols, "__cla", "__clo")
    rc = cells(right, False).select(*rcols, "__cla", "__clo")
    # each (left, right) pair meets exactly once: the right point keys
    # on its single cell and the left's 9 exploded cells are distinct
    # keys — no dedup pass (and no extra shuffle) needed
    cand = lc.join(rc, ["__cla", "__clo"]).drop("__cla", "__clo")
    rlat1 = F.radians(F.col(lat_col))
    rlat2 = F.radians(F.col(f"{lat_col}{suffix}"))
    dlat = F.radians(F.col(f"{lat_col}{suffix}") - F.col(lat_col)) / 2.0
    dlon = F.radians(F.col(f"{lon_col}{suffix}") - F.col(lon_col)) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    dist = 2.0 * F.lit(6371.0088) * F.asin(F.sqrt(a))
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    out = cand.withColumn("distance_km_micro", micro6(dist))
    return out.filter(
        F.col("distance_km_micro") <= int(round(radius_km * 1_000_000))
    )
