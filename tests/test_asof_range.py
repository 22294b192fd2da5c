"""As-of join and bucketed range join unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.asof import asof_join, range_join_points


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:00:00"),
         (2, "u", "2024-01-01 12:00:00"),
         (3, "v", "2024-01-01 09:00:00")],
        "id long, k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 09:30:00", 100),
         ("u", "2024-01-01 10:00:00", 200),   # tie with left id=1 ts -> inclusive
         ("u", "2024-01-01 10:00:00", 300),   # same ts: greatest value-row wins
         ("u", "2024-01-01 11:00:00", 400)],
        "k string, ts string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["id"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", value_cols=["v"], tie_col="v_asof"
        ).collect()
    }
    assert out[1] == 300  # ts-equal rows included, greatest tie wins
    assert out[2] == 400  # latest before 12:00
    assert out[3] is None  # no right rows for key v


def test_range_join_matches_naive(spark):
    import random

    rng = random.Random(3)
    points = spark.createDataFrame(
        [(i, rng.uniform(0, 1000.0)) for i in range(300)], "pid long, p double"
    )
    intervals = spark.createDataFrame(
        [(j, s := rng.uniform(0, 950.0), s + rng.uniform(1, 60.0)) for j in range(50)],
        "iid long, start double, end double",
    )
    fast = {
        (r["pid"], r["iid"])
        for r in range_join_points(points, intervals, "p", "start", "end", 50.0).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("p") >= F.col("start")) & (F.col("p") < F.col("end")))
        .collect()
    }
    assert fast == naive
    assert len(naive) > 0


def test_asof_null_value_not_skipped(spark):
    # the most recent right row's NULL must be returned, not an older
    # row's value bleeding forward
    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 12:00:00")], "id long, k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", 5), ("u", "2024-01-01 11:00:00", None)],
        "k string, ts string, v int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v"]).collect()
    assert out[0]["v_asof"] is None


def test_asof_multicolumn_no_stitching(spark):
    # both value columns must come from the SAME (most recent) right row
    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 12:00:00")], "id long, k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", 1, None), ("u", "2024-01-01 11:00:00", None, 9)],
        "k string, ts string, a int, b int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["a", "b"]).collect()[0]
    assert (r["a_asof"], r["b_asof"]) == (None, 9)  # the 11:00 row, whole


def test_geo_radius_join_recall_precision_and_lat_bound(spark):
    """A ~1.1 km pair is found with the right haversine distance; a
    pair just outside the radius is excluded; points straddling a
    grid-cell boundary still meet (the 3x3 pigeonhole); points past
    the latitude bound are excluded."""
    from gcp_data_pipeline_fyp_spark.operators.asof import geo_radius_join

    left = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 50.0, 10.0), (3, 80.0, 0.0)],
        "id long, lat double, lon double",
    )
    right = spark.createDataFrame(
        [(10, 0.01, 0.0),      # ~1.112 km from point 1
         (20, 50.0, 10.4),     # ~28.6 km from point 2 -> outside 25
         (30, 80.0, 0.01),     # near point 3 but |lat| > 70 -> excluded
         (40, 0.3283, 0.3283)],  # ~51 km from 1 -> outside, but same
        "id long, lat double, lon double",  # cell family exercises verify
    )
    got = {
        (r["id"], r["id_r"]): r["distance_km_micro"]
        for r in geo_radius_join(left, right, 25.0, max_abs_lat=70.0).collect()
    }
    assert set(got) == {(1, 10)}
    assert abs(got[(1, 10)] / 1e6 - 1.112) < 0.01
    # boundary recall: two points in adjacent cells, 5 km apart
    la = spark.createDataFrame([(1, 0.655, 0.0)], "id long, lat double, lon double")
    rb = spark.createDataFrame([(2, 0.658, 0.0)], "id long, lat double, lon double")
    near = geo_radius_join(la, rb, 25.0).collect()
    assert len(near) == 1 and near[0]["distance_km_micro"] < 1_000_000


def test_geo_radius_join_antimeridian_wrap(spark):
    """Points straddling ±180° within the radius still pair (the
    wrapped-cell duplicate), the reported distance is the true
    ~11 km great-circle one, and the pair is emitted exactly once."""
    from gcp_data_pipeline_fyp_spark.operators.asof import geo_radius_join

    left = spark.createDataFrame(
        [(1, 10.0, 179.95), (2, -5.0, -179.98)],
        "id long, lat double, lon double",
    )
    right = spark.createDataFrame(
        [(10, 10.0, -179.95), (20, -5.0, 179.99)],
        "id long, lat double, lon double",
    )
    rows = geo_radius_join(left, right, 25.0).collect()
    got = {(r["id"], r["id_r"]): r["distance_km_micro"] for r in rows}
    assert set(got) == {(1, 10), (2, 20)}
    assert len(rows) == 2  # exactly once each — no double meet
    assert abs(got[(1, 10)] / 1e6 - 10.95) < 0.05
    assert abs(got[(2, 20)] / 1e6 - 3.32) < 0.05
