"""Approximate-aggregate accuracy: HLL distinct within 5% of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.queries_analytics import q_approx_distinct_users
from gcp_data_pipeline_fyp_spark.queries_util import load

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_approx_distinct_users(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.05 * exact[k])
