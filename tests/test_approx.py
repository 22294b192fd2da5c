"""Approximate-aggregate accuracy: HLL distinct within 5% of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.queries_analytics import q_approx_distinct_users
from gcp_data_pipeline_fyp_spark.queries_util import load

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    rows = q_approx_distinct_users(spark, SF).collect()
    got = {r["event_type"]: (r["exact_users"], r["within_5pct"]) for r in rows}
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k, (exact_emitted, within) in got.items():
        # the emitted exact column is genuinely exact, and the estimate
        # the probe judged internally stayed inside its 5% bound
        assert exact_emitted == exact[k]
        assert within is True
