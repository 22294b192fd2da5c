"""Count-min / KMV sketch guarantees beyond the oracle's bit-equality:
upper-bound property, merge == full-build, and estimation error."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.sketch import (
    cms_estimate,
    cms_state,
    kmv_estimate,
    kmv_state,
    merge_cms_states,
    merge_kmv_states,
)

SF = "/root/testdata/sf0.001"


def _toks(spark):
    from gcp_data_pipeline_fyp_spark.functions.text import tokens

    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.select("doc_id", F.explode(tokens("text")).alias("tok"))


def test_cms_never_underestimates_and_bounds_error(spark):
    toks = _toks(spark)
    n = toks.count()
    width = 512
    state = cms_state(toks, "tok", depth=4, width=width)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    est = cms_estimate(state, exact.select("tok"), "tok", 4, width)
    j = est.join(exact, "tok").collect()
    assert j
    assert all(r["est"] >= r["cnt"] for r in j)  # one-sided error
    # classic CM bound: err <= 2n/width w.h.p.; assert the 90th pct
    errs = sorted(r["est"] - r["cnt"] for r in j)
    assert errs[int(0.9 * len(errs))] <= 2 * n / width


def test_cms_merge_equals_full_build(spark):
    toks = _toks(spark)
    full = cms_state(toks, "tok", 4, 256)
    a = cms_state(toks.filter(F.col("doc_id") % 2 == 0), "tok", 4, 256)
    b = cms_state(toks.filter(F.col("doc_id") % 2 == 1), "tok", 4, 256)
    merged = merge_cms_states([a, b])
    assert (
        merged.exceptAll(full).count() == 0
        and full.exceptAll(merged).count() == 0
    )


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # per-type distinct users: small at sf0.001 -> k=1024 is exact
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nd")
    )
    big = kmv_state(ev, "user_id", ["event_type"], k=1024)
    est_exact = kmv_estimate(big, ["event_type"], k=1024)
    j = {r["event_type"]: r["est"] for r in est_exact.collect()}
    for r in exact.collect():
        assert j[r["event_type"]] == float(r["nd"])  # sketch not full
    # k=16 over event_id (1000 distinct): estimate within 60% rel err
    s = kmv_state(ev, "event_id", k=16)
    est = kmv_estimate(s, k=16).collect()[0]["est"]
    nd = ev.select("event_id").distinct().count()
    assert 0.4 * nd <= est <= 1.6 * nd


def test_kmv_merge_equals_full_build(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    full = kmv_state(ev, "user_id", ["event_type"], k=32)
    a = kmv_state(
        ev.filter(F.col("event_id") % 2 == 0), "user_id", ["event_type"], 32
    )
    b = kmv_state(
        ev.filter(F.col("event_id") % 2 == 1), "user_id", ["event_type"], 32
    )
    merged = merge_kmv_states([a, b], ["event_type"], k=32)
    assert (
        merged.exceptAll(full).count() == 0
        and full.exceptAll(merged).count() == 0
    )


def test_kmv_set_estimates_exact_below_fill_bounded_above(spark):
    """Below fill the sketches ARE the sets: union/intersection/
    Jaccard come back exact. Above fill, a controlled 1/3-Jaccard
    overlap estimates within the KMV error envelope."""
    from gcp_data_pipeline_fyp_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_state,
    )

    small_a = spark.createDataFrame([(i,) for i in range(10)], "u long")
    small_b = spark.createDataFrame([(i,) for i in range(5, 15)], "u long")
    sa, sb = (kmv_state(d, "u", (), 64) for d in (small_a, small_b))
    r = kmv_set_estimates(sa, sb, (), 64).collect()[0]
    assert r["k_filled"] == 15
    assert r["union_est_micro"] == 15_000_000
    assert r["inter_est_micro"] == 5_000_000
    assert r["jaccard_micro"] == 333_333

    big_a = spark.createDataFrame([(i,) for i in range(1000)], "u long")
    big_b = spark.createDataFrame([(i,) for i in range(500, 1500)], "u long")
    ba, bb = (kmv_state(d, "u", (), 64) for d in (big_a, big_b))
    e = kmv_set_estimates(ba, bb, (), 64).collect()[0]
    assert abs(e["union_est_micro"] / 1e6 - 1500) / 1500 < 0.35
    assert abs(e["jaccard_micro"] / 1e6 - 1 / 3) < 0.15
    assert abs(e["inter_est_micro"] / 1e6 - 500) / 500 < 0.5


def test_cms_join_size_upper_bounds_and_hits_exact_when_sparse(spark):
    """The CM inner product never underestimates the true join size,
    and with distinct keys far fewer than buckets it is exact."""
    from pyspark.sql import functions as F

    from gcp_data_pipeline_fyp_spark.operators.sketch import (
        cms_join_size,
        cms_state,
    )

    a = spark.createDataFrame(
        [(i % 10,) for i in range(100)], "k long"  # 10 keys x 10 rows
    )
    b = spark.createDataFrame(
        [(i % 5,) for i in range(50)], "k long"  # 5 keys x 10 rows
    )
    est = int(
        cms_join_size(
            cms_state(a, "k", 4, 1024), cms_state(b, "k", 4, 1024)
        ).collect()[0]["est_join_size"]
    )
    truth = (
        a.groupBy("k").count().withColumnRenamed("count", "ca")
        .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), "k")
        .agg(F.sum(F.col("ca") * F.col("cb"))).collect()[0][0]
    )
    assert truth == 500
    assert est >= truth  # upper bound always
    assert est == truth  # 15 distinct keys in 1024 buckets: no collision
