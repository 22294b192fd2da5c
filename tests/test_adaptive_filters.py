from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.filters import (
    adaptive_group_thresholds,
    adaptive_threshold_filter,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # lang en: lengths 10, 20, 30, 40 -> p25 = 17.5
        ("en", 10), ("en", 20), ("en", 30), ("en", 40),
        # lang zh: lengths 2, 4, 6 -> p25 = 3.0
        ("zh", 2), ("zh", 4), ("zh", 6),
        # lang xx: only NULLs -> no threshold row
        ("xx", None),
    ]
    return spark.createDataFrame(rows, "lang: string, n: int")


def test_exact_thresholds(spark, docs):
    th = {
        r["lang"]: (r["n"], r["threshold"])
        for r in adaptive_group_thresholds(docs, ["lang"], "n", q=0.25).collect()
    }
    assert th["en"] == (4, 17.5)
    assert th["zh"] == (3, 3.0)
    assert "xx" not in th


def test_exact_filter_membership(spark, docs):
    kept = adaptive_threshold_filter(docs, ["lang"], "n", q=0.25)
    got = sorted((r["lang"], r["n"]) for r in kept.collect())
    assert got == [("en", 20), ("en", 30), ("en", 40), ("zh", 4), ("zh", 6)]


def test_sketch_mode_close_to_exact(spark):
    import random

    rnd = random.Random(7)
    rows = [("g", float(rnd.lognormvariate(3, 1))) for _ in range(2000)]
    df = spark.createDataFrame(rows, "lang: string, n: double")
    exact = adaptive_group_thresholds(df, ["lang"], "n", q=0.5, mode="exact").first()
    sk = adaptive_group_thresholds(df, ["lang"], "n", q=0.5, mode="sketch").first()
    assert sk["n"] == exact["n"] == 2000
    # log-bucket sketch: within a few % relative error at g=1.02
    assert abs(sk["threshold"] - exact["threshold"]) / exact["threshold"] < 0.05


def test_sketch_within_band_of_nearest_rank(spark):
    """The sketch's documented guarantee: its read is the geometric
    midpoint of the bucket holding the ceil(q*n)-th smallest value, so
    |sketch - v*| / v* <= sqrt(1.02) - 1 (~0.995%) — a bound, not a
    statistic. Checked over several q on a 5-decade value spread."""
    import math
    import random

    rnd = random.Random(13)
    rows = [("g", float(10 ** rnd.uniform(0, 5))) for _ in range(1500)]
    vals = sorted(v for _, v in rows)
    df = spark.createDataFrame(rows, "lang: string, n: double")
    band = math.sqrt(1.02) - 1 + 1e-6  # + roundn(6) slack
    for q in (0.1, 0.25, 0.5, 0.9, 0.99):
        sk = adaptive_group_thresholds(
            df, ["lang"], "n", q=q, mode="sketch"
        ).first()["threshold"]
        v_star = vals[math.ceil(q * len(vals)) - 1]
        assert abs(sk - v_star) / v_star <= band, (q, sk, v_star)


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        adaptive_group_thresholds(docs, [], "n")
    with pytest.raises(ValueError):
        adaptive_group_thresholds(docs, ["lang"], "n", q=1.5)
    with pytest.raises(ValueError):
        adaptive_group_thresholds(docs, ["lang"], "n", mode="nope")


def test_null_group_key_is_a_real_slice(spark):
    rows = [(None, 1), (None, 10), (None, 100), ("en", 5), ("en", 50)]
    df = spark.createDataFrame(rows, "lang: string, n: int")
    kept = adaptive_threshold_filter(df, ["lang"], "n", q=0.25)
    got = sorted(((r["lang"], r["n"]) for r in kept.collect()), key=repr)
    # NULL-lang docs filter against their OWN p25, not vanish
    assert (None, 100) in got and (None, 10) in got and (None, 1) not in got
    assert ("en", 50) in got and ("en", 5) not in got
