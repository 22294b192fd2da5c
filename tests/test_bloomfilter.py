from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.bloomfilter import (
    bloom_anti_join,
    bloom_build,
    bloom_flag,
    bloom_params,
    bloom_semi_join,
)


def _ids(spark, lo, hi, col="id"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


def test_bloom_params_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    # analytic optimum: ~9.585 bits/key, k ~ 7 at 1%
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives(spark):
    build = _ids(spark, 0, 500, "k")
    m, k = bloom_params(500, 0.01)
    bloom = bloom_build(build, "k", m, k)
    flagged = bloom_flag(build, "k", bloom, m_bits=m, k=k)
    assert flagged.filter(~F.col("__bloom_hit")).count() == 0


def test_bloom_fp_rate_within_bound(spark):
    build = _ids(spark, 0, 1000, "k")
    m, k = bloom_params(1000, 0.01)
    bloom = bloom_build(build, "k", m, k)
    # 20k keys guaranteed absent
    probe = _ids(spark, 1_000_000, 1_020_000, "k")
    flagged = bloom_flag(probe, "k", bloom, m_bits=m, k=k)
    fp = flagged.filter(F.col("__bloom_hit")).count()
    # analytic fpp is 1%; allow 3x slack on 20k trials
    assert fp <= math.ceil(0.03 * 20_000)


def test_bloom_flag_null_key_is_null(spark):
    build = _ids(spark, 0, 10, "k")
    bloom = bloom_build(build, "k", 640, 3)
    probe = spark.createDataFrame([(None,), (5,)], "k: bigint")
    rows = {
        r["k"]: r["__bloom_hit"]
        for r in bloom_flag(probe, "k", bloom, m_bits=640, k=3).collect()
    }
    assert rows[None] is None
    assert rows[5] is True


def _check_join_equiv(spark, how):
    # probe: 0..2000 with some nulls; build: multiples of 7 in 0..700
    probe = spark.range(0, 2000).select(
        F.when(F.col("id") % 97 == 0, None).otherwise(F.col("id")).alias("pk"),
        (F.col("id") % 5).alias("grp"),
    )
    build = spark.range(0, 100).select((F.col("id") * 7).alias("bk"))
    if how == "semi":
        got = bloom_semi_join(probe, build, "pk", "bk", n_keys_hint=100)
        want = probe.join(build, probe["pk"] == build["bk"], "left_semi")
    else:
        got = bloom_anti_join(probe, build, "pk", "bk", n_keys_hint=100)
        want = probe.join(build, probe["pk"] == build["bk"], "left_anti")
    g = sorted(map(tuple, got.collect()), key=repr)
    w = sorted(map(tuple, want.collect()), key=repr)
    assert g == w


def test_bloom_semi_join_equals_plain(spark):
    _check_join_equiv(spark, "semi")


def test_bloom_anti_join_equals_plain(spark):
    _check_join_equiv(spark, "anti")


def test_bloom_anti_join_keeps_null_keys(spark):
    probe = spark.createDataFrame([(None, 1), (3, 2), (999, 3)], "pk: bigint, tag: int")
    build = spark.createDataFrame([(3,)], "bk: bigint")
    got = sorted(
        (r["tag"] for r in bloom_anti_join(probe, build, "pk", "bk", n_keys_hint=1).collect())
    )
    assert got == [1, 3]


def test_bloom_build_rejects_bad_size(spark):
    build = _ids(spark, 0, 10, "k")
    with pytest.raises(ValueError):
        bloom_build(build, "k", 100, 3)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(build, "k", 640, 0)


def test_bloom_build_string_keys(spark):
    build = spark.createDataFrame([("a",), ("b",), ("c",)], "k: string")
    bloom = bloom_build(build, "k", 640, 4)
    probe = spark.createDataFrame([("a",), ("zzz",), ("b",)], "k: string")
    hits = {
        r["k"]: r["__bloom_hit"]
        for r in bloom_flag(probe, "k", bloom, m_bits=640, k=4).collect()
    }
    assert hits["a"] is True and hits["b"] is True


def test_bloom_join_mixed_integral_key_types(spark):
    # xxhash64 is type-sensitive: without the common-type hash cast an
    # int probe vs bigint build sets/tests different bits and silently
    # drops every match (ADVICE r9, high). Both joins must stay
    # row-equal to the plain joins across the integral widths.
    probe = spark.range(0, 200).select(F.col("id").cast("int").alias("pk"))
    build = spark.range(0, 100).select((F.col("id") * 3).alias("bk"))  # bigint
    semi = bloom_semi_join(probe, build, "pk", "bk", n_keys_hint=100)
    want_semi = probe.join(build, probe["pk"] == build["bk"], "left_semi")
    assert sorted(r["pk"] for r in semi.collect()) == sorted(
        r["pk"] for r in want_semi.collect()
    )
    anti = bloom_anti_join(probe, build, "pk", "bk", n_keys_hint=100)
    want_anti = probe.join(build, probe["pk"] == build["bk"], "left_anti")
    assert sorted(r["pk"] for r in anti.collect()) == sorted(
        r["pk"] for r in want_anti.collect()
    )


def test_bloom_join_incompatible_key_types_raise(spark):
    probe = spark.createDataFrame([("7",)], "pk: string")
    build = spark.createDataFrame([(7,)], "bk: bigint")
    with pytest.raises(ValueError, match="key types differ"):
        bloom_semi_join(probe, build, "pk", "bk", n_keys_hint=1)
    with pytest.raises(ValueError, match="key types differ"):
        bloom_anti_join(probe, build, "pk", "bk", n_keys_hint=1)
    # integral vs fractional: bigint -> double loses exactness past
    # 2^53, so the pair is refused rather than guessed
    fprobe = spark.createDataFrame([(7.0,)], "pk: double")
    with pytest.raises(ValueError, match="key types differ"):
        bloom_semi_join(fprobe, build, "pk", "bk", n_keys_hint=1)


def test_bloom_anti_join_leaves_no_cache_entries(spark):
    # library contract: no CacheManager entries survive the call (the
    # r2 dedupe_corpus leak class) — repeated invocations in a long
    # session must not accumulate cached plans
    spark.catalog.clearCache()
    probe = spark.range(0, 500).select(F.col("id").alias("pk"))
    build = spark.range(0, 50).select((F.col("id") * 2).alias("bk"))
    bloom_anti_join(probe, build, "pk", "bk", n_keys_hint=50).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_bloom_build_drops_null_keys(spark):

    with_null = spark.createDataFrame([(1,), (None,), (2,)], "k: bigint")
    without = spark.createDataFrame([(1,), (2,)], "k: bigint")
    a = bloom_build(with_null, "k", 640, 3).first()["bits"]
    b = bloom_build(without, "k", 640, 3).first()["bits"]
    assert a == b  # NULL set no phantom bits
