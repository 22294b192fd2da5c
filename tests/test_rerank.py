from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.rerank import mmr_rerank, rrf_fuse
from gcp_data_pipeline_fyp_spark.operators.similarity import brute_force_topk


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")


@pytest.fixture(scope="module")
def corpus_df(spark):
    # corpus 10..15: 10/11 nearly identical (redundant), 12 orthogonal-ish,
    # 13 diverse mid-relevance, 14/15 low relevance
    return _emb(
        spark,
        [
            (10, [1.0, 0.0, 0.0]),
            (11, [0.999, 0.01, 0.0]),
            (12, [0.0, 1.0, 0.0]),
            (13, [0.6, 0.6, 0.0]),
            (14, [0.0, 0.0, 1.0]),
            (15, [0.1, 0.0, 0.9]),
        ],
    )


@pytest.fixture(scope="module")
def cands(spark, corpus_df):
    q = _emb(spark, [(1, [1.0, 0.05, 0.0])])
    return brute_force_topk(q, corpus_df, "vec_id", "embedding", k=6)


def test_mmr_lambda_one_is_relevance_topk(spark, corpus_df, cands):
    got = mmr_rerank(cands, corpus_df, "vec_id", "embedding", k=3, lambda_micro=1_000_000)
    rows = sorted(got.collect(), key=lambda r: r["mmr_rank"])
    want = sorted(cands.collect(), key=lambda r: (-r["cosine_micro"], r["corpus_id"]))[:3]
    assert [r["corpus_id"] for r in rows] == [r["corpus_id"] for r in want]


def test_mmr_diversifies(spark, corpus_df, cands):
    # pure relevance picks 11 then its near-duplicate 10; MMR at
    # lambda=0.5 must skip 10 for something diverse
    got = mmr_rerank(cands, corpus_df, "vec_id", "embedding", k=3, lambda_micro=500_000)
    order = [r["corpus_id"] for r in sorted(got.collect(), key=lambda r: r["mmr_rank"])]
    assert order[0] == 11
    assert order[1] != 10
    assert 10 not in order[:3]


def test_mmr_short_pool_emits_what_it_has(spark, corpus_df):
    q = _emb(spark, [(1, [1.0, 0.0, 0.0])])
    two = brute_force_topk(q, corpus_df.filter(F.col("vec_id") <= 11), "vec_id", "embedding", k=2)
    got = mmr_rerank(two, corpus_df, "vec_id", "embedding", k=5, lambda_micro=700_000)
    assert got.count() == 2


def test_mmr_validates_args(spark, corpus_df, cands):
    with pytest.raises(ValueError):
        mmr_rerank(cands, corpus_df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError):
        mmr_rerank(cands, corpus_df, "vec_id", "embedding", k=2, lambda_micro=2_000_000)


def test_mmr_leaves_no_cache_entries(spark, corpus_df, cands):
    # the pool is localCheckpoint'ed, not persisted: no CacheManager
    # entry may survive the call (the r2 dedupe_corpus leak class)
    spark.catalog.clearCache()
    mmr_rerank(cands, corpus_df, "vec_id", "embedding", k=3).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_mmr_multi_query_independent(spark, corpus_df):
    q = _emb(spark, [(1, [1.0, 0.05, 0.0]), (2, [0.0, 0.1, 1.0])])
    c = brute_force_topk(q, corpus_df, "vec_id", "embedding", k=6)
    got = mmr_rerank(c, corpus_df, "vec_id", "embedding", k=2, lambda_micro=700_000)
    per_q = {r["query_id"]: [] for r in got.collect()}
    for r in got.collect():
        per_q[r["query_id"]].append(r["mmr_rank"])
    assert sorted(per_q.keys()) == [1, 2]
    assert all(sorted(v) == [1, 2] for v in per_q.values())


# ------------------------------------------------------------- RRF
def _rank_df(spark, rows, schema="doc_id long, score double"):
    return spark.createDataFrame(rows, schema)


def test_rrf_known_fusion(spark):
    # system A ranks 1,2,3; system B ranks 3,2,1. Expected nano scores:
    # doc1: 1e9//61 + 1e9//63; doc2: 2*(1e9//62); doc3: symmetric to 1
    a = _rank_df(spark, [(1, 9.0), (2, 8.0), (3, 7.0)])
    b = _rank_df(spark, [(3, 0.9), (2, 0.8), (1, 0.7)])
    got = {
        r["doc_id"]: (r["n_systems"], r["rrf_nano"])
        for r in rrf_fuse(
            [("a", a, "score"), ("b", b, "score")], ["doc_id"]
        ).collect()
    }
    edge = 10**9 // 61 + 10**9 // 63
    mid = 2 * (10**9 // 62)
    assert got == {1: (2, edge), 2: (2, mid), 3: (2, edge)}
    assert edge > mid  # agreeing extremes beat the consistent middle


def test_rrf_weights_and_topk(spark):
    a = _rank_df(spark, [(1, 9.0), (2, 8.0)])
    b = _rank_df(spark, [(2, 0.9), (1, 0.8)])
    out = rrf_fuse(
        [("a", a, "score"), ("b", b, "score")],
        ["doc_id"],
        weights_micro={"a": 2_000_000},
        topk=1,
    ).collect()
    assert len(out) == 1
    # doc1: 2*(1e9//61) + 1e9//62 beats doc2: 2*(1e9//62) + 1e9//61
    assert out[0]["doc_id"] == 1 and out[0]["rrf_rank"] == 1


def test_rrf_per_query_grouping(spark):
    a = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (2, 12, 9.0), (2, 10, 1.0)],
        "query_id long, doc_id long, score double",
    )
    b = spark.createDataFrame(
        [(1, 11, 0.9), (2, 12, 0.8)],
        "query_id long, doc_id long, score double",
    )
    got = rrf_fuse(
        [("a", a, "score"), ("b", b, "score")],
        ["query_id", "doc_id"],
        query_cols=["query_id"],
        topk=1,
    ).collect()
    top = {r["query_id"]: r["doc_id"] for r in got}
    # q1: doc11 (rank2 + rank1) beats doc10 (rank1 alone);
    # q2: doc12 top in both systems
    assert top == {1: 11, 2: 12}


def test_rrf_single_system_rank_identity(spark):
    a = _rank_df(spark, [(i, float(100 - i)) for i in range(5)])
    got = sorted(
        (r["doc_id"], r["rrf_rank"])
        for r in rrf_fuse([("a", a, "score")], ["doc_id"], topk=5).collect()
    )
    assert got == [(i, i + 1) for i in range(5)]


def test_rrf_validation(spark):
    a = _rank_df(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        rrf_fuse([], ["doc_id"])
    with pytest.raises(ValueError):
        rrf_fuse([("a", a, "score")], ["doc_id"], k0=0)
    with pytest.raises(ValueError):
        rrf_fuse([("a", a, "score")], ["doc_id"], query_cols=["nope"])


def test_rrf_unpartitioned_cap_guard(spark):
    """Empty query_cols = one window partition: inputs past the cap
    raise (misuse fails loudly); unbounded_ok or query_cols lift it."""
    a = _rank_df(spark, [(i, float(i)) for i in range(10)])
    with pytest.raises(ValueError, match="unpartitioned"):
        rrf_fuse([("a", a, "score")], ["doc_id"], unpartitioned_cap=5)
    assert (
        rrf_fuse(
            [("a", a, "score")],
            ["doc_id"],
            unpartitioned_cap=5,
            unbounded_ok=True,
        ).count()
        == 10
    )
