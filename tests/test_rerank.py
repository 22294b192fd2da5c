from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.rerank import mmr_rerank
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
