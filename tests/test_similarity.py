"""ANN recall tests: the approximate paths against the exact baseline."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

DIM = 16


def _vectors(spark, n=300, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall(exact, approx):
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    return len(e & a) / len(e)


def test_brute_force_is_exact_and_ranked(spark):
    df = _vectors(spark)
    q = df.filter(F.col("vec_id") < 3)
    c = df.filter(F.col("vec_id") >= 3)
    out = brute_force_topk(q, c, "vec_id", "embedding", k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)


def test_lsh_recall_reasonable(spark):
    df = _vectors(spark)
    q = df.filter(F.col("vec_id") < 5)
    c = df.filter(F.col("vec_id") >= 5)
    exact = brute_force_topk(q, c, "vec_id", "embedding", k=5)
    approx = lsh_topk(q, c, "vec_id", "embedding", k=5, dim=DIM, n_planes=6)
    # multiprobe LSH on random gaussians: expect to recover a majority
    assert _recall(exact, approx) >= 0.5


def test_ivf_recall_reasonable(spark):
    df = _vectors(spark)
    q = df.filter(F.col("vec_id") < 5)
    c = df.filter(F.col("vec_id") >= 5)
    exact = brute_force_topk(q, c, "vec_id", "embedding", k=5)
    approx = ivf_topk(q, c, "vec_id", "embedding", k=5, n_centroids=8, nprobe=4)
    assert _recall(exact, approx) >= 0.5


def test_lsh_exact_self_match(spark):
    # a query vector identical to a corpus vector must land in the same
    # bucket (deterministic hyperplanes) and rank first
    df = _vectors(spark, n=50)
    q = df.filter(F.col("vec_id") == 0)
    c = df.withColumn("vec_id", F.col("vec_id") + 1000)  # includes copy of 0
    out = lsh_topk(q, c, "vec_id", "embedding", k=1, dim=DIM, n_planes=6).collect()
    assert out[0]["corpus_id"] == 1000
    assert out[0]["cosine"] == 1.0


def test_lsh_neardup_finds_planted_copies(spark):
    from gcp_data_pipeline_fyp_spark.operators.dedup import embedding_neardup_lsh

    df = _vectors(spark, n=120)
    copies = df.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    u = df.unionByName(copies)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_lsh(
            u, "vec_id", "embedding", threshold=0.999, dim=DIM, n_planes=6
        ).collect()
    }
    planted = {(i, i + 1000) for i in range(0, 120, 10)}
    # identical vectors always share a sign bucket -> 100% recall on exact copies
    assert planted <= pairs


def test_brute_force_null_and_zero_vectors(spark):
    # zero-norm corpus vector -> NULL cosine, ranked last, no crash in
    # the Arrow-vectorized pair stage
    rows = [(0, [1.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    c = df.filter(F.col("vec_id") > 0)
    out = brute_force_topk(q, c, "vec_id", "embedding", k=2).collect()
    scores = {r["corpus_id"]: r["cosine"] for r in out}
    assert scores[2] is None
    assert abs(scores[1] - 0.707107) < 1e-5


def test_kmeans_recovers_planted_blobs(spark):
    from gcp_data_pipeline_fyp_spark.operators.clustering import kmeans

    rng = random.Random(5)
    centers = [[10.0 * (c + 1)] * DIM for c in range(3)]
    rows = [
        (i, [centers[i % 3][d] + rng.gauss(0, 0.1) for d in range(DIM)])
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cent = kmeans(df, "vec_id", "embedding", k=3, max_iter=10)
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    # every point in blob b must share blob-mates' label (perfect separation)
    for b in range(3):
        labels = {got[i] for i in range(90) if i % 3 == b}
        assert len(labels) == 1, f"blob {b} split across {labels}"
    assert len({got[b] for b in range(3)}) == 3  # blobs not merged
    # centroids converged near the true centers
    cents = sorted(r["centroid"][0] for r in cent.collect())
    for got_c, want_c in zip(cents, [10.0, 20.0, 30.0]):
        assert abs(got_c - want_c) < 1.0


def test_kmeans_deterministic_across_partitioning(spark):
    from gcp_data_pipeline_fyp_spark.operators.clustering import kmeans

    df = _vectors(spark, n=60)
    a1, _ = kmeans(df.repartition(1), "vec_id", "embedding", k=4, max_iter=4)
    a2, _ = kmeans(df.repartition(13), "vec_id", "embedding", k=4, max_iter=4)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_semantic_neardup_kmeans_finds_planted_copies(spark):
    from gcp_data_pipeline_fyp_spark.operators.clustering import (
        semantic_neardup_kmeans,
    )

    df = _vectors(spark, n=100)
    copies = df.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    u = df.unionByName(copies)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_neardup_kmeans(
            u, "vec_id", "embedding", threshold=0.999, k=4, max_iter=3
        ).collect()
    }
    planted = {(i, i + 1000) for i in range(0, 100, 10)}
    # identical vectors always land in the same cluster -> full recall
    assert planted <= pairs


def test_ivf_index_persist_matches_direct_and_prunes(spark, tmp_path):
    from gcp_data_pipeline_fyp_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )
    from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

    df = _vectors(spark, n=400)
    q = df.filter(F.col("vec_id") < 3)
    c = df.filter(F.col("vec_id") >= 3)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_ivf_index(wh, c, "vec_id", "embedding", "emb", n_centroids=8)

    direct = ivf_topk(q, c, "vec_id", "embedding", k=5, n_centroids=8, nprobe=3)
    indexed = ivf_topk_indexed(wh, q, "vec_id", "embedding", "emb", k=5, nprobe=3)
    key = lambda r: (r["query_id"], r["corpus_id"])  # noqa: E731
    assert sorted(map(key, direct.collect())) == sorted(map(key, indexed.collect()))

    # the probed-centroid IN filter must prune the postings scan
    probed = ivf_topk_indexed(wh, q, "vec_id", "embedding", "emb", k=5, nprobe=3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid_id" in plan or "centroid_id IN" in plan, plan
