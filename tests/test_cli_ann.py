"""CLI surface for the persisted IVF-PQ index (ann-build / ann-query).

Runs the module CLI in subprocesses: `main()` owns its SparkSession
(stop() on exit), so calling it in-process would tear down the shared
test session."""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 8


import pytest

pytestmark = pytest.mark.slow  # E2E module: full tier only (pytest -m "")


def _run_cli(*argv):
    return subprocess.run(
        [sys.executable, "-m", "gcp_data_pipeline_fyp_spark", *argv],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=420,
    )


def test_ann_build_and_query_roundtrip(spark, tmp_path):
    rng = random.Random(3)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(6)]
    rows = [
        (i, [centers[i % 6][d] + rng.gauss(0, 0.1) for d in range(DIM)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vec_path = str(tmp_path / "vecs.parquet")
    q_path = str(tmp_path / "qs.parquet")
    df.filter("vec_id >= 3").write.parquet(vec_path)
    df.filter("vec_id < 3").write.parquet(q_path)

    wh = str(tmp_path / "wh")
    built = _run_cli(
        "ann-build", "--vectors", vec_path, "--id", "vec_id",
        "--vec", "embedding", "--warehouse", wh, "--name", "ix",
        "--dim", str(DIM), "--m", "4", "--codes", "8",
        "--centroids", "6", "--residual",
    )
    assert built.returncode == 0, built.stderr[-2000:]
    meta = json.loads(built.stdout.strip().splitlines()[-1])
    assert meta == {"index": "ix", "vectors": 117, "residual": True}

    queried = _run_cli(
        "ann-query", "--queries", q_path, "--id", "vec_id",
        "--vec", "embedding", "--warehouse", wh, "--name", "ix",
        "--k", "5", "--nprobe", "3", "--rerank", "--corpus", vec_path,
    )
    assert queried.returncode == 0, queried.stderr[-2000:]
    rows_out = json.loads(queried.stdout.strip().splitlines()[-1])
    by_q: dict = {}
    for r in rows_out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, lst in by_q.items():
        assert len(lst) == 5
        scores = [r["cosine_micro"] for r in lst]
        assert scores == sorted(scores, reverse=True)
        # same-blob corpus members dominate: top hit is near-identical
        assert scores[0] > 950000

    # --rerank without --corpus is a usage error, not a traceback
    bad = _run_cli(
        "ann-query", "--queries", q_path, "--id", "vec_id",
        "--vec", "embedding", "--warehouse", wh, "--name", "ix",
        "--rerank",
    )
    assert bad.returncode == 2


def test_ann_delete_cli(spark, tmp_path):
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    rows = [
        (i, [centers[i % 4][d] + rng.gauss(0, 0.1) for d in range(DIM)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vec_path = str(tmp_path / "vecs.parquet")
    ids_path = str(tmp_path / "victims.parquet")
    df.write.parquet(vec_path)
    df.filter("vec_id in (10, 11)").select("vec_id").write.parquet(ids_path)

    wh = str(tmp_path / "wh")
    built = _run_cli(
        "ann-build", "--vectors", vec_path, "--id", "vec_id",
        "--vec", "embedding", "--warehouse", wh, "--name", "ix",
        "--dim", str(DIM), "--m", "4", "--codes", "8", "--centroids", "4",
    )
    assert built.returncode == 0, built.stderr[-2000:]

    deleted = _run_cli(
        "ann-delete", "--ids", ids_path, "--id", "vec_id",
        "--warehouse", wh, "--name", "ix",
    )
    assert deleted.returncode == 0, deleted.stderr[-2000:]
    meta = json.loads(deleted.stdout.strip().splitlines()[-1])
    assert meta["index"] == "ix" and meta["partitions_rewritten"] >= 1

    queried = _run_cli(
        "ann-query", "--queries", vec_path, "--id", "vec_id",
        "--vec", "embedding", "--warehouse", wh, "--name", "ix",
        "--k", "60", "--nprobe", "4",
    )
    assert queried.returncode == 0, queried.stderr[-2000:]
    rows_out = json.loads(queried.stdout.strip().splitlines()[-1])
    assert not ({r["corpus_id"] for r in rows_out} & {10, 11})


def test_text_index_cli_build_append_query(spark, tmp_path):
    """text-index-build / --append / text-index-query drive the
    persisted BM25 lifecycle end-to-end from the CLI."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    head_path = str(tmp_path / "head.parquet")
    tail_path = str(tmp_path / "tail.parquet")
    docs.filter("doc_id < 400").write.parquet(head_path)
    docs.filter("doc_id >= 400").write.parquet(tail_path)

    wh = str(tmp_path / "wh")
    built = _run_cli(
        "text-index-build", "--docs", head_path, "--id", "doc_id",
        "--text", "text", "--warehouse", wh, "--name", "tix",
        "--buckets", "16",
    )
    assert built.returncode == 0, built.stderr[-2000:]
    meta = json.loads(built.stdout.strip().splitlines()[-1])
    assert meta["n_buckets"] == 16 and meta["n_docs"] == 400

    appended = _run_cli(
        "text-index-build", "--docs", tail_path, "--id", "doc_id",
        "--text", "text", "--warehouse", wh, "--name", "tix", "--append",
    )
    assert appended.returncode == 0, appended.stderr[-2000:]
    meta2 = json.loads(appended.stdout.strip().splitlines()[-1])
    assert meta2["n_docs"] == 500 and meta2["appended"] is True

    queried = _run_cli(
        "text-index-query", "--terms", "spark,table,join",
        "--warehouse", wh, "--name", "tix", "--k", "5",
    )
    assert queried.returncode == 0, queried.stderr[-2000:]
    rows = json.loads(queried.stdout.strip().splitlines()[-1])
    assert len(rows) == 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    # CLI result == direct operator result on the same corpus
    from gcp_data_pipeline_fyp_spark.operators.search import bm25_topk

    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(docs, "doc_id", "text", ["spark", "table", "join"], k=5).collect()
    ]
    assert [(r["doc_id"], r["score"]) for r in rows] == want


def test_ann_drift_cli(spark, tmp_path):
    """ann-drift reports the retrain verdict from the persisted
    index's stored assignment mix: a batch matching the training
    distribution says no; a single-blob batch says yes."""
    rng = random.Random(17)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(6)]

    def vec(blob):
        return [centers[blob][d] + rng.gauss(0, 0.1) for d in range(DIM)]

    rows = [(i, vec(i % 6)) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vecs = str(tmp_path / "vecs.parquet")
    df.write.parquet(vecs)
    wh = str(tmp_path / "wh")
    r = _run_cli(
        "ann-build", "--vectors", vecs, "--id", "vec_id", "--vec",
        "embedding", "--warehouse", wh, "--name", "ix", "--dim", str(DIM),
        "--centroids", "6",
    )
    assert r.returncode == 0, r.stderr[-2000:]

    same = str(tmp_path / "same.parquet")
    spark.createDataFrame(
        [(1000 + i, vec(i % 6)) for i in range(60)],
        "vec_id long, embedding array<double>",
    ).write.parquet(same)
    r = _run_cli(
        "ann-drift", "--vectors", same, "--id", "vec_id", "--vec",
        "embedding", "--warehouse", wh, "--name", "ix",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["retrain"] is False and out["n_cur"] == 60

    drifted = str(tmp_path / "drift.parquet")
    spark.createDataFrame(
        [(2000 + i, vec(3)) for i in range(60)],
        "vec_id long, embedding array<double>",
    ).write.parquet(drifted)
    r = _run_cli(
        "ann-drift", "--vectors", drifted, "--id", "vec_id", "--vec",
        "embedding", "--warehouse", wh, "--name", "ix",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["retrain"] is True


def test_maintain_cli_census_and_compact(spark, tmp_path):
    """maintain: census-only leaves files alone; --compact bin-packs
    and reports before/after through the same JSON surface."""
    wh_dir = str(tmp_path / "mwh")
    from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

    wh = Warehouse(spark, wh_dir)
    for i in range(6):
        wh.append(
            spark.range(i * 10, (i + 1) * 10).repartition(3), "TBL"
        )

    census = _run_cli("maintain", "--warehouse", wh_dir, "--table", "TBL")
    assert census.returncode == 0, census.stderr[-2000:]
    rep = json.loads(census.stdout.strip().splitlines()[-1])
    n0 = rep["before"]["n_files"]
    assert n0 >= 12 and "compaction" not in rep

    compacted = _run_cli(
        "maintain", "--warehouse", wh_dir, "--table", "TBL",
        "--compact", "--target-mb", "1024",
    )
    assert compacted.returncode == 0, compacted.stderr[-2000:]
    rep2 = json.loads(compacted.stdout.strip().splitlines()[-1])
    assert rep2["compaction"]["n_files_before"] == n0
    assert rep2["after"]["n_files"] == 1
    assert wh.read("TBL").count() == 60
