#!/usr/bin/env python3
"""MMR pool-width probe: measure mmr_rerank at realistic (|Q|, C, k).

The scaling claim under test (operators/rerank.py): the greedy loop is
k-1 rounds of candidate-pool-sized joins, so its cost depends ONLY on
the pool (|Q| x C) and k — never on the corpus. This probe holds the
corpus fixed, materializes the retrieval candidates once
(localCheckpoint, so retrieval cost is excluded), then times the MMR
increment across a (|Q|, C, k) grid. Near-flat growth in |Q|x C and
~linear growth in k (plan rounds) is the expected reading; a blow-up
in k would indicate lineage-depth pathology (the cue to checkpoint
between rounds).

Usage: python3 tools/mmr_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gcp_data_pipeline_fyp_spark.operators.rerank import mmr_rerank  # noqa: E402
from gcp_data_pipeline_fyp_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
)
from gcp_data_pipeline_fyp_spark.queries_util import load  # noqa: E402
from gcp_data_pipeline_fyp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        app_name="mmr-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    emb = load(spark, SF_DIR, "embeddings", spread=True)
    n = emb.count()
    results: dict[str, float] = {}
    for n_q, c in ((100, 20), (100, 50), (1000, 50)):
        queries = emb.filter(F.col("vec_id") < n_q)
        corpus = emb.filter(F.col("vec_id") >= n_q)
        cands = brute_force_topk(
            queries, corpus, "vec_id", "embedding", k=c
        ).localCheckpoint(eager=True)  # retrieval paid once, outside timers
        for k in (5, 10):
            t0 = time.perf_counter()
            mmr_rerank(
                cands, corpus, "vec_id", "embedding", k=k, lambda_micro=700_000
            ).write.mode("overwrite").format("noop").save()
            results[f"q{n_q}_c{c}_k{k}"] = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {"metric": "mmr_pool_probe", "sf_dir": SF_DIR, "corpus_rows": n,
             "times_sec": results}
        )
    )


if __name__ == "__main__":
    main()
