#!/usr/bin/env python3
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
  python3 tools/capture_plans.py <tag> <suffix> [name ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: a
curated target list). `suffix` is normally "before" or "after".
Planning only — the query is built and explained, not executed (probes
whose builders do eager side work still pay that part).
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "semdedup_docs",
    "corpus_prep_v3",
    "corpus_prep_v2",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "ann_sq8_topk",
    "kmeans_embeddings",
    "ivf_retrain_decision",
    "bitext_ivf_agreement",
    "dsir_sample_docs",
    "pagerank_sim_graph",
    "label_prop_communities",
    "star_schema_fact",
    "hybrid_rerank_topk",
    "pii_redact_docs",
    "chunk_docs",
    "unimax_epoch_mix_docs",
]


def main() -> int:
    import __spark_entry__ as entry_mod
    from gcp_data_pipeline_fyp_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = entry_mod.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            txt = buf.getvalue()
            n_ex = txt.count("Exchange")
            n_smj = txt.count("SortMergeJoin")
            n_bhj = txt.count("BroadcastHashJoin")
            n_py = txt.count("EvalPython")
            print(f"[plan] {name}: Exchange={n_ex} SMJ={n_smj} BHJ={n_bhj} PyEval={n_py}")
        except Exception as e:  # noqa: BLE001
            print(f"[plan-ERR] {name}: {e}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
