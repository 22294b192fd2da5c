#!/usr/bin/env python3
"""Registry-wide physical-plan audit.

Builds every `queries()` entry at $SF_DIR (default sf0.001) and scans
the executed-plan string for the two anti-patterns the engine bans
everywhere:

- `CartesianProduct` — a non-broadcast cross join pairing full frames
  (the `crossJoin(F.broadcast(scalar))` idiom plans as
  BroadcastNestedLoopJoin and is fine);
- `BatchEvalPython` — a row-at-a-time Python UDF in the batch surface
  (Arrow paths plan as ArrowEvalPython / MapInPandas and are fine).

Iterative operators (k-means, BPE, PageRank, ...) run real driver-loop
jobs while CONSTRUCTING their result frame, so a sweep is not free —
but it is exactly the audit a plan reviewer would do by hand, fanned
over the whole registry. Violations print per query; exit 1 if any.

Usage: [SF_DIR=...] python3 tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def main() -> int:
    import __spark_entry__ as entry
    from gcp_data_pipeline_fyp_spark.session import get_spark

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    names = sys.argv[1:] or list(entry.queries().keys())
    qs = entry.queries()
    bad: dict[str, list[str]] = {}
    err: dict[str, str] = {}
    smj = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit keeps going
            err[name] = repr(e)[:200]
            print(f"[ERR] {name}: {err[name]}", flush=True)
            continue
        hits = [f for f in FORBIDDEN if f in plan]
        smj += len(re.findall(r"SortMergeJoin", plan))
        if hits:
            bad[name] = hits
            print(f"[BAD] {name}: {hits}", flush=True)
        else:
            print(f"[ok] {name}", flush=True)
    print(
        json.dumps(
            {
                "audited": len(names),
                "violations": bad,
                "errors": err,
                "sortmergejoin_total": smj,
                "sf_dir": SF_DIR,
            }
        )
    )
    return 1 if bad or err else 0


if __name__ == "__main__":
    raise SystemExit(main())
