#!/usr/bin/env python3
"""Interleaved 8-vs-32-core A/B on the bench's suffix legs.

The r12 driver's 32-core run measured the write/stream suffix legs
(pipeline_full_load, streaming_validated_ingest, zonemap_build, ...)
2.5-9x slower than its own 8-core run of the SAME tree — either a
poisoned ambient window or genuine inverse scaling of the write paths
(VERDICT r12 item 1). This probe settles it with evidence: the exact
`_bench_*` functions the driver times, run at alternating core counts
(arm order 32,8,32,8,... interleaved rep by rep so ambient drift hits
both arms equally), fresh SparkSession per arm (master local[N] is
fixed at session creation — cross-core-count arms cannot share one
session, so rep-interleaving is the closest realizable protocol).

Usage: python tools/suffix_ab.py [reps=3] [sf_dir]
Prints one JSON line per arm-rep and a median table at the end.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from gcp_data_pipeline_fyp_spark.session import get_spark  # noqa: E402

LEGS = [
    "pipeline_full_load",
    "pipeline_delta_load",
    "streaming_validated_ingest",
    "streaming_sessionize",
    "streaming_drift_monitor",
    "text_index_build",
    "text_index_query",
    "zonemap_build",
    "zonemap_pruned_query",
    "zonemap_full_scan_query",
]


def run_arm(cpus: int, sf_dir: str) -> dict:
    spark = get_spark(app_name=f"suffix_ab_{cpus}", cpus=cpus,
                      shuffle_partitions=cpus)
    timings: dict = {}
    try:
        # same warm-up the bench uses (JVM + parquet footers)
        import __spark_entry__ as entry_mod

        entry_mod.queries()["measure_total_events"](spark, sf_dir).collect()
        bench._bench_pipeline(spark, sf_dir, timings)
        bench._bench_streaming(spark, sf_dir, timings)
        bench._bench_text_index(spark, sf_dir, timings)
        bench._bench_zonemap(spark, sf_dir, timings)
    finally:
        spark.stop()
    return timings


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    results: dict[int, list[dict]] = {32: [], 8: []}
    for rep in range(reps):
        for cpus in (32, 8):
            t = run_arm(cpus, sf_dir)
            results[cpus].append(t)
            print(json.dumps({"rep": rep, "cpus": cpus, "timings": t}),
                  flush=True)
    meds = {}
    for cpus, runs in results.items():
        meds[cpus] = {
            leg: sorted(r.get(leg, float("nan")) for r in runs)[len(runs) // 2]
            for leg in LEGS
        }
    print("\nleg                          med32    med8   32/8")
    for leg in LEGS:
        m32, m8 = meds[32][leg], meds[8][leg]
        print(f"{leg:28s} {m32:7.2f} {m8:7.2f} {m32 / m8:6.2f}")
    print(json.dumps({"medians": meds}))


if __name__ == "__main__":
    main()
