#!/usr/bin/env python3
"""Benchmark the engine's headline queries.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are forced with the `noop` sink (full computation, no write
cost). The headline set spans the engine's surface: star-schema build,
shuffled joins + aggregations, window functions, dedup (exact +
MinHash LSH), text metrics, and ANN top-k.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcp_data_pipeline_fyp_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "star_schema_fact",
    "pricing_summary",
    "top_revenue_orders",
    "region_nation_revenue",
    "order_priority_count",
    "running_customer_spend",
    "sessionize_events",
    "measure_totals_by_type",
    "rollup_type_day",
    "dedup_exact_stats",
    "text_quality",
    "simhash",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with one cheap action
    qs["measure_total_events"](spark, sf_dir).collect()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
