#!/usr/bin/env python3
"""Interleaved A/B for the r13 connected-components Observation fusion.

Arm A = committed loop (fixpoint signature rides the materializing
action as an Observation metric). Arm B = the r12 loop (inline copy:
separate count job at startup + one aggregate job per round). Both run
the FORCED-distributed closure (driver_threshold=0) over the same LSH
candidate graph the quality_canonical_docs leg builds at $SF_DIR, in
one session, arms alternating rep by rep. Reports wall + Spark job
count per run (statusStore) + bit-equality of the label sets.

Usage: [SF_DIR=/root/testdata/sf0.1] python3 tools/cc_observe_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def _job_count(spark) -> int:
    return spark._jsc.sc().statusStore().jobsList(None).size()


def old_components(edges, src, dst, max_iter=25):
    """The r12 loop, verbatim shape: materialize + separate agg job."""
    from gcp_data_pipeline_fyp_spark.operators.components import (
        _large_star,
        _small_star,
    )
    from gcp_data_pipeline_fyp_spark.operators.iterate import materialize

    nodes = materialize(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct(),
        None,
    )
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    cur = materialize(cur, None)
    cur.count()
    prev_sig = tuple(
        cur.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")),
        ).first()
    )
    for _ in range(max_iter):
        nxt = materialize(_small_star(_large_star(cur)), None)
        sig = tuple(
            nxt.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")),
            ).first()
        )
        stable = sig == prev_sig and nxt.subtract(cur).limit(1).count() == 0
        cur, prev_sig = nxt, sig
        if stable:
            children = cur.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            singletons = nodes.join(
                cur.select(F.col("u").alias("node")), "node", "left_anti"
            ).withColumn("component", F.col("node"))
            return children.union(singletons)
    raise RuntimeError("no convergence")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from gcp_data_pipeline_fyp_spark.operators.components import (
        connected_components,
    )
    from gcp_data_pipeline_fyp_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from gcp_data_pipeline_fyp_spark.queries_util import load
    from gcp_data_pipeline_fyp_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="cc_ab", cpus=cpus, shuffle_partitions=cpus)
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=8, bands=4
    ).localCheckpoint()
    n_pairs = pairs.count()
    print(f"candidate pairs: {n_pairs}", flush=True)

    base = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, driver_threshold=0
        ).collect()
    }
    results = {"new": [], "old": []}
    for rep in range(reps):
        for arm in ("new", "old"):
            spark.sparkContext.setJobDescription(f"cc_{arm}_rep{rep}")
            j0 = _job_count(spark)
            t0 = time.perf_counter()
            if arm == "new":
                out = connected_components(pairs, driver_threshold=0)
            else:
                out = old_components(pairs, "id_a", "id_b")
            got = {r["node"]: r["component"] for r in out.collect()}
            wall = time.perf_counter() - t0
            jobs = _job_count(spark) - j0
            assert got == base, f"{arm} labels diverged"
            results[arm].append((wall, jobs))
            print(
                f"rep {rep} arm {arm}: {wall:.2f}s, {jobs} jobs", flush=True
            )
    for arm, rows in results.items():
        walls = sorted(w for w, _ in rows)
        jobs = sorted(j for _, j in rows)
        print(
            f"{arm}: median wall {walls[len(walls) // 2]:.2f}s, "
            f"median jobs {jobs[len(jobs) // 2]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
