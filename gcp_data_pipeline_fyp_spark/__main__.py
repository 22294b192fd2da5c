"""CLI entry point — the operational surface of the engine.

A user of the reference runs: Cloud Function trigger -> Airflow DAG ->
five Dataflow jobs. The equivalent here:

    python3 -m gcp_data_pipeline_fyp_spark run \
        --raw /data/RAWDATA/whole_month_03.csv --warehouse /data/wh

    python3 -m gcp_data_pipeline_fyp_spark measures --warehouse /data/wh

    python3 -m gcp_data_pipeline_fyp_spark ingest --rawdata /data  # needs network

    python3 -m gcp_data_pipeline_fyp_spark validate \
        --table /data/wh/T_FACT_Events --contract contract.json

    python3 -m gcp_data_pipeline_fyp_spark ann-build \
        --vectors vecs.parquet --id vec_id --vec embedding \
        --warehouse /data/wh --name ix --dim 64 --residual
    python3 -m gcp_data_pipeline_fyp_spark ann-query \
        --queries qs.parquet --id vec_id --vec embedding \
        --warehouse /data/wh --name ix --k 10 --rerank --corpus vecs.parquet
    python3 -m gcp_data_pipeline_fyp_spark ann-delete \
        --ids victims.parquet --id vec_id --warehouse /data/wh --name ix

    python3 -m gcp_data_pipeline_fyp_spark text-index-build \
        --docs docs.parquet --id doc_id --text text \
        --warehouse /data/wh --name tix [--append]
    python3 -m gcp_data_pipeline_fyp_spark text-index-query \
        --terms spark,table,join --warehouse /data/wh --name tix --k 10

Mode (full/delta) is inferred from the filename exactly like the DAG's
branch; `--mode` overrides.
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gcp_data_pipeline_fyp_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run the 5-stage ELT pipeline on a raw CSV")
    run_p.add_argument("--raw", required=True, help="raw CSV path (whole_month_* or all_day_*)")
    run_p.add_argument("--warehouse", required=True, help="warehouse root directory")
    run_p.add_argument("--mode", choices=["full", "delta"], default=None)
    run_p.add_argument("--archive", action="store_true", help="archive the raw file after load")
    run_p.add_argument("--cpus", type=int, default=None)

    m_p = sub.add_parser("measures", help="evaluate the 12 DAX measures over the warehouse")
    m_p.add_argument("--warehouse", required=True)
    m_p.add_argument("--cpus", type=int, default=None)

    i_p = sub.add_parser("ingest", help="download the scheduled USGS feed into RAWDATA/")
    i_p.add_argument("--rawdata", required=True, help="directory receiving RAWDATA/<file>")

    v_p = sub.add_parser(
        "validate",
        help="run a JSON expectations/schema contract against a table "
        "(exit 1 on any violation)",
    )
    v_p.add_argument("--table", required=True, help="parquet table path")
    v_p.add_argument(
        "--contract", required=True,
        help='JSON file: {"schema": {col: type_class}, "rules": [{kind...}]}',
    )
    v_p.add_argument("--cpus", type=int, default=None)

    ab_p = sub.add_parser(
        "ann-build",
        help="build a persisted IVF-PQ index over a parquet vector table",
    )
    ab_p.add_argument("--vectors", required=True, help="parquet path with (id, vector) columns")
    ab_p.add_argument("--id", required=True, help="id column name")
    ab_p.add_argument("--vec", required=True, help="vector column name (array<double/float>)")
    ab_p.add_argument("--warehouse", required=True)
    ab_p.add_argument("--name", required=True, help="index name")
    ab_p.add_argument("--dim", type=int, required=True)
    ab_p.add_argument("--m", type=int, default=4)
    ab_p.add_argument("--codes", type=int, default=8)
    ab_p.add_argument("--centroids", type=int, default=16)
    ab_p.add_argument("--iters", type=int, default=3)
    ab_p.add_argument("--residual", action="store_true",
                      help="residual-encode codes (higher recall at the same bit budget)")
    ab_p.add_argument("--sample-frac", type=float, default=None,
                      help="fit both quantizers on a content-keyed sample (the 100 TB default)")
    ab_p.add_argument("--cpus", type=int, default=None)

    aq_p = sub.add_parser(
        "ann-query",
        help="top-k query a persisted IVF-PQ index (prints JSON rows)",
    )
    aq_p.add_argument("--queries", required=True, help="parquet path with query vectors")
    aq_p.add_argument("--id", required=True)
    aq_p.add_argument("--vec", required=True)
    aq_p.add_argument("--warehouse", required=True)
    aq_p.add_argument("--name", required=True)
    aq_p.add_argument("--k", type=int, default=10)
    aq_p.add_argument("--nprobe", type=int, default=4)
    aq_p.add_argument("--rerank", action="store_true",
                      help="exact-cosine rescore of the ADC candidates (needs --corpus)")
    aq_p.add_argument("--corpus", default=None,
                      help="parquet path with full-precision corpus vectors (for --rerank)")
    aq_p.add_argument("--cpus", type=int, default=None)

    tb_p = sub.add_parser(
        "text-index-build",
        help="build (or append to) a persisted BM25 inverted index",
    )
    tb_p.add_argument("--docs", required=True, help="parquet path with (id, text) columns")
    tb_p.add_argument("--id", required=True)
    tb_p.add_argument("--text", required=True)
    tb_p.add_argument("--warehouse", required=True)
    tb_p.add_argument("--name", required=True)
    tb_p.add_argument("--buckets", type=int, default=64)
    tb_p.add_argument("--append", action="store_true",
                      help="append the docs to an existing index instead of rebuilding")
    tb_p.add_argument("--cpus", type=int, default=None)

    tq_p = sub.add_parser(
        "text-index-query",
        help="BM25 top-k against a persisted inverted index (prints JSON rows)",
    )
    tq_p.add_argument("--terms", required=True,
                      help="comma-separated query terms")
    tq_p.add_argument("--warehouse", required=True)
    tq_p.add_argument("--name", required=True)
    tq_p.add_argument("--k", type=int, default=10)
    tq_p.add_argument("--cpus", type=int, default=None)

    ad_p = sub.add_parser(
        "ann-delete",
        help="delete ids from a persisted IVF-PQ index "
             "(partition-scoped rewrite; right-to-be-forgotten)",
    )
    ad_p.add_argument("--ids", required=True,
                      help="parquet path with the ids to delete")
    ad_p.add_argument("--id", required=True)
    ad_p.add_argument("--warehouse", required=True)
    ad_p.add_argument("--name", required=True)
    ad_p.add_argument("--cpus", type=int, default=None)

    dr_p = sub.add_parser(
        "ann-drift",
        help="retrain check: PSI between a persisted IVF index's "
             "stored assignment mix and a new vector batch (no refit)",
    )
    dr_p.add_argument("--vectors", required=True,
                      help="parquet path with the new vector batch")
    dr_p.add_argument("--id", required=True)
    dr_p.add_argument("--vec", required=True)
    dr_p.add_argument("--warehouse", required=True)
    dr_p.add_argument("--name", required=True)
    dr_p.add_argument("--threshold-micro", type=int, default=250_000)
    dr_p.add_argument("--cpus", type=int, default=None)

    mt_p = sub.add_parser(
        "maintain",
        help="small-file census of a warehouse table, optionally "
             "compacting it to ~target-sized files",
    )
    mt_p.add_argument("--warehouse", required=True)
    mt_p.add_argument("--table", required=True)
    mt_p.add_argument("--compact", action="store_true")
    mt_p.add_argument("--target-mb", type=int, default=128)
    mt_p.add_argument("--small-mb", type=int, default=32)
    mt_p.add_argument(
        "--partition-cols", default=None,
        help="comma-separated partitionBy columns (enables the "
             "fragmented-partitions-only rewrite path)",
    )
    mt_p.add_argument("--cpus", type=int, default=None)

    args = ap.parse_args(argv)

    if args.cmd == "ingest":
        from gcp_data_pipeline_fyp_spark.sources.files import fetch_feed

        dest = fetch_feed(datetime.datetime.now(), args.rawdata)
        print(dest)
        return 0

    from gcp_data_pipeline_fyp_spark.session import get_spark

    spark = get_spark(cpus=args.cpus)
    try:
        if args.cmd == "run":
            from gcp_data_pipeline_fyp_spark.plans.pipeline import run_pipeline
            from gcp_data_pipeline_fyp_spark.sources.states import states_df

            tables = run_pipeline(
                spark, args.raw, states_df(spark), args.warehouse,
                mode=args.mode, archive=args.archive,
            )
            print(json.dumps({name: df.count() for name, df in tables.items()}))
            return 0

        if args.cmd == "measures":
            from gcp_data_pipeline_fyp_spark.plans import measures
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            star = measures.star_events(
                wh.read("T_FACT_Events"), wh.read("T_DIM_Seismic_Activity_Type")
            ).persist()
            out = {
                "latest_daily_update": str(
                    measures.latest_daily_update(star).first()[0]
                ),
                "avg_earthquake_magnitude": measures.avg_earthquake_magnitude(star).first()[0],
                "max_earthquake_depth": measures.max_earthquake_depth(star).first()[0],
                "max_earthquake_magnitude": measures.max_earthquake_magnitude(star).first()[0],
                "totals_by_type": {
                    r["LB_type"]: r["total_events"]
                    for r in measures.totals_by_type(star).collect()
                },
                "total_seismic_events": measures.total_seismic_events(star).first()[0],
            }
            print(json.dumps(out))
            return 0

        if args.cmd == "ann-build":
            from gcp_data_pipeline_fyp_spark.operators.pq import (
                build_ivfpq_index,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            build_ivfpq_index(
                wh, spark.read.parquet(args.vectors), args.id, args.vec,
                args.name, m=args.m, n_codes=args.codes, iters=args.iters,
                dim=args.dim, n_centroids=args.centroids,
                train_sample_frac=args.sample_frac, residual=args.residual,
            )
            n = wh.read(f"{args.name}__codes").select("corpus_id").distinct().count()
            print(json.dumps({"index": args.name, "vectors": n,
                              "residual": args.residual}))
            return 0

        if args.cmd == "ann-query":
            from gcp_data_pipeline_fyp_spark.operators.pq import (
                ivfpq_topk_indexed,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            if args.rerank and not args.corpus:
                print("--rerank needs --corpus (full-precision vectors "
                      "to rescore against)", file=sys.stderr)
                return 2
            wh = Warehouse(spark, args.warehouse)
            q = spark.read.parquet(args.queries)
            out = ivfpq_topk_indexed(
                wh, q, args.id, args.vec, args.name,
                k=args.k, nprobe=args.nprobe,
            )
            if args.rerank:
                from gcp_data_pipeline_fyp_spark.operators.similarity import (
                    rerank_exact,
                )

                out = rerank_exact(
                    out, q, spark.read.parquet(args.corpus),
                    args.id, args.vec, k=args.k,
                )
            print(json.dumps([r.asDict() for r in out.collect()]))
            return 0

        if args.cmd == "text-index-build":
            from gcp_data_pipeline_fyp_spark.operators.search import (
                append_text_index,
                build_text_index,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            docs = spark.read.parquet(args.docs)
            if args.append:
                append_text_index(wh, docs, args.id, args.text, args.name)
            else:
                build_text_index(
                    wh, docs, args.id, args.text, args.name,
                    n_buckets=args.buckets,
                )
            stats = wh.read(f"{args.name}__stats").first()
            print(json.dumps({
                "index": args.name, "n_docs": stats["n_docs"],
                "n_buckets": stats["n_buckets"],
                "appended": bool(args.append),
            }))
            return 0

        if args.cmd == "text-index-query":
            from gcp_data_pipeline_fyp_spark.operators.search import (
                query_text_index,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            out = query_text_index(
                wh, spark,
                [t for t in args.terms.split(",") if t],
                args.name, k=args.k,
            )
            print(json.dumps([r.asDict() for r in out.collect()]))
            return 0

        if args.cmd == "ann-delete":
            from gcp_data_pipeline_fyp_spark.operators.pq import (
                delete_from_ivfpq_index,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            n = delete_from_ivfpq_index(
                wh, spark.read.parquet(args.ids), args.id, args.name
            )
            print(json.dumps({"index": args.name,
                              "partitions_rewritten": n}))
            return 0

        if args.cmd == "ann-drift":
            from gcp_data_pipeline_fyp_spark.operators.similarity import (
                ivf_retrain_decision_indexed,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            row = ivf_retrain_decision_indexed(
                wh, spark.read.parquet(args.vectors), args.id, args.vec,
                args.name, psi_threshold_micro=args.threshold_micro,
            ).first()
            if row is None:
                # zero assignable vectors in the batch (empty file or
                # all-NULL vec column): no distribution to compare
                print(json.dumps({
                    "index": args.name,
                    "error": "empty batch: no assignable vectors",
                }))
                return 1
            print(json.dumps({
                "index": args.name,
                "n_base": row["n_base"],
                "n_cur": row["n_cur"],
                "n_cats": row["n_cats"],
                "psi_micro": row["psi_micro"],
                "retrain": bool(row["retrain"]),
            }))
            return 0

        if args.cmd == "maintain":
            from gcp_data_pipeline_fyp_spark.operators.maintenance import (
                compact_table,
                table_file_stats,
            )
            from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

            wh = Warehouse(spark, args.warehouse)
            out = {
                "table": args.table,
                "before": table_file_stats(
                    wh, args.table, small_file_bytes=args.small_mb << 20
                ),
            }
            if args.compact:
                pcols = (
                    [c for c in args.partition_cols.split(",") if c]
                    if args.partition_cols
                    else None
                )
                out["compaction"] = compact_table(
                    wh, args.table,
                    target_file_bytes=args.target_mb << 20,
                    partition_cols=pcols,
                )
                out["after"] = table_file_stats(
                    wh, args.table, small_file_bytes=args.small_mb << 20
                )
            print(json.dumps(out))
            return 0

        if args.cmd == "validate":
            from gcp_data_pipeline_fyp_spark.operators.expectations import (
                expectations_report,
                rules_from_spec,
                schema_contract_report,
            )

            with open(args.contract) as fh:
                contract = json.load(fh)
            if not contract.get("schema") and not contract.get("rules"):
                # fail loud, not open: a typo'd top-level key ("Rules",
                # "schemas") must not exit 0 having validated nothing
                print(
                    "contract has neither 'schema' nor 'rules' — nothing "
                    "to validate",
                    file=sys.stderr,
                )
                return 2
            df = spark.read.parquet(args.table)
            report: dict = {}
            ok = True
            if contract.get("schema"):
                rows = schema_contract_report(df, contract["schema"]).collect()
                report["schema"] = [r.asDict() for r in rows]
                ok = ok and all(r["status"] == "ok" for r in rows)
            if contract.get("rules"):
                rows = expectations_report(
                    df, rules_from_spec(contract["rules"])
                ).collect()
                report["rules"] = [r.asDict() for r in rows]
                ok = ok and all(r["passed"] for r in rows)
            print(json.dumps(report))
            return 0 if ok else 1
    finally:
        spark.stop()
    return 1


if __name__ == "__main__":
    sys.exit(main())
