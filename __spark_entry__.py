"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship star-schema build + measure rollup on
sf0.001; `queries()` exposes every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators);
`oracle_sql()` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_data_pipeline_fyp_spark.queries_analytics import ANALYTICS_QUERIES
from gcp_data_pipeline_fyp_spark.queries_pipeline import PIPELINE_QUERIES
from gcp_data_pipeline_fyp_spark.queries_text import TEXT_QUERIES
from gcp_data_pipeline_fyp_spark.queries_misc import MISC_QUERIES
from gcp_data_pipeline_fyp_spark.queries_vectors import VECTOR_QUERIES

_REGISTRIES = [
    PIPELINE_QUERIES,
    ANALYTICS_QUERIES,
    TEXT_QUERIES,
    VECTOR_QUERIES,
    MISC_QUERIES,
]

# The driver's correctness gate checks a 50-query prefix of `queries()`
# (CORRECTNESS_r01 covered exactly the first 50 of 71). Order the dict so
# queries without a green driver row yet — plus any whose plan changed
# this round — land inside that window; the r01-green, untouched queries
# rotate to the back. Rotate this list each round until every
# oracle-backed query has a driver-certified row.
#
# ROUND-3 ROTATION NOTE: this r02 list holds 50 entries (all new/
# unproven/changed as of r02), so the window is full; `boilerplate_docs`
# (added after the window filled; mirror- and pytest-verified) waits
# just outside it. After the r02 CORRECTNESS lands, rebuild this list
# as: (queries added in r03) + boilerplate_docs + clean_text_docs +
# domain_stats + temperature_mix + (any red r02 rows) +
# (r01-green queries that have rotated out of the window for two
# rounds — the tail of queries() below, starting at
# measure_total_events/pricing_summary) so every query re-certifies on
# a rolling cadence.
_CHECK_FIRST = [
    # new this round — never driver-checked
    "paragraph_dedup",
    "quantile_rollup",
    "clean_html_docs",
    "decontaminate_corpus",
    "pack_sequences",
    "repetition_metrics",
    "stratified_sample",
    "numeric_profile",
    "outlier_events",
    "dup_clusters",
    "bm25_search",
    "tfidf_top_terms",
    "token_budget_sample",
    "corpus_mix_report",
    "rollup_incremental",
    "kmeans_embeddings",
    "semantic_neardup_kmeans",
    "pagerank_sim_graph",
    "interval_attribution",
    "heavy_hitter_tokens",
    "cdc_snapshot",
    "canonical_docs",
    "distinct_users_rollup",
    "unigram_logprob_score",
    "corpus_prep_full",
    "daily_p95_sliding",
    # no CORRECTNESS row in r01 (fell outside the 50-query window)
    "gopher_filter",
    "dedupe_corpus",
    "hash_sample",
    "train_val_test_split",
    "corpus_prep",
    "ann_cosine_topk",
    "embedding_neardup",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup_lsh",
    "windowed_counts",
    "multimodal_byte_features",
    "dax_q1_latest_update",
    "dax_q2_avg_mag",
    "dax_q3_max_depth",
    "dax_q4_max_mag",
    "dax_q5_11_totals",
    "dax_q12_total",
    "json_extract",
    "asof_last_click",
    "range_join_shipments",
    "sql_interface",
    # plans changed this round — re-certify. (dedup_exact_rows,
    # minhash_lsh_pairs and merge_upsert rotated out to make room for
    # the three new probes: r01-green, and their r02 plan changes are
    # mirror-verified; dedup_exact_stats certifies the shared digest-
    # keying change for the exact-dedup family.)
    "star_schema_fact",
    "dedup_exact_stats",
]


def _ordered(items: dict) -> dict:
    head = {n: items[n] for n in _CHECK_FIRST if n in items}
    tail = {n: v for n, v in items.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full star-schema build (dims + fact) over events at sf0.001."""
    from gcp_data_pipeline_fyp_spark.queries_analytics import q_star_schema_fact

    return q_star_schema_fact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for reg in _REGISTRIES:
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _REGISTRIES:
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return _ordered(out)
