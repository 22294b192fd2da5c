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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full star-schema build (dims + fact) over events at sf0.001."""
    from gcp_data_pipeline_fyp_spark.queries_analytics import q_star_schema_fact

    return q_star_schema_fact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for reg in _REGISTRIES:
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _REGISTRIES:
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return out
