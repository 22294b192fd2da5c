"""Probes for the streaming aggregation surface and multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gcp_data_pipeline_fyp_spark.multimodal.binary_ops import (
    byte_features,
    with_media_column,
)
from gcp_data_pipeline_fyp_spark.queries_util import load
from gcp_data_pipeline_fyp_spark.streaming.ingest import windowed_event_counts


def q_windowed_counts(spark: SparkSession, sf: str) -> DataFrame:
    """The streaming measure evaluated in batch mode (same function body
    runs under readStream with a watermark — see streaming/ingest.py and
    tests/test_streaming.py)."""
    ev = load(spark, sf, "events")
    return windowed_event_counts(ev, window="1 hour")


SQL_WINDOWED_COUNTS = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type AS lb_type,
       count(*) AS total_events
FROM events
GROUP BY 1, 2, 3
"""


def q_multimodal_byte_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary media column -> Arrow-batched mapInPandas feature extraction."""
    d = load(spark, sf, "documents", spread=True)
    media = with_media_column(d, "text", "doc_id")
    return byte_features(media)


SQL_MULTIMODAL_BYTE_FEATURES = """
SELECT doc_id AS media_id,
  octet_length(encode(text)) AS n_bytes,
  cast(length(text) - length(replace(text, ' ', '')) AS bigint) AS n_space_bytes,
  md5(text) AS content_md5
FROM documents
"""


MISC_QUERIES: dict[str, tuple] = {
    "windowed_counts": (q_windowed_counts, SQL_WINDOWED_COUNTS),
    "multimodal_byte_features": (q_multimodal_byte_features, SQL_MULTIMODAL_BYTE_FEATURES),
}
