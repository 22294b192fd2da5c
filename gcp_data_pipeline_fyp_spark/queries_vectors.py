"""Driver-facing probes for similarity search over embedding columns.

`ann_cosine_topk` (brute force) and `embedding_neardup` are fully
oracle-checked — the DuckDB SQL recomputes cosine with the same
index-order fold, and scores are rounded to 6 decimals before ranking
so both engines rank identically. The LSH and IVF variants are the
scale path: approximate by design, so they carry no SQL oracle (the
driver records a rows-only check) — their recall against brute force
is asserted in tests/test_similarity.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.dedup import embedding_neardup_pairs
from gcp_data_pipeline_fyp_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from gcp_data_pipeline_fyp_spark.queries_util import load

_SQL_COS = """
  round(
    list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i]))
    / nullif(sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))
           * sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))), 0),
  6)
"""


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "embeddings", spread=True)


def q_ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    queries = e.filter(F.col("vec_id") < 8)
    corpus = e.filter(F.col("vec_id") >= 8)
    return brute_force_topk(queries, corpus, "vec_id", "embedding", k=5)


SQL_ANN_COSINE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= 8),
pairs AS (
  SELECT query_id, corpus_id, {_SQL_COS} AS cosine FROM c CROSS JOIN q),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rn
  FROM pairs)
SELECT query_id, corpus_id, CAST(cosine AS DECIMAL(18,6)) AS cosine
FROM ranked WHERE rn <= 5
"""


def q_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    planted = e.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    u = e.unionByName(planted)
    return embedding_neardup_pairs(u, "vec_id", "embedding", ["label"], threshold=0.99)


SQL_EMBEDDING_NEARDUP = f"""
WITH u AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding, label
  FROM embeddings WHERE vec_id % 20 = 0),
g AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM u),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    {_SQL_COS.replace('qv', 'a.v').replace('cv', 'b.v')} AS cosine
  FROM g a JOIN g b ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT id_a, id_b, CAST(cosine AS DECIMAL(18,6)) AS cosine
FROM pairs WHERE cosine >= 0.99
"""


# scale-path variants: approximate, no SQL oracle (recall tested in pytest)
def q_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    queries = e.filter(F.col("vec_id") < 8)
    corpus = e.filter(F.col("vec_id") >= 8)
    return lsh_topk(queries, corpus, "vec_id", "embedding", k=5, dim=64)


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    queries = e.filter(F.col("vec_id") < 8)
    corpus = e.filter(F.col("vec_id") >= 8)
    return ivf_topk(queries, corpus, "vec_id", "embedding", k=5)


VECTOR_QUERIES: dict[str, tuple] = {
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "ann_ivf_topk": (q_ann_ivf_topk, None),
}


def q_embedding_neardup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-blocked near-dup (no blocking column needed) — rows-only check;
    recall vs the blocked-exact variant is asserted in pytest."""
    from gcp_data_pipeline_fyp_spark.operators.dedup import embedding_neardup_lsh

    e = _emb(spark, sf)
    planted = e.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    u = e.unionByName(planted)
    return embedding_neardup_lsh(u, "vec_id", "embedding", threshold=0.99)


VECTOR_QUERIES["embedding_neardup_lsh"] = (q_embedding_neardup_lsh, None)


def q_kmeans_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column
    (operators/clustering.py) — iterative, so rows-only in the driver;
    cluster recovery on planted blobs is asserted in pytest."""
    from gcp_data_pipeline_fyp_spark.operators.clustering import kmeans

    e = _emb(spark, sf)
    assigned, _cent = kmeans(e, "vec_id", "embedding", k=8, max_iter=5)
    return assigned.select("vec_id", "cluster_id")


VECTOR_QUERIES["kmeans_embeddings"] = (q_kmeans_embeddings, None)


def q_semantic_neardup_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-blocked semantic near-dup: pairwise cosine only inside a
    k-means cell — rows-only (iterative blocking); recall vs the
    blocked-exact variant asserted in pytest."""
    from gcp_data_pipeline_fyp_spark.operators.clustering import (
        semantic_neardup_kmeans,
    )

    e = _emb(spark, sf)
    planted = e.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    u = e.unionByName(planted)
    return semantic_neardup_kmeans(u, "vec_id", "embedding", threshold=0.99, k=8)


VECTOR_QUERIES["semantic_neardup_kmeans"] = (q_semantic_neardup_kmeans, None)
