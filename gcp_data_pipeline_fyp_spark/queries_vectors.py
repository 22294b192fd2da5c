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


def _kmeans_ctes(pts_sql: str, k: int, iters: int, dim: int = 64) -> str:
    """Chained CTEs mirroring operators/clustering.py:kmeans exactly.

    Lloyd's with seeded init (k lowest ids) is deterministic, so a
    FIXED-iteration unroll certifies the iterative operator — the same
    pattern as the PageRank oracle. Spark's early stop is a fixpoint
    (assignments unchanged => centroids recompute identically), so
    running the full `iters` rounds in the oracle converges to the same
    assignment. The algebra matches step for step: squared-distance
    fold in index order, argmin ties broken on cluster id, per-
    dimension means as decimal(28,12) sums cast to double.
    """
    dist = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i__ -> (p.v[i__] - c.cv[i__]) * (p.v[i__] - c.cv[i__])))"
    )

    def assign(j: int) -> str:
        return (
            f"a{j} AS (SELECT id, v, cid FROM ("
            f"SELECT p.id, p.v, c.cid, row_number() OVER ("
            f"PARTITION BY p.id ORDER BY {dist} ASC, c.cid) AS rn "
            f"FROM pts p CROSS JOIN c{j} c) s WHERE rn = 1)"
        )

    def update(j: int) -> str:
        return (
            f"c{j} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM ("
            f"SELECT cid, idx.pos, "
            f"CAST(sum(CAST(v[idx.pos] AS DECIMAL(28,12))) AS DOUBLE) "
            f"/ count(*) AS m FROM a{j - 1} CROSS JOIN "
            f"(SELECT unnest(generate_series(1, {dim})) AS pos) idx "
            f"GROUP BY cid, idx.pos) s GROUP BY cid)"
        )

    parts = [
        f"pts AS ({pts_sql})",
        f"c0 AS (SELECT row_number() OVER (ORDER BY id) AS cid, v AS cv "
        f"FROM (SELECT id, v FROM pts ORDER BY id LIMIT {k}) s)",
        assign(0),
    ]
    for j in range(1, iters + 1):
        parts.append(update(j))
        parts.append(assign(j))
    return ",\n".join(parts)


_PTS_PLAIN = "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings"
_PTS_PLANTED = """
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 20 = 0
"""


def q_kmeans_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column
    (operators/clustering.py) — seeded init + decimal-exact centroid
    means make it oracle-checkable via a fixed-iteration CTE unroll;
    planted-blob recovery is additionally asserted in pytest."""
    from gcp_data_pipeline_fyp_spark.operators.clustering import kmeans

    e = _emb(spark, sf)
    assigned, _cent = kmeans(e, "vec_id", "embedding", k=8, max_iter=5)
    return assigned.select("vec_id", "cluster_id")


SQL_KMEANS_EMBEDDINGS = f"""
WITH {_kmeans_ctes(_PTS_PLAIN, k=8, iters=5)}
SELECT id AS vec_id, cid AS cluster_id FROM a5
"""

VECTOR_QUERIES["kmeans_embeddings"] = (q_kmeans_embeddings, SQL_KMEANS_EMBEDDINGS)


def q_semantic_neardup_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-blocked semantic near-dup: pairwise cosine only inside a
    k-means cell — oracle-checked end to end (fixed-iteration k-means
    CTE + in-cluster pair scan); recall vs the blocked-exact variant is
    additionally asserted in pytest."""
    from gcp_data_pipeline_fyp_spark.operators.clustering import (
        semantic_neardup_kmeans,
    )

    e = _emb(spark, sf)
    planted = e.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    u = e.unionByName(planted)
    return semantic_neardup_kmeans(u, "vec_id", "embedding", threshold=0.99, k=8)


SQL_SEMANTIC_NEARDUP_KMEANS = f"""
WITH {_kmeans_ctes(_PTS_PLANTED, k=8, iters=5)},
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
    CAST({_SQL_COS.replace('qv', 'a.v').replace('cv', 'b.v')}
         AS DECIMAL(18,6)) AS cosine
  FROM a5 a JOIN a5 b ON a.cid = b.cid AND a.id < b.id)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.99
"""

VECTOR_QUERIES["semantic_neardup_kmeans"] = (
    q_semantic_neardup_kmeans,
    SQL_SEMANTIC_NEARDUP_KMEANS,
)
