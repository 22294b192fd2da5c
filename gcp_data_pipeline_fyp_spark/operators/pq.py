"""Product quantization (Jégou et al., TPAMI 2011) — the compressed
vector representation a 100 TB ANN corpus actually stores.

Where SQ8 (operators/similarity.py:quantize_sq8) keeps one int8 per
component (8x compression), PQ splits each vector into `m` subvectors
and stores only the id of the nearest per-subspace codebook centroid:
`m` small ints per vector — 64-dim float64 at m=4 is 512 bytes down to
4 bytes of codes (plus the shared codebooks, n_codes*dim doubles
total). Scoring is asymmetric (ADC): the query stays full-precision,
one tiny lookup table of query-subvector x centroid dot products is
built per query batch, and each corpus vector's score is the sum of
`m` table lookups — no per-pair float math at all.

Spark-first shape:

- **Training** runs the engine's deterministic DataFrame k-means
  (operators/clustering.py) once per subspace over the corpus (or a
  sample at scale — same argument as IVF sampled training). Output is
  m * n_codes centroids: always broadcastable.
- **Encoding** is one nearest-centroid assignment pass per subspace
  (broadcast centroids, corpus scan).
- **Scoring** broadcasts the per-batch LUT (|Q| * m * n_codes rows)
  against the corpus code stream and does ONE id-keyed aggregation.

Cross-engine exactness: vectors are unit-normalized and rounded to
6 dp before training (identical doubles in any engine), k-means is the
certified decimal-exact Lloyd's, and LUT entries are integer
micro-units — so the final score (an exact int64 sum of m lookups) is
partition- and engine-invariant, and the DuckDB oracle replays the
whole algorithm bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.functions.vectors import as_double_vec
from gcp_data_pipeline_fyp_spark.functions.vectors import dot as vec_dot
from gcp_data_pipeline_fyp_spark.operators.similarity import (
    _topk_per_query,
    _unit,
)
from gcp_data_pipeline_fyp_spark.queries_util import micro6


def unit6(vec_col) -> F.Column:
    """Unit-normalized vector rounded to 6 dp per component — the
    canonical pre-quantization form: exact decimal values stored as
    their nearest double are identical in every engine, so everything
    derived downstream (codebooks, codes, scores) reproduces
    bit-for-bit. NULL for zero vectors (no direction to preserve)."""
    u = _unit(as_double_vec(vec_col))
    return F.transform(u, lambda x: F.round(x, 6))


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 3,
    dim: int = 64,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k via product quantization with
    asymmetric distance (train + encode + score in one call — the
    composition shape of `ivf_topk`).

    Returns (query_id, corpus_id, cosine_micro): the ADC approximation
    of the cosine in micro-units, an exact int64 sum of `m` LUT
    entries. Zero vectors on either side are dropped (meaningless
    under cosine, same rule as SQ8).
    """
    from gcp_data_pipeline_fyp_spark.operators.clustering import kmeans

    sub_dim = dim // m
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), unit6(vec_col).alias("__cv")
    ).filter(F.col("__cv").isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"), unit6(vec_col).alias("__qv")
    ).filter(F.col("__qv").isNotNull())

    code_frames = []
    lut_frames = []
    for mi in range(m):
        sub = F.slice(F.col("__cv"), mi * sub_dim + 1, sub_dim)
        pts = c.select(F.col("corpus_id"), sub.alias("__sub"))
        assigned, cent = kmeans(
            pts,
            "corpus_id",
            "__sub",
            k=n_codes,
            max_iter=iters,
            checkpoint_dir=checkpoint_dir,
        )
        code_frames.append(
            assigned.select(
                "corpus_id", F.lit(mi).alias("__m"), F.col("cluster_id")
            )
        )
        qsub = F.slice(F.col("__qv"), mi * sub_dim + 1, sub_dim)
        lut_frames.append(
            q.select(F.col("query_id"), qsub.alias("__qs"))
            .crossJoin(F.broadcast(cent))
            .select(
                "query_id",
                F.lit(mi).alias("__m"),
                "cluster_id",
                micro6(vec_dot(F.col("__qs"), F.col("centroid"))).alias("__lm"),
            )
        )

    codes = code_frames[0]
    for f in code_frames[1:]:
        codes = codes.unionByName(f)
    lut = lut_frames[0]
    for f in lut_frames[1:]:
        lut = lut.unionByName(f)

    pairs = (
        codes.join(F.broadcast(lut), ["__m", "cluster_id"])
        .groupBy("query_id", "corpus_id")
        # exact int64 sum of micro-unit LUT entries: partition-order
        # independent by construction, no float accumulation anywhere
        .agg(F.sum("__lm").alias("cosine_micro"))
    )
    return _topk_per_query(pairs, k)
