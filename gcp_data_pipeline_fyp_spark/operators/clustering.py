"""K-means clustering over embedding columns + cluster-blocked
semantic near-dup.

Lloyd's algorithm expressed as DataFrame ops — no MLlib dependency, so
the operator composes with the rest of the engine's plans:

- assignment: a pure projection — the (tiny) centroid set rides along
  as one broadcast array and the argmin is a per-row fold
  (_argmin_cluster; no shuffle);
- update: posexplode the assigned vectors to (cluster, dim_pos, x) and
  average per (cluster, pos) — a corpus-sized but narrow shuffle;
- convergence: the previous assignment rides the re-assignment
  projection and an `observe` metric counts flips during the
  materializing action itself — one scalar per iteration with NO join
  and no extra job (the pre-r12 form shuffled the corpus twice per
  iteration just for this check);
- per-iteration materialization truncates the self-referential
  lineage, exactly like operators/components.py (executor-local by
  default; reliable `checkpoint_dir` for fault-exposed cluster runs —
  operators/iterate.py).

Determinism: init is the k lowest-id corpus vectors; ties in the
argmin break on centroid id; centroid means use exact decimal sums so
they don't depend on partial-aggregation order. Reruns on any cluster
layout produce identical clusterings.

`semantic_neardup_kmeans` uses the clustering as a BLOCKING stage:
pairwise cosine runs only inside a cluster, never across the corpus —
cost sum(|c_i|^2) instead of n^2. The LSH variant
(operators/dedup.py:embedding_neardup_lsh) is the fixed-cost scale
path; k-means blocking trades a clustering pass for better recall on
elongated clusters that sign-buckets split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.functions.vectors import as_double_vec, cosine
from gcp_data_pipeline_fyp_spark.operators.iterate import materialize
from gcp_data_pipeline_fyp_spark.queries_util import micro6


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_cluster(vec, cents_col, cid_t: str):
    """Per-row argmin over a broadcast (cluster_id-ascending) centroid
    array — the shuffle-free form of the row_number window the
    assignment passes used (guide §2.4). Semantics preserved exactly:
    __d asc with Spark's default NULLS FIRST (a NULL distance wins),
    ties break to the lower cluster_id (the array is id-ascending and
    the fold keeps the incumbent on ties)."""
    sc = F.transform(
        cents_col,
        lambda s: F.struct(
            _sq_dist(vec, s["__centroid"]).alias("__d"),
            s["cluster_id"].alias("cluster_id"),
        ),
    )
    return F.aggregate(
        sc,
        F.lit(None).cast(f"struct<__d:double,cluster_id:{cid_t}>"),
        lambda acc, s: F.when(acc.isNull(), s)
        .when(s["__d"].isNull() & acc["__d"].isNotNull(), s)
        .when(
            s["__d"].isNotNull()
            & acc["__d"].isNotNull()
            & (s["__d"] < acc["__d"]),
            s,
        )
        .otherwise(acc),
    )


def _assign_nearest(
    points: DataFrame, cent: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, __v, cluster_id): each point labeled with its nearest
    centroid — a pure projection against the broadcast centroid array
    (no crossJoin row explosion, no window shuffle; see
    _argmin_cluster). `carry` names extra point columns to pass
    through unchanged (the Lloyd loops carry the previous assignment
    so the convergence check needs no join — see `kmeans`)."""
    cid_t = dict(cent.dtypes)["cluster_id"]
    carr = cent.agg(
        F.array_sort(
            F.collect_list(F.struct("cluster_id", "__centroid"))
        ).alias("__cents")
    )
    return (
        points.crossJoin(F.broadcast(carr))
        .select(
            "__id", "__v", *carry,
            _argmin_cluster(F.col("__v"), F.col("__cents"), cid_t).alias("__best"),
        )
        .filter(F.col("__best").isNotNull())
        .select(
            "__id", "__v", *carry,
            F.col("__best.cluster_id").alias("cluster_id"),
        )
    )


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    pin_points: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Cluster rows by embedding; returns (assignments, centroids).

    assignments: (id_col, cluster_id); centroids: (cluster_id,
    centroid array<double>). Stops early when no assignment changes.

    `checkpoint_dir`: per-iteration lineage truncation is executor-
    local by default (right for local mode); pass a reliable directory
    for fault-tolerant cluster runs (operators/iterate.py, DEPLOY.md).

    `pin_points`: every assignment pass reuses the points frame, so
    pinning it (eager checkpoint) is the right trade when the caller
    passes a bounded TRAINING SAMPLE — the usual fit shape. Pass False
    when `df` is a full corpus (semantic_neardup_kmeans): the points
    are then cached evictably (MEMORY_AND_DISK with lineage kept), so
    corpus-sized vector blocks never pin executor storage and Spark
    may recompute a partition instead of holding it (ADVICE r5).
    """
    pts = df.select(
        F.col(id_col).alias("__id"), as_double_vec(vec_col).alias("__v")
    )
    if pin_points:
        pts = materialize(pts, checkpoint_dir)
    else:
        from pyspark import StorageLevel

        pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    cent = (
        pts.orderBy("__id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("__id")).alias("cluster_id"),
            F.col("__v").alias("__centroid"),
        )
    )
    cent = materialize(cent, checkpoint_dir)
    assigned = materialize(_assign_nearest(pts, cent), checkpoint_dir)
    for _ in range(max_iter):
        # decimal-exact per-dimension mean: partial-agg order independent
        cent = (
            assigned.select(
                "cluster_id", F.posexplode("__v").alias("__pos", "__x")
            )
            .groupBy("cluster_id", "__pos")
            .agg(
                (
                    F.sum(F.col("__x").cast("decimal(28,12)")).cast("double")
                    / F.count("__x")
                ).alias("__m")
            )
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__m")))
                    ),
                    lambda s: s["__m"],
                ).alias("__centroid")
            )
        )
        cent = materialize(cent, checkpoint_dir)
        # convergence check fused into the assignment pass (guide
        # §2.4): the previous cluster_id rides along the re-assignment
        # projection and an `observe` metric counts flips during the
        # SAME action that materializes it — the old form paid a
        # corpus-sized join (2 exchanges + sorts) plus an extra job
        # per iteration just to learn one scalar. `assigned` holds
        # exactly the point set (same (__id, __v) rows as `pts` while
        # any centroid exists), so re-assigning from it is identical.
        obs = Observation()
        cand = _assign_nearest(
            assigned.withColumnRenamed("cluster_id", "__prev"),
            cent,
            carry=("__prev",),
        ).observe(
            obs,
            F.count_if(F.col("cluster_id") != F.col("__prev")).alias(
                "changed"
            ),
        )
        new_assigned = materialize(cand.drop("__prev"), checkpoint_dir)
        changed = int(obs.get["changed"] or 0)
        assigned = new_assigned
        if changed == 0:
            break
    return (
        assigned.select(F.col("__id").alias(id_col), "cluster_id"),
        cent.select("cluster_id", F.col("__centroid").alias("centroid")),
    )


def _assign_nearest_grouped(
    points: DataFrame, cent: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(group, id, __v, cluster_id): nearest centroid WITHIN the row's
    group — the grouped twin of `_assign_nearest` (same distance, same
    lower-cluster-id tie break), as a broadcast-join + per-row argmin
    instead of a per-(group, id) window shuffle. `carry` as in
    `_assign_nearest`."""
    cid_t = dict(cent.dtypes)["cluster_id"]
    carr = cent.groupBy("__g").agg(
        F.array_sort(
            F.collect_list(F.struct("cluster_id", "__centroid"))
        ).alias("__cents")
    )
    return (
        points.join(F.broadcast(carr), "__g")
        .select(
            "__g", "__id", "__v", *carry,
            _argmin_cluster(F.col("__v"), F.col("__cents"), cid_t).alias("__best"),
        )
        .filter(F.col("__best").isNotNull())
        .select(
            "__g", "__id", "__v", *carry,
            F.col("__best.cluster_id").alias("cluster_id"),
        )
    )


def kmeans_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str,
    vec_col: str,
    k: int = 8,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run an independent `kmeans` per `group_col` value in ONE joint
    Lloyd's loop — same init (k lowest ids per group), same decimal
    means, same tie breaks, so per-group results are IDENTICAL to
    per-group `kmeans` calls (test-pinned); what changes is the job
    count: one assignment pass and one update pass per iteration for
    ALL groups, instead of a sequential Spark-job chain per group.

    This is the fit PQ codebooks want (m subspaces = m groups): at m=8
    the sequential form launches 8x the jobs over the same bytes, and
    driver/job overhead — not compute — dominates small fits. Stops
    when NO group changes assignment; extra iterations on an
    already-converged group are mathematically idempotent (means of
    unchanged members), so joint early-stop preserves per-group
    results.

    Returns (assignments (group, id, cluster_id), centroids
    (group, cluster_id, centroid))."""
    # one materialization, reused by every assignment pass (see kmeans)
    pts = materialize(
        df.select(
            F.col(group_col).alias("__g"),
            F.col(id_col).alias("__id"),
            as_double_vec(vec_col).alias("__v"),
        ),
        checkpoint_dir,
    )
    w_init = Window.partitionBy("__g").orderBy("__id")
    cent = (
        pts.withColumn("__rn", F.row_number().over(w_init))
        .filter(F.col("__rn") <= k)
        .select(
            "__g", F.col("__rn").alias("cluster_id"), F.col("__v").alias("__centroid")
        )
    )
    cent = materialize(cent, checkpoint_dir)
    assigned = materialize(_assign_nearest_grouped(pts, cent), checkpoint_dir)
    for _ in range(max_iter):
        cent = (
            assigned.select(
                "__g", "cluster_id", F.posexplode("__v").alias("__pos", "__x")
            )
            .groupBy("__g", "cluster_id", "__pos")
            .agg(
                (
                    F.sum(F.col("__x").cast("decimal(28,12)")).cast("double")
                    / F.count("__x")
                ).alias("__m")
            )
            .groupBy("__g", "cluster_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__m")))
                    ),
                    lambda s: s["__m"],
                ).alias("__centroid")
            )
        )
        cent = materialize(cent, checkpoint_dir)
        # fused convergence check — same rationale and equivalence
        # argument as the ungrouped loop in `kmeans` above
        obs = Observation()
        cand = _assign_nearest_grouped(
            assigned.withColumnRenamed("cluster_id", "__prev"),
            cent,
            carry=("__prev",),
        ).observe(
            obs,
            F.count_if(F.col("cluster_id") != F.col("__prev")).alias(
                "changed"
            ),
        )
        new_assigned = materialize(cand.drop("__prev"), checkpoint_dir)
        changed = int(obs.get["changed"] or 0)
        assigned = new_assigned
        if changed == 0:
            break
    return (
        assigned.select(
            F.col("__g").alias(group_col),
            F.col("__id").alias(id_col),
            "cluster_id",
        ),
        cent.select(
            F.col("__g").alias(group_col),
            "cluster_id",
            F.col("__centroid").alias("centroid"),
        ),
    )


def semantic_neardup_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    k: int = 16,
    max_iter: int = 5,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, cosine >= threshold), blocked by
    k-means cluster — pairwise cost is per-cluster, never corpus-wide.

    The fit runs over the FULL corpus here (blocking needs every
    vector assigned), so the points cache is evictable rather than
    pinned (`pin_points=False`) — see `kmeans`."""
    assigned, _ = kmeans(
        df, id_col, vec_col, k=k, max_iter=max_iter, pin_points=False
    )
    v = df.select(F.col(id_col), as_double_vec(vec_col).alias("__v")).join(
        assigned, id_col
    )
    a = v.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
    )
    b = v.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            micro6(cosine(F.col("__va"), F.col("__vb"))).alias("cosine_micro"),
        )
        .filter(F.col("cosine_micro") >= int(round(threshold * 1_000_000)))
    )
