"""Connected components over candidate-pair edges (dup-cluster closure).

Near-dup detection (LSH, SimHash, embedding blocking) emits PAIRS; the
set a trainer actually needs is CLUSTERS — the transitive closure, so
a chain A~B~C collapses to one kept document instead of whichever
pairs the greedy pass happened to see. This is iterative min-label
propagation:

    label(v) <- min(label(v), min over neighbors label(u))

repeated to fixpoint. Iteration count is the graph diameter, and the
input is the CANDIDATE PAIR set — orders of magnitude smaller than the
corpus (LSH keeps it near-linear) — so each iteration is a small
self-join, not a corpus-scale shuffle. Every iteration localCheckpoints
the label frame: without it the self-join lineage doubles per round
and the plan blows up by iteration ~15.

The driver-side fixpoint test (`changed == 0`) is a scalar per
iteration — the same pattern as the A4 MAX snapshot, not a
`.collect()` of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    `edges` is undirected input (each pair listed once in either
    direction). Raises if the fixpoint is not reached in `max_iter`
    rounds (diameter larger than expected — raise the cap).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.persist()
    labels = (
        und.select(F.col("a").alias("v")).distinct().withColumn("lbl", F.col("v"))
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.b == labels.v)
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels.v == nbr_min.a, "left")
            .select(
                "v",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            und.unpersist()
            return labels.select(
                F.col("v").alias("node"), F.col("lbl").alias("component")
            )
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list.

    (node, rank) after `iters` rounds of
    r(v) <- (1-d)/N + d * sum_{u~v} r(u)/deg(u), r0 = 1/N.

    Each iteration is one edge-sized join + one node-keyed aggregation.
    Contribution sums go through exact decimal so the result is
    partial-aggregation-order independent (identical bytes on any
    cluster layout — and to a single-threaded oracle running the same
    algebra). Ranks carry 14 dp between iterations; round to 6 for
    display. N is one driver-side scalar (the A4 snapshot pattern).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("__deg"))
    ed = und.join(deg, "a").persist()
    nodes = und.select(F.col("a").alias("v")).distinct().localCheckpoint()
    n = nodes.count()
    base = 1.0 / n
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(base))
    for _ in range(iters):
        sums = (
            ed.join(ranks, ed.a == ranks.v)
            .select(
                F.col("b"),
                (F.col("rank") / F.col("__deg"))
                .cast("decimal(28,14)")
                .alias("__c"),
            )
            .groupBy("b")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(sums, nodes.v == sums.b, "left")
            .select(
                "v",
                F.round(
                    F.lit(teleport)
                    + damping * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                    14,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    und.unpersist()
    ed.unpersist()
    return ranks.select(F.col("v").alias("node"), "rank")


def pagerank_iteration_sql(
    prev: str, iters_done: int, damping: float = 0.85
) -> str:
    """One DuckDB CTE pair mirroring a `pagerank` iteration (oracle helper)."""
    i = iters_done
    return (
        f"s{i} AS (SELECT ed.b AS v, "
        f"sum(cast(r{i - 1}.rank / ed.deg AS decimal(28,14))) AS s "
        f"FROM ed JOIN r{i - 1} ON ed.a = r{i - 1}.v GROUP BY ed.b), "
        f"r{i} AS (SELECT nodes.v, "
        f"round(cast({1.0 - damping} AS double) / n.n "
        f"+ cast({damping} AS double) * cast(coalesce(s{i}.s, 0) AS double), 14)"
        f" AS rank "
        f"FROM nodes CROSS JOIN n LEFT JOIN s{i} ON nodes.v = s{i}.v)"
    )


def dup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Attach `cluster_id` (transitive closure) to every row of `df`.

    Rows not in any pair get their own id as cluster — so
    `filter(id_col == cluster_id)` keeps exactly one doc per cluster.
    """
    comp = connected_components(pairs, src, dst)
    return df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col))).drop(
        "component"
    )
