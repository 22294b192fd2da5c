"""Connected components over candidate-pair edges (dup-cluster closure).

Near-dup detection (LSH, SimHash, embedding blocking) emits PAIRS; the
set a trainer actually needs is CLUSTERS — the transitive closure, so
a chain A~B~C collapses to one kept document instead of whichever
pairs the greedy pass happened to see.

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14). Each
round rewrites the edge set so nodes point closer to their component
minimum; the fixpoint is a forest of stars rooted at each component's
min id. Round count is O(log n) in practice (O(log^2 n) worst case) —
crucially INDEPENDENT of graph diameter, unlike naive min-label
propagation whose round count tracks the longest chain. On a 100 TB
web-dup graph, near-dup chains (mirrors of mirrors, template families)
routinely produce diameters in the hundreds; diameter-bound iteration
is the classic scale killer, star contraction is the published fix.

Per round: two groupBy+join passes over the CANDIDATE PAIR set —
orders of magnitude smaller than the corpus (LSH keeps it
near-linear) — never a corpus-scale shuffle. Every round materializes
the edge frame (operators/iterate.py): without it the lineage doubles
per round and the plan blows up by round ~15. Truncation is
executor-local by default; pass `checkpoint_dir` for reliable
checkpointing on fault-exposed multi-executor runs. The convergence
test (edge-set stability) is two small probe jobs per round, not a
`.collect()` of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.operators.iterate import materialize


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    `e` holds one row per undirected edge; output rows are (x, y) with
    x > y (larger endpoint first), self-loops dropped.
    """
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("m")
    )
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and u itself) to min(N⁻(u) ∪ {u}).

    Orients each edge larger→smaller first, so the grouped neighbors of
    u are exactly the smaller ones. Output rows are (x, y) with x > y.
    """
    oriented = e.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    `edges` is undirected input (each pair listed once in either
    direction). Star contraction converges in O(log n) rounds
    regardless of diameter; `max_iter` is a safety net far above any
    realistic round count (2^25 nodes of pathological structure), and
    the function raises rather than return a partial closure.

    `checkpoint_dir`: per-round lineage truncation is executor-local by
    default (fast; right for local mode) — pass a reliable directory for
    fault-tolerant multi-executor runs (operators/iterate.py, DEPLOY.md).
    """
    # all endpoint nodes, BEFORE self-loops drop: a node whose only
    # edge is a self-loop is a singleton component and must still
    # appear in the output (parity with min-label propagation, which
    # labeled every endpoint)
    nodes = materialize(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    cur = materialize(cur, checkpoint_dir)
    for _ in range(max_iter):
        nxt = materialize(_small_star(_large_star(cur)), checkpoint_dir)
        stable = (
            nxt.count() == cur.count()
            and nxt.subtract(cur).limit(1).count() == 0
        )
        cur = nxt
        if stable:
            # fixpoint is a star forest: u = child, v = component root
            children = cur.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            singletons = nodes.join(
                cur.select(F.col("u").alias("node")), "node", "left_anti"
            ).withColumn("component", F.col("node"))
            return children.union(singletons)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
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
    nodes = materialize(
        und.select(F.col("a").alias("v")).distinct(), checkpoint_dir
    )
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
        )
        ranks = materialize(ranks, checkpoint_dir)
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
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "id_a", dst: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Attach `cluster_id` (transitive closure) to every row of `df`.

    Rows not in any pair get their own id as cluster — so
    `filter(id_col == cluster_id)` keeps exactly one doc per cluster.
    """
    comp = connected_components(pairs, src, dst, checkpoint_dir=checkpoint_dir)
    return df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col))).drop(
        "component"
    )
