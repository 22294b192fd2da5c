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

Adaptive execution: when the deduplicated edge set fits the driver
(default gate 1M edges ≈ 16 MB), a single-pass union-find replaces the
shuffle rounds entirely — the same runtime small-side strategy switch
AQE applies to joins, applied to an iterative algorithm Catalyst can't
see into. The distributed path takes over above the gate.

Per round (distributed path): two groupBy+join passes over the
CANDIDATE PAIR set — orders of magnitude smaller than the corpus (LSH
keeps it near-linear) — never a corpus-scale shuffle. Every round materializes
the edge frame (operators/iterate.py): without it the lineage doubles
per round and the plan blows up by round ~15. Truncation is
executor-local by default; pass `checkpoint_dir` for reliable
checkpointing on fault-exposed multi-executor runs. The convergence
test (edge-set stability) is one (count, hash-sum) aggregate per round;
the exact subtract check runs once, at the detected fixpoint, to rule
out a hash collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_data_pipeline_fyp_spark.operators.iterate import materialize
from gcp_data_pipeline_fyp_spark.queries_util import roundn


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


def _driver_components(nodes: DataFrame, dedup_edges: DataFrame) -> DataFrame:
    """Union-find fast path for candidate-pair graphs that fit the driver.

    Semantics identical to star contraction (component = min reachable
    id). The label frame is tiny (≤ 2·|edges| rows), so the downstream
    join against the corpus broadcasts instead of shuffling it.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in dedup_edges.collect():
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # attach max root under min root: find() then yields the
            # component minimum directly
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    node_rows = [r[0] for r in nodes.collect()]
    labels = [(x, find(x) if x in parent else x) for x in node_rows]
    node_type = nodes.schema[0].dataType
    spark = nodes.sparkSession
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("component", node_type)]
    )
    return spark.createDataFrame(labels, schema)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    `edges` is undirected input (each pair listed once in either
    direction). Star contraction converges in O(log n) rounds
    regardless of diameter; `max_iter` is a safety net far above any
    realistic round count (2^25 nodes of pathological structure), and
    the function raises rather than return a partial closure.

    Adaptive strategy (the AQE pattern, applied where Catalyst can't
    see): LSH/blocking keeps the candidate-pair graph orders of
    magnitude smaller than the corpus, so it often fits the driver even
    when the corpus is 100 TB. Below `driver_threshold` deduplicated
    edges (~16 MB at the default), a single-pass union-find on the
    driver replaces O(log n) shuffle rounds; above it, the distributed
    star contraction runs. Set `driver_threshold=0` to force the
    distributed path.

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
    # per-round fixpoint probe: (count, order-independent hash sum)
    # over the edge set. r13 (guide §2.4, the kmeans Observation trick
    # from r12): the signature rides the SAME action that materializes
    # the round via an `observe` metric — previously each round paid a
    # separate aggregate job (and startup paid a count + an aggregate),
    # i.e. one extra full pass of job latency per round. Observation
    # delivers on localCheckpoint and reliable checkpoint (verified on
    # Spark 4.1.2 in r12). On a signature match the exact subtract
    # check still runs ONCE to rule out a hash collision.
    def _sig_metrics():
        return (
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")
            ).alias("__h"),
        )

    obs0 = Observation()
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .observe(obs0, *_sig_metrics())
    )
    cur = materialize(cur, checkpoint_dir)
    n_edges = obs0.get["__n"]
    if n_edges <= driver_threshold:
        return _driver_components(nodes, cur)
    prev_sig = (obs0.get["__n"], obs0.get["__h"])
    for _ in range(max_iter):
        obs = Observation()
        nxt = materialize(
            _small_star(_large_star(cur)).observe(obs, *_sig_metrics()),
            checkpoint_dir,
        )
        sig = (obs.get["__n"], obs.get["__h"])
        stable = sig == prev_sig and nxt.subtract(cur).limit(1).count() == 0
        cur, prev_sig = nxt, sig
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
    checkpoint_every: int = 3,
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

    Lineage is truncated every `checkpoint_every` iterations (+ the
    final one), not every round: each round adds a fixed 2-join/1-agg
    layer, so a few un-truncated rounds keep the plan shallow while
    skipping most of the per-round materialization jobs. Truncation
    cadence never changes values — only where recomputation boundaries
    fall.
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
    for it in range(iters):
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
                roundn(
                    F.lit(teleport)
                    + damping * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                    14,
                ).alias("rank"),
            )
        )
        if (it + 1) % max(checkpoint_every, 1) == 0 or it == iters - 1:
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
        f"(round((cast({1.0 - damping} AS double) / n.n "
        f"+ cast({damping} AS double) * cast(coalesce(s{i}.s, 0) AS double))"
        f" * 100000000000000.0) / 100000000000000.0) AS rank "
        f"FROM nodes CROSS JOIN n LEFT JOIN s{i} ON nodes.v = s{i}.v)"
    )


def dup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "id_a", dst: str = "id_b",
    checkpoint_dir: str | None = None,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Attach `cluster_id` (transitive closure) to every row of `df`.

    Rows not in any pair get their own id as cluster — so
    `filter(id_col == cluster_id)` keeps exactly one doc per cluster.
    `checkpoint_dir`/`driver_threshold` pass through to
    `connected_components` (reliable checkpointing / forcing the
    distributed closure, see there)."""
    comp = connected_components(
        pairs, src, dst, checkpoint_dir=checkpoint_dir,
        driver_threshold=driver_threshold,
    )
    return df.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col))).drop(
        "component"
    )


def triangle_counts(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle participation over an undirected pair set ->
    (node, n_triangles), nodes in no triangle omitted.

    Triangle density separates tight duplicate cliques from chains of
    borderline matches in the LSH candidate graph: a doc whose
    neighborhood closes into triangles sits in a real near-dup
    cluster; one with many edges but no closures is a hub of spurious
    band collisions.

    Each triangle is enumerated ONCE via the ordered edge list
    (canonicalized a < b, so x < y < z): e1(x,y) ⋈ e2(y,z) ⋈
    e3(x,z). Cost is the open-wedge count Σ deg²(v) over the
    CANDIDATE graph — LSH banding caps degrees, so this never
    approaches n²; the closing join is edge-keyed and co-partitioned
    with the wedge stream."""
    e = _canonical_edges(pairs, src, dst)
    return _triangle_counts_canonical(e)


def _canonical_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def _triangle_counts_canonical(e: DataFrame) -> DataFrame:
    """Triangle enumeration over an ALREADY canonical (a < b,
    deduplicated) edge frame — callers that canonicalized for their
    own joins (clustering_coefficients) skip a second edge-set-wide
    distinct shuffle."""
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri = wedges.join(
        e.alias("e3"),
        (F.col("e3.a") == F.col("x")) & (F.col("e3.b") == F.col("z")),
    ).select("x", "y", "z")
    corners = tri.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def kcore(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded k-core peel -> (node, degree) for nodes surviving
    `rounds` rounds of removing degree < k nodes.

    k-core membership is the densest-region filter over the candidate
    graph (a spam ring's near-dup cluster survives deep cores; chains
    of borderline matches peel away immediately). The round count is
    FIXED, not run-to-convergence: each extra round on a converged
    graph is idempotent (removing nothing changes nothing), and a
    fixed unroll is what makes the operator engine-replayable — the
    oracle runs the identical bounded peel (same pattern as the
    PageRank and k-means fixed-iteration oracles). Each round is one
    degree aggregation + two semi joins over the (shrinking) edge
    list, lineage-truncated per round."""
    from gcp_data_pipeline_fyp_spark.operators.iterate import materialize

    e = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        )
        .distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    F.struct(F.col("y").alias("a"), F.col("x").alias("b")),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
    )
    e = materialize(e, checkpoint_dir)
    for _ in range(rounds):
        keep = (
            e.groupBy("a").agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") >= k)
            .select("a")
        )
        e = (
            e.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
        )
        e = materialize(e, checkpoint_dir)
    return e.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-round synchronous label propagation — community structure
    over the candidate-pair graph (node, community) after `iters`
    rounds.

    Each node starts labeled with its own id; every round it adopts
    the most frequent label among its neighbors plus its own current
    label (the self-vote damps the 2-cycle oscillation plain
    synchronous LPA exhibits on bipartite regions), ties broken by the
    SMALLEST label. Both rules are deterministic, so a single-threaded
    oracle replaying the identical bounded rounds reproduces the exact
    assignment — same certification pattern as the fixed-iteration
    `pagerank` and `kcore`.

    Per round: one edge-sized join + one (node, label)-keyed count +
    one node-keyed max — the argmax label is picked with
    max(struct(count, -label)) (max count, then min label), an
    AGGREGATION, not a row_number window over every candidate row (no
    per-node sort at 100 TB; partial aggregation combines map-side).
    Complements `connected_components` (same closure for k=inf) by
    splitting weakly-bridged near-dup families instead of chaining
    them into one cluster.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = materialize(
        und.select(F.col("a").alias("v")).distinct(), checkpoint_dir
    ).withColumn("lbl", F.col("v"))
    for it in range(iters):
        contrib = (
            und.join(labels, und.a == labels.v)
            .select(F.col("b").alias("v"), F.col("lbl"))
            .unionByName(labels.select("v", "lbl"))
        )
        counts = contrib.groupBy("v", "lbl").agg(F.count("*").alias("c"))
        labels = counts.groupBy("v").agg(
            F.max(
                F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
            ).alias("m")
        ).select("v", (-F.col("m.nl")).alias("lbl"))
        if (it + 1) % max(checkpoint_every, 1) == 0 or it == iters - 1:
            labels = materialize(labels, checkpoint_dir)
    und.unpersist()
    return labels.select(F.col("v").alias("node"), F.col("lbl").alias("community"))


def label_propagation_iteration_sql(iters_done: int) -> str:
    """One DuckDB CTE pair mirroring a `label_propagation` round
    (oracle helper): the same count + (c DESC, lbl ASC) argmax."""
    i = iters_done
    return (
        f"c{i} AS (SELECT v, lbl, count(*) AS c FROM ("
        f"SELECT e0.b AS v, l{i - 1}.lbl FROM e0 JOIN l{i - 1} "
        f"ON e0.a = l{i - 1}.v "
        f"UNION ALL SELECT v, lbl FROM l{i - 1}) u GROUP BY v, lbl), "
        f"l{i} AS (SELECT v, lbl FROM ("
        f"SELECT v, lbl, row_number() OVER (PARTITION BY v "
        f"ORDER BY c DESC, lbl ASC) AS rn FROM c{i}) s WHERE rn = 1)"
    )


def clustering_coefficients(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node local clustering coefficient over an undirected pair
    set -> (node, degree, n_triangles, cc_micro) for nodes of degree
    >= 2; cc = 2T / (deg * (deg - 1)) in micro-units.

    The normalized form of `triangle_counts`: a coefficient near 1 is
    a clique member (true near-dup family), near 0 a hub of spurious
    band collisions — the per-node score a curation pass thresholds
    on. Costs one degree aggregation on top of the triangle
    enumeration; the join of the two is node-keyed."""
    e = _canonical_edges(pairs, src, dst)
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # e is already canonical — skip triangle_counts' re-canonicalizing
    # distinct over the edge set
    tri = _triangle_counts_canonical(e)
    from gcp_data_pipeline_fyp_spark.queries_util import micro6

    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            micro6(
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("cc_micro"),
        )
    )


# -------------------------------------------- incremental components
def build_components_index(
    wh,
    pairs: DataFrame,
    name: str,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_dir: str | None = None,
    driver_threshold: int = 1_000_000,
) -> None:
    """Materialize the transitive closure of `pairs` as a warehouse
    table `{name}__components` (node, component) — the build-once half
    of INCREMENTAL clustering (same persisted-index pattern as the
    digest/band/IVF indexes)."""
    comp = connected_components(
        pairs, src, dst,
        checkpoint_dir=checkpoint_dir,
        driver_threshold=driver_threshold,
    )
    wh.overwrite(comp, f"{name}__components")


def incremental_components(
    wh,
    new_pairs: DataFrame,
    name: str,
    src: str = "id_a",
    dst: str = "id_b",
    update_index: bool = True,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Fold a batch of new candidate pairs into the persisted
    components WITHOUT re-closing the historical pair graph.

    Correctness: a (node -> component) labeling IS a spanning star of
    each historical cluster, and connected components are invariant
    under replacing a cluster's edges with any spanning structure —
    so closing (star edges) ∪ (new pairs) yields exactly the closure
    of (all historical pairs) ∪ (new pairs). The recompute input is
    |nodes| + |batch pairs| edges, never the full historical EDGE set
    — at 100 TB the daily near-dup batch folds in at index size, the
    original corpus-scale candidate graph is never re-read. Labels
    stay canonical (component = min reachable node id), so merging
    two old clusters relabels the larger-rooted one, the same result
    a full recompute would produce.

    Returns the updated (node, component) frame; with `update_index`
    it also replaces `{name}__components`. Same cold-start contract
    as the band index: a missing/empty index table is an empty graph.
    """
    table = f"{name}__components"
    np_edges = new_pairs.select(
        F.col(src).alias("id_a"), F.col(dst).alias("id_b")
    )
    try:
        old = wh.read(table).select(
            F.col("node").alias("id_a"), F.col("component").alias("id_b")
        )
    except Exception:
        old = np_edges.limit(0)
    merged = connected_components(
        old.unionByName(np_edges), "id_a", "id_b",
        checkpoint_dir=checkpoint_dir,
        driver_threshold=driver_threshold,
    )
    if update_index:
        # lineage break only where it is needed: the overwrite
        # replaces the very files `old` was read from
        merged = merged.localCheckpoint()
        wh.overwrite(merged, table)
    return merged
