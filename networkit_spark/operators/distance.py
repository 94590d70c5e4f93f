"""Distances: BFS / SSSP (Dijkstra-equivalent), multi-source, diameter bounds.

Reference: ``cpp/distance/BFS.cpp:17`` (level-synchronous queue BFS),
``Dijkstra.cpp:19`` (heap), ``APSP.cpp`` (n x SSSP), ``Diameter.cpp:22-32``
(exact + iFub estimate), ``Eccentricity.cpp``. Python
``networkit/distance.pyx`` (SSSP base :171, BFS :45ff).

Distributed form: **frontier relaxation rounds** (delta/Bellman-Ford style):

    dist(u) <- min(dist(u), min_{v->u} dist(v) + w(v,u))

- Unweighted BFS: the frontier is exactly the newly-settled level, so each
  round shuffles only frontier-adjacent edges (semi-join on the frontier) —
  the classic Pregel BFS; #rounds = eccentricity of the source.
- Weighted (Dijkstra equivalent): same relaxation but a settled distance can
  improve; rounds continue until no improvement (Bellman-Ford convergence;
  correct for non-negative weights, and for negative edges too as long as
  no negative cycle — strictly more general than Dijkstra).
- Multi-source: a ``source`` column rides along (dist table keyed by
  (source, node)) — n_sources BFS's in one job, the idiomatic Spark answer
  to the reference's per-source loops (APSP/closeness/eccentricity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges


_BROADCAST_FRONTIER_MAX = 1_000_000


def _persist_by_src(edges: DataFrame, *cols: str) -> DataFrame:
    """Loop-invariant edge table pre-partitioned on the per-round join key
    (the PageRank contrib recipe): the frontier join reuses the persisted
    partitioning, so the m-row edge table never re-shuffles or re-sorts."""
    spark = edges.sparkSession
    shuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return edges.select(*cols).repartition(shuf, "src").persist()


def _expand(e: DataFrame, frontier: DataFrame, cnt: int | None):
    """Frontier expansion join with the scale-right strategy: BROADCAST the
    frontier while its row count is known small (no exchange of anything
    but the tiny frontier), shuffle-hash against the pre-partitioned edge
    table otherwise (only the frontier shuffles)."""
    f = frontier.withColumnRenamed("node", "src")
    if cnt is not None and cnt < _BROADCAST_FRONTIER_MAX:
        f = F.broadcast(f)
    else:
        f = f.hint("shuffle_hash")
    return e.join(f, "src")


def bfs_distances(
    edges: DataFrame,
    source: int,
    nodes: DataFrame | None = None,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(node, dist) hop counts from source; unreached nodes omitted.
    Ref: ``BFS.cpp:17`` semantics (follows out-edges as stored; symmetrize
    for undirected)."""
    spark = edges.sparkSession
    e = _persist_by_src(edges, "src", "dst")
    e.count()
    dist = spark.createDataFrame([(source, 0)], "node long, dist long")
    frontier = dist
    cnt = 1
    for _ in range(max_rounds):
        nxt = (
            _expand(e, frontier, cnt)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .join(dist.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        cnt = nxt.count()
        if cnt == 0:
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e.unpersist()
    return dist


def sssp_distances(
    edges: DataFrame,
    source: int,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Weighted single-source shortest paths by relaxation rounds
    (Dijkstra-equivalent results for non-negative weights; ``Dijkstra.cpp:19``)."""
    spark = edges.sparkSession
    e = _persist_by_src(edges, "src", "dst", "weight")
    e.count()
    dist = spark.createDataFrame([(source, 0.0)], "node long, dist double")
    frontier = dist
    cnt = 1
    for _ in range(max_rounds):
        cand = (
            _expand(e, frontier, cnt)
            .select(
                F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("nd")
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("dist"),
                F.col("dist").alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).select("node", "dist")
        dist = merged.select("node", "dist")
        cnt = frontier.count()
        if cnt == 0:
            break
    e.unpersist()
    return dist


def multi_source_bfs(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(source, node, dist) for every source in ``sources(id)`` at once."""
    e = _persist_by_src(edges, "src", "dst")
    e.count()
    dist = sources.select(
        F.col("id").alias("source"), F.col("id").alias("node"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    cnt = dist.count()
    for _ in range(max_rounds):
        nxt = (
            _expand(e, frontier, cnt)
            .select("source", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
            .join(dist.select("source", "node"), ["source", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        cnt = nxt.count()
        if cnt == 0:
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e.unpersist()
    return dist


def eccentricity(edges: DataFrame, source: int) -> tuple[int, int]:
    """(farthest_node, ecc). Ref: ``Eccentricity.cpp`` getValue."""
    d = bfs_distances(edges, source)
    row = d.orderBy(F.desc("dist"), F.asc("node")).first()
    return int(row["node"]), int(row["dist"])


def diameter_double_sweep(edges: DataFrame, start: int = 0) -> int:
    """Lower bound on diameter by double-sweep BFS (the standard iFub seed,
    ``Diameter.cpp`` estimatedRange's building block)."""
    far, _ = eccentricity(edges, start)
    _, ecc = eccentricity(edges, far)
    return ecc


def diameter_ifub(edges: DataFrame, nodes: DataFrame | None = None) -> int:
    """Exact diameter via iFub (``Diameter.cpp:22-32`` / the
    Crescenzi-Grossi-... iterative fringe upper bound — published algorithm),
    level-batched for Spark: instead of one eccentricity per step, each
    outer round computes eccentricities of the ENTIRE current BFS fringe in
    one multi-source BFS.

    1. root = max-degree node; BFS from root gives levels and ecc(root).
    2. lb = ecc(root); i = ecc(root); while 2*i > lb: eccs of all nodes at
       level i via MS-BFS -> lb = max(lb, ...); i -= 1. When 2*i <= lb the
       remaining levels cannot beat lb -> diameter = lb exactly (iFub
       invariant: any node at level <= i has ecc <= 2*i).

    Connected input assumed (raises otherwise like the reference's exact
    mode). On small-world graphs iFub terminates after 1-3 fringe batches.
    """
    deg = edges.groupBy("src").count()
    root = int(deg.orderBy(F.desc("count"), F.asc("src")).first()["src"])
    d = bfs_distances(edges, root)
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    if d.count() != nodes.count():
        raise ValueError("diameter_ifub: graph not connected")
    ecc_root = int(d.agg(F.max("dist")).first()[0])
    lb = ecc_root
    i = ecc_root
    while 2 * i > lb and i > 0:
        fringe = d.filter(F.col("dist") == i).select(F.col("node").alias("id"))
        if not fringe.isEmpty():
            eccs = (
                multi_source_bfs(edges, fringe)
                .groupBy("source")
                .agg(F.max("dist").alias("ecc"))
            )
            lb = max(lb, int(eccs.agg(F.max("ecc")).first()[0]))
        i -= 1
    return lb


def bfs_fixed(edges: DataFrame, nodes: DataFrame, source: int, rounds: int) -> DataFrame:
    """Fixed-round min-dist propagation (oracle-expressible): after r rounds,
    dist = BFS level for all nodes within r hops, NULL-free total table with
    unreached = -1 (so schemas stay stable)."""
    big = F.lit(1 << 40)
    dist = nodes.select(
        F.col("id").alias("node"),
        F.when(F.col("id") == source, F.lit(0)).otherwise(big).alias("dist"),
    )
    e = edges.select("src", "dst")
    for _ in range(rounds):
        cand = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        dist = (
            dist.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("dist"), F.coalesce(F.col("nd"), F.col("dist"))).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
    return dist.select(
        "node", F.when(F.col("dist") >= big, F.lit(-1)).otherwise(F.col("dist")).cast("long").alias("dist")
    )


def bidirectional_bfs(
    edges: DataFrame,
    source: int,
    target: int,
    max_rounds: int = 10_000,
) -> int:
    """Shortest s-t hop distance by meet-in-the-middle expansion; -1 if
    unreachable. Reference: ``cpp/distance/BidirectionalBFS.cpp`` — expand
    the smaller frontier (forward on out-edges, backward on in-edges) until
    the settled balls intersect.

    Each superstep touches only the chosen frontier's incident edges —
    O(sqrt) of the work of a full BFS on expander-like web graphs, same
    join shape as :func:`bfs_distances`.
    """
    if source == target:
        return 0
    spark = edges.sparkSession
    e = edges.select("src", "dst").persist()
    e.count()
    te = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = spark.createDataFrame([(source, 0)], "node long, dist int").localCheckpoint(eager=True)
    bwd = spark.createDataFrame([(target, 0)], "node long, dist int").localCheckpoint(eager=True)
    f_front, b_front = fwd, bwd
    f_sz = b_sz = 1
    best = None
    for _ in range(max_rounds):
        grow_fwd = f_sz <= b_sz
        tab, front, ball = (e, f_front, fwd) if grow_fwd else (te, b_front, bwd)
        nxt = (
            tab.join(front.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .join(ball.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_new = nxt.count()
        if n_new == 0:
            e.unpersist()
            return -1 if best is None else best
        other = bwd if grow_fwd else fwd
        meet = (
            nxt.join(other.withColumnRenamed("dist", "odist"), "node")
            .agg(F.min(F.col("dist") + F.col("odist")).alias("m"))
            .first()["m"]
        )
        if grow_fwd:
            fwd, f_front, f_sz = fwd.union(nxt).localCheckpoint(eager=True), nxt, n_new
        else:
            bwd, b_front, b_sz = bwd.union(nxt).localCheckpoint(eager=True), nxt, n_new
        if meet is not None:
            # settled distances are exact, so any s-t path of length
            # < meet would contain a node inside BOTH balls with a smaller
            # df+db — it would already be this round's meet. Final.
            best = int(meet) if best is None else min(best, int(meet))
            e.unpersist()
            return best
    e.unpersist()
    return -1 if best is None else best


def apsp(edges: DataFrame, nodes: DataFrame, max_rounds: int = 10_000) -> DataFrame:
    """All-pairs hop distances (source, node, dist) — n simultaneous BFS
    waves (``cpp/distance/APSP.cpp:18`` runs n SSSPs; here they share every
    superstep). Output is the intrinsic O(n^2) pair table: meant for the
    small/medium graphs the reference targets with APSP."""
    return multi_source_bfs(edges, nodes, max_rounds)


def spsp(
    edges: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Some-pairs shortest paths (``cpp/distance/SPSP.cpp``): hop distances
    (source, node, dist) restricted to the requested target set."""
    d = multi_source_bfs(edges, sources, max_rounds)
    return d.join(targets.select(F.col("id").alias("node")), "node").select(
        "source", "node", "dist"
    )


def multi_target_dijkstra(
    edges: DataFrame, source: int, targets: list[int], max_rounds: int = 10_000
) -> DataFrame:
    """MultiTargetDijkstra / STSP semantics (``distance.pyx`` STSP family):
    weighted distances from ``source`` restricted to ``targets``. The full
    relaxation wave is the distributed plan either way (no priority queue to
    stop early on); the target filter prunes the result, and Catalyst pushes
    it into the final exchange."""
    spark = edges.sparkSession
    t = spark.createDataFrame([(int(x),) for x in targets], "node long")
    return sssp_distances(edges, source, max_rounds).join(t, "node", "left_semi")


def astar_distance(
    edges: DataFrame,
    heuristic: DataFrame,
    source: int,
    target: int,
    max_rounds: int = 10_000,
) -> tuple[float, DataFrame]:
    """A* source->target distance (``AStar.hpp`` / ``AStarGeneral.hpp``):
    ``heuristic(node, h)`` is an admissible lower bound on each node's
    distance to ``target``. Returns (distance, settled-distances table).

    Spark plan: the priority queue has no distributed analog, so the goal
    direction becomes *frontier pruning* on the same relaxation wave as
    :func:`sssp_distances` — a tentative label expands only while
    ``dist + h < best known target distance`` (admissibility makes the
    pruned labels provably useless, so results stay exact). With h = 0 this
    degrades to plain distributed Dijkstra; a tighter h cuts the frontier —
    the same work-saving the sequential queue realizes."""
    import math

    spark = edges.sparkSession
    e = edges.select("src", "dst", "weight").persist()
    e.count()
    heu = heuristic.select("node", "h").persist()
    dist = spark.createDataFrame([(source, 0.0)], "node long, dist double")
    frontier = dist
    best = 0.0 if source == target else math.inf
    for _ in range(max_rounds):
        live = frontier.join(heu, "node", "left").filter(
            F.col("dist") + F.coalesce(F.col("h"), F.lit(0.0)) < F.lit(best)
        ).select("node", "dist")
        if live.isEmpty():
            break
        cand = (
            e.join(live.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("nd")
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("dist"),
                F.col("dist").alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).select("node", "dist")
        dist = merged.select("node", "dist")
        hit = dist.filter(F.col("node") == target).first()
        if hit is not None:
            best = min(best, hit["dist"])
    e.unpersist()
    heu.unpersist()
    return best, dist
