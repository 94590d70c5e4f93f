"""Betweenness centrality — Brandes dependency accumulation, multi-source.

Reference: ``cpp/centrality/Betweenness.cpp`` (exact Brandes: one SSSP +
backward dependency pass per source), ``ApproxBetweenness.cpp`` /
``EstimateBetweenness.cpp`` (sampled sources / sampled paths).

Distributed Brandes (unweighted), all sources advancing together:

Forward (level-synchronous BFS carrying path counts):
  state (source, node, dist, sigma); frontier level h -> h+1:
  ``sigma(s, v) = sum over predecessors u at level h of sigma(s, u)``.

Backward (descending levels):
  ``delta(s, u) = sum over successors v of sigma_u/sigma_v * (1 + delta_v)``
  accumulated per level; betweenness(v) = sum over sources s != v of
  delta(s, v). No undirected halving — NetworKit counts ordered pairs
  (Betweenness.cpp), so undirected raw scores are 2x networkx's.

Exact when sources = all nodes (O(n*m) — small graphs, the test oracle);
``EstimateBetweenness``-style sampling scales: score ~= (n / k) * sampled
sum. Levels iterate on the driver; every level is one join + agg keyed
(source, node) — the standard Pregel Brandes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import truncate_lineage


def _forward(edges: DataFrame, sources: DataFrame, max_depth: int):
    """(source, node, dist, sigma) levels via BFS with path counting."""
    state = sources.select(
        F.col("id").alias("source"),
        F.col("id").alias("node"),
        F.lit(0).cast("long").alias("dist"),
        F.lit(1.0).alias("sigma"),
    )
    state = truncate_lineage(state)
    frontier = state
    depth = 0
    while depth < max_depth:
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", "src"), "src"
            )
            .select("source", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"), "sigma")
            .groupBy("source", "node", "dist")
            .agg(F.sum("sigma").alias("sigma"))
            .join(state.select("source", "node"), ["source", "node"], "left_anti")
        )
        nxt = truncate_lineage(nxt)
        if nxt.isEmpty():
            break
        state = truncate_lineage(state.unionByName(nxt))
        frontier = nxt
        depth += 1
    return state, depth


def source_dependencies(
    e: DataFrame, src: DataFrame, max_depth: int = 10_000
) -> tuple[DataFrame, DataFrame]:
    """Full Brandes pass for the given sources: returns
    ``(bfs(source, node, dist, sigma), delta(source, node, delta))``.
    The per-source split is what makes incremental recompute possible
    (``streaming/dyn_centrality.py``): each source's dependency table is
    independent, so an edge event only invalidates the affected sources."""
    bfs, depth = _forward(e, src, max_depth)
    bfs = bfs.persist()
    bfs.count()

    # backward accumulation, level by level (descending)
    delta = bfs.select("source", "node", F.lit(0.0).alias("delta"))
    delta = truncate_lineage(delta)
    for level in range(depth, 0, -1):
        lower = bfs.filter(F.col("dist") == level).join(
            delta, ["source", "node"]
        ).select("source", "node", "sigma", "delta")
        # contribution flows from node v (dist == level) to predecessor u
        # (dist == level-1) along edge u -> v
        contrib = (
            e.join(lower.withColumnRenamed("node", "dst"), "dst")
            .select(
                "source",
                F.col("src").alias("node"),
                (F.col("delta") + 1.0).alias("dv1"),
                F.col("sigma").alias("sigma_v"),
            )
            .join(
                bfs.filter(F.col("dist") == level - 1).select(
                    "source", "node", F.col("sigma").alias("sigma_u")
                ),
                ["source", "node"],
            )
            .groupBy("source", "node")
            .agg(F.sum(F.col("sigma_u") / F.col("sigma_v") * F.col("dv1")).alias("add"))
        )
        delta = truncate_lineage(
            delta.join(contrib, ["source", "node"], "left")
            .select(
                "source",
                "node",
                (F.col("delta") + F.coalesce(F.col("add"), F.lit(0.0))).alias("delta"),
            )
        )
    bfs.unpersist()
    return bfs, delta


def betweenness(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    sources: DataFrame | None = None,
    normalized: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """(node, score). ``edges`` as stored (symmetrized for undirected).

    Exact with sources=None; sampled (EstimateBetweenness semantics:
    scaled by n/k) otherwise. Raw scores match NetworKit's ordered-pair
    convention (no undirected halving).
    """
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    n = nodes.count()
    src = sources if sources is not None else nodes
    k = src.count()
    e = edges.select("src", "dst").persist()
    e.count()

    _, delta = source_dependencies(e, src, max_depth)
    scores = (
        delta.filter(F.col("source") != F.col("node"))
        .groupBy("node")
        .agg(F.sum("delta").alias("score"))
    )
    scale = 1.0
    if sources is not None:
        scale *= n / k
    if normalized:
        # divide by the possible ORDERED pair count (n-1)(n-2) —
        # Betweenness.cpp:86-91. NetworKit never halves undirected raw
        # scores (each unordered pair contributes from both endpoints, so
        # undirected raw values are 2x the networkx convention); we match
        # the reference exactly.
        denom = (n - 1) * (n - 2)
        scale /= denom if denom else 1.0
    out = scores.select("node", (F.col("score") * scale).alias("score"))
    e.unpersist()
    return (
        nodes.select(F.col("id").alias("node"))
        .join(out, "node", "left")
        .fillna({"score": 0.0})
    )


def estimate_betweenness(
    edges: DataFrame,
    n_samples: int,
    nodes: DataFrame | None = None,
    normalized: bool = False,
    seed: int = 42,
) -> DataFrame:
    """``EstimateBetweenness.cpp``: Brandes over ``n_samples`` sampled
    source pivots, scores scaled by n/#samples — a named front door over
    :func:`betweenness`'s sampled path. Pivot choice is the portable seeded
    draw (sample s -> node md5-draw(s) % n), so reruns and engines agree."""
    from networkit_spark.graph import nodes_from_edges
    from networkit_spark.operators.sampling import _draw

    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    n = nodes.count()
    spark = edges.sparkSession
    src = (
        spark.range(n_samples)
        .select((_draw("estbc", seed, F.col("id")) % n).alias("id"))
        .distinct()
    )
    return betweenness(edges, nodes, sources=src, normalized=normalized)
