"""Dynamic (event-driven) centrality: incremental updates without full
recompute.

Reference family: ``cpp/centrality/DynBetweenness.cpp`` (update shortest
paths + dependencies only where an inserted edge changed distances),
``DynKatzCentrality.cpp`` (iterative bound refresh after events),
``DynTopHarmonicCloseness.cpp``. The reference updates in-memory arrays per
single event; the Spark-first shape is batch-incremental: apply a batch of
events, invalidate only the state the batch can affect, recompute that
slice with the same distributed kernels, and reuse everything else.

Two exact strategies:

- **Affected-source recompute** (betweenness): sampled/exact Brandes keeps
  per-source dependency tables (``operators/betweenness.source_dependencies``).
  An inserted edge (u, v) changes source s's DAG iff it creates a shorter
  or new path: ``dist_s(u) + 1 <= dist_s(v)`` (or v unreached while u is).
  One join of the event batch against the stored distance table finds the
  affected sources; only those re-run Brandes, the rest keep their deltas.
  Same contract as the reference's affected-pair pruning
  (DynBetweenness.cpp), lifted to source granularity for batching.

- **Warm-start fixed point** (Katz, PageRank): the fixed point is unique,
  so iterate from the previous solution on the updated graph; a local
  event batch leaves most coordinates near-converged and the iteration
  count drops from O(full) to O(change). (DynKatzCentrality semantics —
  scores after update match a from-scratch run within tol.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.operators.betweenness import source_dependencies
from networkit_spark.plans.iteration import truncate_lineage


@dataclass
class BetweennessState:
    """Persistent incremental state: the edge table plus per-source BFS
    distances/sigma and dependency tables."""

    edges: DataFrame  # (src, dst) as traversed (symmetrized if undirected)
    sources: DataFrame  # (id)
    bfs: DataFrame  # (source, node, dist, sigma)
    delta: DataFrame  # (source, node, delta)
    n: int
    k: int


def betweenness_init(
    edges: DataFrame, nodes: DataFrame, sources: DataFrame, max_depth: int = 10_000
) -> BetweennessState:
    e = edges.select("src", "dst")
    bfs, delta = source_dependencies(e, sources, max_depth)
    return BetweennessState(
        edges=e, sources=sources, bfs=bfs, delta=delta,
        n=nodes.count(), k=sources.count(),
    )


def betweenness_scores(state: BetweennessState, normalized: bool = False) -> DataFrame:
    """(node, score) from the current per-source dependency tables —
    EstimateBetweenness scaling n/k; ordered-pair convention."""
    scores = (
        state.delta.filter(F.col("source") != F.col("node"))
        .groupBy("node")
        .agg(F.sum("delta").alias("score"))
    )
    scale = state.n / state.k if state.k else 1.0
    if normalized:
        denom = (state.n - 1) * (state.n - 2)
        scale /= denom if denom else 1.0
    return scores.select("node", (F.col("score") * scale).alias("score"))


def betweenness_update(
    state: BetweennessState, new_edges: DataFrame, max_depth: int = 10_000
) -> tuple[BetweennessState, int]:
    """Apply an edge-insertion batch; recompute only affected sources.

    Affected test (exact): source s is affected by inserted edge (u, v)
    iff s reaches u and (``dist_s(u) + 1 <= dist_s(v)`` or v unreached) —
    i.e. the edge creates an equal-length (sigma changes), shorter (dist
    changes), or first (reachability changes) path. For undirected graphs
    pass both directions in ``new_edges``. Returns (new_state,
    number_of_affected_sources).
    """
    # re-adding an existing edge is a no-op on a simple graph: only
    # genuinely-new edges enter the affected test
    add = (
        new_edges.select("src", "dst")
        .distinct()
        .join(state.edges, ["src", "dst"], "left_anti")
    )
    edges2 = state.edges.unionByName(add).distinct()
    edges2 = truncate_lineage(edges2)
    du = state.bfs.select(
        "source", F.col("node").alias("src"), F.col("dist").alias("du")
    )
    dv = state.bfs.select(
        "source", F.col("node").alias("dst"), F.col("dist").alias("dv")
    )
    affected = (
        add.join(du, "src")  # s must reach u
        .join(dv, ["source", "dst"], "left")
        .filter(F.col("dv").isNull() | (F.col("du") + 1 <= F.col("dv")))
        .select("source")
        .distinct()
    )
    aff_rows = affected.collect()
    n_aff = len(aff_rows)
    if n_aff == 0:
        return (
            BetweennessState(edges2, state.sources, state.bfs, state.delta,
                             state.n, state.k),
            0,
        )
    aff_df = affected.select(F.col("source").alias("id"))
    bfs_new, delta_new = source_dependencies(edges2, aff_df, max_depth)
    keep_bfs = state.bfs.join(affected, "source", "left_anti")
    keep_delta = state.delta.join(affected, "source", "left_anti")
    return (
        BetweennessState(
            edges2, state.sources,
            truncate_lineage(keep_bfs.unionByName(bfs_new)),
            truncate_lineage(keep_delta.unionByName(delta_new)),
            state.n, state.k,
        ),
        n_aff,
    )


@dataclass
class KatzState:
    """Raw (pre-normalization) Katz fixed-point state + normalized view."""

    scores: DataFrame  # (node, score) L2-normalized — reference convention
    raw: DataFrame  # (node, raw) fixed-point values: the warm-start state
    iterations: int


def katz_warm(
    edges: DataFrame,
    prev: KatzState | None = None,
    alpha: float | None = None,
    beta: float = 1.0,
    tol: float = 1e-9,
    max_iterations: int = 500,
) -> KatzState:
    """Incremental Katz (DynKatzCentrality semantics: post-event scores
    match a from-scratch run within tol). Same recursion as
    ``operators/centrality.katz_centrality`` (KatzCentrality.cpp gather
    ``score'(v) = beta + sum_{u->v} w * alpha * (1 + score(u))``, final L2
    normalization); the affine map is a contraction for
    ``alpha < 1/(1 + maxdeg)``, so its fixed point is unique and iterating
    from the PREVIOUS raw state after an event batch converges in
    O(locality) supersteps instead of a cold start. ``prev=None`` cold-
    starts (initializing the dyn state); new nodes start at beta.
    Convergence: max per-node |delta| <= tol on the raw values."""
    e = edges.select("src", "dst", "weight").persist()
    e.count()
    if alpha is None:
        maxdeg = e.groupBy("src").count().agg(F.max("count")).first()[0] or 0
        alpha = 1.0 / (1.0 + maxdeg)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if prev is None:
        x = nodes.select("node", F.lit(beta).alias("raw"))
    else:
        x = nodes.join(prev.raw, "node", "left").select(
            "node", F.coalesce("raw", F.lit(beta)).alias("raw")
        )
    x = truncate_lineage(x)
    its = 0
    for _ in range(max_iterations):
        msgs = (
            e.join(x.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("weight") * F.lit(alpha) * (1.0 + F.col("raw"))).alias("m"))
        )
        x2 = truncate_lineage(
            nodes.join(msgs, "node", "left")
            .select(
                "node",
                (F.coalesce("m", F.lit(0.0)) + F.lit(beta)).alias("raw"),
            )
        )
        diff = (
            x.withColumnRenamed("raw", "old")
            .join(x2, "node")
            .agg(F.max(F.abs(F.col("raw") - F.col("old"))))
            .first()[0]
            or 0.0
        )
        x = x2
        its += 1
        if diff <= tol:
            break
    length = x.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).first()[0] or 1.0
    e.unpersist()
    return KatzState(
        scores=x.select("node", (F.col("raw") / length).alias("score")),
        raw=x,
        iterations=its,
    )
