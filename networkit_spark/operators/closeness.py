"""Closeness / harmonic closeness centrality (exact + sampled).

Reference: ``cpp/centrality/Closeness.cpp`` (``networkit/centrality.pyx:684``,
variants STANDARD / GENERALIZED), ``HarmonicCloseness.cpp`` (:836),
``ApproxCloseness.cpp`` (:749, Eppstein-Wang style sampling).

closeness(u) = (r_u - 1) / sum_{v reachable} d(u, v)   (GENERALIZED form;
  STANDARD divides by n-1 and is only meaningful on connected graphs),
harmonic(u) = sum_{v != u} 1 / d(u, v).

Distributed form: one **multi-source BFS** job — all (or sampled) sources
advance together, state keyed (source, node) — instead of the reference's
per-source loop. On undirected graphs d(s, v) = d(v, s), so distances from a
source *sample* estimate every node's distance sum:
``approx closeness(v) ~= (n - 1) / (n/k * sum_{s in S} d(s, v))``
(Eppstein-Wang; the reference's ApproxCloseness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.operators.distance import multi_source_bfs


def closeness(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    harmonic: bool = False,
    sources: DataFrame | None = None,
) -> DataFrame:
    """(node, score). Exact when ``sources`` is None (all-pairs BFS — small
    graphs / the test oracle); otherwise the sampled estimator over the
    given sources (undirected symmetry assumed for sampling).
    """
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    n = nodes.count()
    src = sources if sources is not None else nodes
    k = src.count()
    dists = multi_source_bfs(edges, src).filter(F.col("dist") > 0)
    # distances keyed (source, node): aggregate per *node* (d(s,v) = d(v,s)
    # on undirected; for exact all-sources this equals per-source sums)
    if harmonic:
        agg = dists.groupBy("node").agg(F.sum(1.0 / F.col("dist")).alias("s"))
        scale = n / k if sources is not None else 1.0
        out = agg.select("node", (F.col("s") * scale).alias("score"))
    else:
        agg = dists.groupBy("node").agg(
            F.sum("dist").alias("s"), F.count("*").alias("r")
        )
        if sources is not None:
            # Eppstein-Wang: estimated total distance = (n/k) * sample sum
            out = agg.select(
                "node",
                ((n - 1) / (F.col("s") * (n / k))).alias("score"),
            )
        else:
            out = agg.select("node", (F.col("r") / F.col("s")).alias("score"))
    return (
        nodes.select(F.col("id").alias("node"))
        .join(out, "node", "left")
        .fillna({"score": 0.0})
    )


def top_closeness(
    edges: DataFrame, nodes: DataFrame | None = None, k: int = 10, harmonic: bool = False
) -> DataFrame:
    """TopCloseness / TopHarmonicCloseness analog (exact ranking; the
    reference prunes with bounds — at our scale the multi-source job IS the
    batch-friendly strategy)."""
    return (
        closeness(edges, nodes, harmonic=harmonic)
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
    )


def top_harmonic_closeness(
    edges: DataFrame, nodes: DataFrame | None = None, k: int = 10
) -> DataFrame:
    """``TopHarmonicCloseness.cpp`` front door: exact top-k harmonic
    closeness (the reference prunes per-node BFS with bounds; the batched
    multi-source wave is the distributed strategy — every source advances
    in one job, and the ranking is a single top-k)."""
    return top_closeness(edges, nodes, k=k, harmonic=True)
