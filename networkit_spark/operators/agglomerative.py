"""ParallelAgglomerativeClusterer — match-and-contract community detection.

Reference: ``cpp/community/ParallelAgglomerativeClusterer.cpp:21-84``. Each
level scores every edge with the modularity gain of merging its endpoints
(``scoring/ModularityScoring.hpp:edgeScore``: w(u,v)/omega -
wdeg(u)*wdeg(v)/(2*omega)^2), computes a heavy matching on those scores,
contracts matched pairs (``MatchingCoarsening``), and repeats until the
graph stops shrinking (relative shrink <= 5e-3) or fewer than 2 nodes
remain; the coarsest nodes are the clusters, projected back through the
map hierarchy (``ClusteringProjector::projectBackToFinest``).

One deliberate substitution: the reference uses the sequential
``PathGrowingMatcher`` (a 1/2-approximation); the distributed twin here is
the local-max handshake matcher (``operators/matching.py``) — the standard
parallel 1/2-approximation with the same guarantee. Scores, contraction,
thresholds and the projection are the reference's.

Plan shape per level: one groupBy for weighted degrees, one broadcast of
two scalars (omega), the fixed-round handshake (each round one groupBy +
one self-join on the shrinking live-edge set), then the coarsening
groupBy. Every stage is key-partitioned — no driver-side per-node work,
so a level costs O(|E|/p) per executor at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.operators.coarsening import (
    coarsen_by_matching,
    project_back_to_finest,
)
from networkit_spark.operators.matching import local_max_matching_fixed
from networkit_spark.plans.iteration import truncate_lineage


def modularity_edge_scores(canon_edges: DataFrame) -> DataFrame:
    """(src, dst, weight, score) modularity merge gain per canonical edge
    (src <= dst, one row per undirected edge; self-loops allowed and kept
    OUT of the scores' degree the same way the reference's weightedDegree
    counts a loop once).

    score = w(u,v)/omega - (wdeg(u)/(2 omega)) * (wdeg(v)/(2 omega)).
    """
    sym = canon_edges.select("src", "dst", "weight").union(
        canon_edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    wdeg = sym.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("wdeg")
    )
    omega = canon_edges.agg(F.sum("weight")).first()[0] or 1.0
    vol = 2.0 * omega
    return (
        canon_edges.join(wdeg.withColumnRenamed("node", "src").withColumnRenamed("wdeg", "du"), "src")
        .join(wdeg.withColumnRenamed("node", "dst").withColumnRenamed("wdeg", "dv"), "dst")
        .select(
            "src",
            "dst",
            "weight",
            (
                F.col("weight") / F.lit(float(omega))
                - (F.col("du") / vol) * (F.col("dv") / vol)
            ).alias("score"),
        )
    )


def agglomerate_one_level(
    canon_edges: DataFrame, matching_rounds: int = 16
) -> tuple[DataFrame, DataFrame]:
    """One score -> match -> contract level. Returns
    ``(coarse_edges, mapping)`` with mapping = (node, coarse)."""
    scored = modularity_edge_scores(canon_edges)
    # the matcher consumes a symmetrized (src, dst, weight) table; feed the
    # score as the weight and drop self-loops (unmatched by definition)
    cand = scored.filter(F.col("src") != F.col("dst")).select(
        "src", "dst", F.col("score").alias("weight")
    )
    cand = cand.union(
        cand.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    matched = local_max_matching_fixed(cand, rounds=matching_rounds).select("u", "v")
    return coarsen_by_matching(canon_edges, matched)


def parallel_agglomerative(
    canon_edges: DataFrame,
    max_levels: int = 20,
    min_communities: int = 2,
    rel_threshold: float = 5e-3,
    matching_rounds: int = 16,
) -> DataFrame:
    """(node, label) clustering; label = coarsest-graph node id projected
    back to the finest nodes (``ParallelAgglomerativeClusterer.cpp:40-83``:
    loop until shrink <= rel_threshold * n or < min_communities nodes)."""
    cur = truncate_lineage(canon_edges.select("src", "dst", "weight"))
    maps: list[DataFrame] = []
    n = (
        cur.select(F.col("src").alias("node"))
        .union(cur.select(F.col("dst").alias("node")))
        .distinct()
        .count()
    )
    for _ in range(max_levels):
        coarse, mapping = agglomerate_one_level(cur, matching_rounds)
        coarse = truncate_lineage(coarse)
        mapping = truncate_lineage(mapping)
        cn = mapping.select("coarse").distinct().count()
        diff = n - cn
        if not (diff > 0 and cn >= min_communities and diff / n > rel_threshold):
            break
        maps.append(mapping)
        cur, n = coarse, cn
    coarse_nodes = (
        cur.select(F.col("src").alias("node"))
        .union(cur.select(F.col("dst").alias("node")))
        .distinct()
    )
    singleton = coarse_nodes.select("node", F.col("node").alias("label"))
    if not maps:
        return singleton
    return project_back_to_finest(maps, singleton)
