"""Strongly connected components — distributed coloring (not Tarjan).

Reference: ``cpp/components/StronglyConnectedComponents.cpp:26-60`` is an
iterative Tarjan with an explicit DFS stack — inherently sequential, no
distributed dual. We implement the standard **coloring/FB algorithm**
(Orzan's coloring; Hong et al. FB-Trim — published, public algorithms):

repeat until no nodes remain:
  1. **Trim**: peel trivial SCCs (nodes with in-degree 0 or out-degree 0 in
     the remaining subgraph) — each is its own SCC; repeat to fixpoint.
  2. **Color**: propagate max node id forward to fixpoint:
     ``color(u) = max(color(u), max over in-edges color(pred))``.
  3. **Collect**: every color class's root r (``color(r) == r``) does a
     backward reachability **restricted to its color class**; reached nodes
     form the SCC of r — all roots proceed simultaneously.
  4. Remove labeled nodes; repeat.

Each outer round peels >= one SCC per color class; power-law digraphs
typically finish in a few rounds (the giant SCC goes in round one).
Labels = min... = root node id per SCC (max-id under our coloring — we
re-normalize to min member id for determinism like the other kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import aqe_disabled


def _propagate_max_color(edges: DataFrame, nodes: DataFrame, max_rounds: int = 1000) -> DataFrame:
    from networkit_spark.operators.distance import _persist_by_src

    # loop-invariant within this call (the outer SCC loop shrinks the edge
    # set BETWEEN calls): pre-partition once, shuffle only the color vector
    e = _persist_by_src(edges, "src", "dst")
    e.count()
    color = nodes.select(F.col("id").alias("node"), F.col("id").alias("color"))
    color = color.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        cand = (
            e.join(
                color.select(F.col("node").alias("src"), "color").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.max("color").alias("nc"))
        )
        new = (
            color.join(cand, "node", "left")
            .select(
                "node",
                F.greatest(F.col("color"), F.coalesce(F.col("nc"), F.col("color"))).alias("color"),
                F.col("color").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("color") != F.col("prev")).count()
        color = new.select("node", "color")
        if changed == 0:
            break
    e.unpersist()
    return color


def _backward_in_color(edges: DataFrame, color: DataFrame, max_rounds: int = 1000) -> DataFrame:
    """labels(node, label) for nodes backward-reachable from their color root
    within the color class; label = root id."""
    roots = color.filter(F.col("node") == F.col("color")).select(
        "node", F.col("color").alias("label")
    )
    labeled = roots.localCheckpoint(eager=True)
    frontier = labeled
    cnt = labeled.count()
    # walk transpose edges: u labeled if u -> v, label(v) set, color(u)==label
    from networkit_spark.operators.distance import _expand, _persist_by_src

    te = _persist_by_src(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        "src", "dst",
    )
    te.count()
    for _ in range(max_rounds):
        nxt = (
            _expand(te, frontier, cnt)
            .select(F.col("dst").alias("node"), "label")
            .join(color, "node")
            .filter(F.col("color") == F.col("label"))
            .select("node", "label")
            .distinct()
            .join(labeled.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        cnt = nxt.count()
        if cnt == 0:
            break
        labeled = labeled.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    te.unpersist()
    return labeled


def strongly_connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_outer_rounds: int = 50,
) -> DataFrame:
    """(node, label) with label = min node id of the SCC."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        remaining_nodes = nodes.select(F.col("id")).localCheckpoint(eager=True)
        remaining_edges = (
            edges.select("src", "dst").distinct().localCheckpoint(eager=True)
        )
        all_labels = None
        for _ in range(max_outer_rounds):
            if remaining_nodes.isEmpty():
                break
            # 1. trim trivial SCCs to fixpoint
            while True:
                has_out = remaining_edges.select(F.col("src").alias("id")).distinct()
                has_in = remaining_edges.select(F.col("dst").alias("id")).distinct()
                nontrivial = remaining_nodes.join(has_out, "id", "left_semi").join(
                    has_in, "id", "left_semi"
                )
                trivial = remaining_nodes.join(nontrivial, "id", "left_anti")
                n_trivial = trivial.count()
                if n_trivial == 0:
                    break
                triv_labels = trivial.select(
                    F.col("id").alias("node"), F.col("id").alias("label")
                )
                all_labels = (
                    triv_labels if all_labels is None else all_labels.union(triv_labels)
                ).localCheckpoint(eager=True)
                remaining_nodes = nontrivial.localCheckpoint(eager=True)
                remaining_edges = (
                    remaining_edges.join(
                        remaining_nodes.withColumnRenamed("id", "src"), "src", "left_semi"
                    )
                    .join(remaining_nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
                    .select("src", "dst")
                    .localCheckpoint(eager=True)
                )
            if remaining_nodes.isEmpty():
                break
            # 2-3. color + backward collect
            color = _propagate_max_color(remaining_edges, remaining_nodes.select(F.col("id")))
            found = _backward_in_color(remaining_edges, color)
            all_labels = (
                found if all_labels is None else all_labels.union(found)
            ).localCheckpoint(eager=True)
            # 4. remove labeled
            remaining_nodes = remaining_nodes.join(
                found.withColumnRenamed("node", "id"), "id", "left_anti"
            ).localCheckpoint(eager=True)
            remaining_edges = (
                remaining_edges.join(
                    remaining_nodes.withColumnRenamed("id", "src"), "src", "left_semi"
                )
                .join(remaining_nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        # normalize to min member id
        norm = all_labels.groupBy("label").agg(F.min("node").alias("nl"))
        return all_labels.join(norm, "label").select("node", F.col("nl").alias("label"))
