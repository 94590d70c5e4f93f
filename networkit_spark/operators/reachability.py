"""Reachability family (reference `reachability` module).

* ``reachable_nodes`` — per-node count of reachable nodes (including the node
  itself). Reference: ``cpp/reachability/ReachableNodes.cpp`` — undirected:
  component sizes (``runUndirected``, :151-156); directed exact: SCC
  condensation + per-SCC reachability (``runDirected``, :26-84).
* ``all_simple_paths`` — every simple path between two nodes up to a cutoff.
  Reference: ``cpp/reachability/AllSimplePaths.cpp`` (DFS enumeration); here a
  breadth-synchronous frontier of partial paths, one extension join per hop.

Spark plan notes (100 TB):

``reachable_nodes`` contracts to the SCC condensation FIRST (the reference
does the same) — on web graphs the condensation is orders of magnitude
smaller than the graph. The transitive closure on the condensation is then
computed as a frontier iteration over (source-scc, reached-scc) pairs; the
pair set is the output's intrinsic size (the reference's per-SCC BFS fills
the same |closure| cells one row at a time). For graphs whose condensation
closure is itself huge, the reference offers the ``exact=False`` bounds — the
same condensation here feeds ``topological_levels`` + a per-level DP.

``all_simple_paths`` holds one row per live partial path — exactly the DFS
stack of the reference, but breadth-parallel; the cutoff bounds the blow-up
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.operators.components import ConnectedComponents
from networkit_spark.operators.scc import strongly_connected_components


def _closure_pairs(cedges: DataFrame, cnodes: DataFrame, max_rounds: int = 200) -> DataFrame:
    """Transitive closure (u, v reachable from u) of a DAG edge table.

    Frontier iteration: each round extends the newest pairs by one edge and
    drops already-known pairs (anti join) — O(diameter) rounds, work
    proportional to the closure size, never re-deriving settled pairs.
    """
    known = cnodes.select(F.col("id").alias("u"), F.col("id").alias("v")).localCheckpoint(
        eager=True
    )
    frontier = known
    for _ in range(max_rounds):
        nxt = (
            frontier.join(
                cedges.select(F.col("src").alias("v"), F.col("dst").alias("nv")), "v"
            )
            .select("u", F.col("nv").alias("v"))
            .distinct()
            .join(known, ["u", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        known = known.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return known


def reachable_nodes(
    edges: DataFrame,
    nodes: DataFrame,
    directed: bool = True,
    max_rounds: int = 200,
) -> DataFrame:
    """-> (node, reachable) — #nodes reachable from ``node``, itself included.

    Exact mode of ``ReachableNodes`` (reachableLB == reachableUB). Undirected
    graphs reduce to connected-component sizes; directed graphs contract to
    the SCC condensation and run the closure there, so every member of an SCC
    shares one computed count (``ReachableNodes.cpp:55-84``).
    """
    if not directed:
        labels = ConnectedComponents().run(edges, nodes).labels_df
        sizes = labels.groupBy("label").agg(F.count("*").alias("reachable"))
        return labels.join(sizes, "label").select("node", "reachable")

    scc = strongly_connected_components(edges, nodes)  # (node, label)
    sizes = scc.groupBy("label").agg(F.count("*").alias("sz"))
    cnodes = sizes.select(F.col("label").alias("id")).localCheckpoint(eager=True)
    cedges = (
        edges.join(scc.withColumnRenamed("node", "src").withColumnRenamed("label", "lsrc"), "src")
        .join(scc.withColumnRenamed("node", "dst").withColumnRenamed("label", "ldst"), "dst")
        .filter(F.col("lsrc") != F.col("ldst"))
        .select(F.col("lsrc").alias("src"), F.col("ldst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    closure = _closure_pairs(cedges, cnodes, max_rounds)
    per_cmp = (
        closure.join(sizes.withColumnRenamed("label", "v"), "v")
        .groupBy(F.col("u").alias("label"))
        .agg(F.sum("sz").alias("reachable"))
    )
    return scc.join(per_cmp, "label").select("node", "reachable")


def all_simple_paths(
    edges: DataFrame,
    source: int,
    target: int,
    cutoff: int,
) -> DataFrame:
    """-> (path string "s->…->t", hops) — all simple source→target paths with
    at most ``cutoff`` edges.

    ``AllSimplePaths.cpp`` semantics (source excluded from re-visits, target
    terminates a path). Partial paths carry a ``|``-delimited member set for
    the simplicity check — a pure string predicate both Spark and ANSI SQL
    evaluate identically (used by the DuckDB oracle).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    frontier = spark.createDataFrame(
        [(int(source), f"|{source}|", str(source))], "last long, seen string, path string"
    ).localCheckpoint(eager=True)
    done = []
    for _ in range(cutoff):
        ext = (
            frontier.filter(F.col("last") != target)
            .join(e.withColumnRenamed("src", "last"), "last")
            .filter(~F.col("seen").contains(F.concat(F.lit("|"), F.col("dst"), F.lit("|"))))
            .select(
                F.col("dst").alias("last"),
                F.concat("seen", F.col("dst"), F.lit("|")).alias("seen"),
                F.concat("path", F.lit("->"), F.col("dst")).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        if ext.isEmpty():
            break
        done.append(ext.filter(F.col("last") == target).select("path"))
        frontier = ext
    if not done:
        return spark.createDataFrame([], "path string, hops int")
    out = done[0]
    for d in done[1:]:
        out = out.union(d)
    return out.select(
        "path", (F.size(F.split("path", "->")) - 1).cast("int").alias("hops")
    )
