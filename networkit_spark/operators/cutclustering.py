"""Cut clustering (Flake-Tarjan) — min-cut communities via batched max flow.

Reference: ``cpp/community/CutClustering.cpp`` — augment the weighted graph
with an artificial sink ``t`` connected to every node by an edge of weight
``alpha``; process nodes in decreasing-degree order (ties in node-id order,
the reference's stable bucket sort); for each still-unclustered node ``u``
run EdmondsKarp(u, t) and label the whole source side of the min cut with
``u`` — later source sides may absorb earlier clusters (the source sides
form a laminar family, so overwrites are exact, not heuristic).

Distributed re-expression: every min cut is computed on the SAME augmented
graph, so the sequential loop's flows are independent computations — only
the skip/absorb bookkeeping is order-dependent, and that bookkeeping touches
just the (batch x batch) membership bits plus one label overwrite per batch.
We therefore pull BATCHES of the next unclustered nodes in reference order,
solve all of a batch's min cuts in ONE multi-instance push-relabel loop
(``max_flow_multi`` — run id == source node, per-run state rows), then
replay the reference's skip logic driver-side on the tiny batch-membership
matrix and apply labels with a single anti-join+union (later batch wins ==
reference's overwrite). Results are EXACTLY the reference partition,
including label identities, because the minimal source-side min cut is
unique (residual-reachable set from s) and the processing order is
identical.

Scale notes: batch size bounds the per-superstep state at batch x |E| rows
— pick it so the widened superstep fits the cluster's shuffle capacity; at
a fixed batch the loop count is n_clusters / batch in the worst case, and
each absorb typically retires many nodes per batch on community-structured
graphs (the same heuristic that makes the reference's skip effective).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.operators.flow import max_flow_multi
from networkit_spark.plans.iteration import truncate_lineage


def cut_clustering(
    edges: DataFrame,
    nodes: DataFrame,
    alpha: float,
    batch: int = 32,
    max_rounds: int = 300,
    relabel_every: int = 8,
    max_batches: int = 10_000,
) -> DataFrame:
    """Partition (node, label) of the undirected weighted graph ``edges``
    (src, dst, weight; either orientation, parallel rows merged by max) —
    label == the clustering source node id, matching CutClustering.cpp."""
    spark = edges.sparkSession
    canon = (
        edges.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.col("weight").cast("double").alias("w"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .groupBy("lo", "hi")
        .agg(F.max("w").alias("w"))
    )
    t = int(nodes.agg(F.max("node")).collect()[0][0]) + 1
    # undirected == symmetric directed capacities (flow value, min cuts and
    # residual reachability all coincide under the two-arc encoding)
    graph_arcs = canon.select(F.col("lo").alias("src"), F.col("hi").alias("dst"),
                              F.col("w").alias("capacity")).union(
        canon.select(F.col("hi").alias("src"), F.col("lo").alias("dst"),
                     F.col("w").alias("capacity"))
    )
    sink_arcs = nodes.select(
        F.col("node").alias("src"), F.lit(t).alias("dst"),
        F.lit(float(alpha)).alias("capacity"),
    ).union(
        nodes.select(F.lit(t).alias("src"), F.col("node").alias("dst"),
                     F.lit(float(alpha)).alias("capacity"))
    )
    aug = truncate_lineage(graph_arcs.union(sink_arcs))
    # reference order: degree (in G, not augmented) desc, node id asc
    deg = (
        canon.select(F.col("lo").alias("node"))
        .union(canon.select(F.col("hi").alias("node")))
        .groupBy("node").agg(F.count("*").alias("deg"))
    )
    order = truncate_lineage(
        nodes.join(deg, "node", "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
    )
    labels = spark.createDataFrame([], "node long, label long")
    unclustered = order
    for _ in range(max_batches):
        batch_rows = (
            unclustered.orderBy(F.col("deg").desc(), F.col("node").asc())
            .limit(batch).collect()
        )
        if not batch_rows:
            break
        batch_nodes = [int(r.node) for r in batch_rows]
        mfr = max_flow_multi(aug, batch_nodes, t, max_rounds=max_rounds,
                             relabel_every=relabel_every)
        sets = truncate_lineage(mfr.source_sets_df)  # (run, node)
        # batch x batch membership bits -> sequential skip replay (driver)
        in_batch = spark.createDataFrame(
            [(b,) for b in batch_nodes], "node long")
        mem = {
            (int(r.run), int(r.node))
            for r in sets.join(F.broadcast(in_batch), "node").collect()
        }
        kept: list[int] = []  # processing order preserved
        for b in batch_nodes:
            if any((k, b) in mem for k in kept):
                continue  # already absorbed by an earlier source side
            kept.append(b)
        ordmap = spark.createDataFrame(
            [(b, i) for i, b in enumerate(kept)], "run long, ord int"
        )
        new_labels = (
            sets.join(F.broadcast(ordmap), "run")
            .groupBy("node")
            .agg(F.max_by("run", "ord").alias("label"))  # last assignment wins
        )
        new_labels = truncate_lineage(new_labels)
        labels = truncate_lineage(
            labels.join(new_labels, "node", "left_anti")
            .union(new_labels.select("node", "label"))
        )
        unclustered = truncate_lineage(
            unclustered.join(labels, "node", "left_anti")
        )
    return labels
