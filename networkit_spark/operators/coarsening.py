"""Graph coarsening by partition / matching (reference `coarsening` module).

Reference semantics (`cpp/coarsening/ParallelPartitionCoarsening.cpp:23-66`,
`MatchingCoarsening.cpp`):

* ``ParallelPartitionCoarsening`` — given a partition ``zeta``, the coarse
  graph has one node per *used* subset (ids compacted: subset ids mapped to
  ``0..k-1`` in ascending subset-id order, ``Partition::compact`` with
  ``useTurbo``), an undirected weighted edge (cu, cv) whose weight is the sum
  of fine edge weights between the two blocks, and a self-loop per block whose
  weight is the sum of intra-block fine edge weights (each fine edge counted
  once — the reference's ``sv != su || u >= v`` guard).
* ``MatchingCoarsening`` — contract each matched pair to one coarse node
  (unmatched nodes stay singleton); same weight aggregation. The reference's
  ``noSelfLoops`` flag drops intra-pair loops.

Spark plan: one broadcast-or-shuffle join of the edge table against the
(node -> coarse id) mapping on each endpoint, then a single ``groupBy``
with map-side partial aggregation. The mapping's dense ids come from
``plans/ids.dense_ids`` (distributed range-sort rank — no single-partition
window), so the whole pipeline is linear in executors at 10^12 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.ids import dense_ids


def compact_partition(labels: DataFrame, node_col: str = "node", label_col: str = "label") -> DataFrame:
    """(node, label) -> (node, coarse) with coarse = ascending-label rank.

    The distributed dual of ``Partition::compact(useTurbo)`` — subset ids are
    renumbered 0..k-1 preserving ascending order of the original ids.
    """
    dic = dense_ids(labels.select(label_col), label_col, id_col="coarse")
    return labels.join(dic, label_col).select(node_col, "coarse")


def coarsen_by_partition(
    edges: DataFrame,
    labels: DataFrame,
    node_col: str = "node",
    label_col: str = "label",
) -> tuple[DataFrame, DataFrame]:
    """ParallelPartitionCoarsening over an undirected edge table.

    ``edges``: (src, dst, weight) — undirected, each edge in ONE canonical
    row (src <= dst), the layout every community operator here emits.
    ``labels``: (node, label) covering every endpoint.

    Returns ``(coarse_edges, mapping)``:
      * ``coarse_edges`` — (src, dst, weight), src <= dst, one row per coarse
        edge; src == dst rows are the intra-block self-loops (weight = total
        intra-block fine weight, each fine edge once).
      * ``mapping`` — (node, coarse): fine -> coarse node id, dense 0..k-1.
    """
    mapping = compact_partition(labels, node_col, label_col)
    m_src = mapping.withColumnRenamed(node_col, "src").withColumnRenamed("coarse", "csrc")
    m_dst = mapping.withColumnRenamed(node_col, "dst").withColumnRenamed("coarse", "cdst")
    coarse = (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .select(
            F.least("csrc", "cdst").alias("src"),
            F.greatest("csrc", "cdst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return coarse, mapping


def coarsen_by_matching(
    edges: DataFrame,
    matching: DataFrame,
    no_self_loops: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """MatchingCoarsening: contract matched pairs (u, v) -> one coarse node.

    ``matching``: (u, v) rows with u < v (a valid matching — each node in at
    most one row). Unmatched nodes remain singletons. Coarse ids are dense
    ranks of the pair representative (min member), matching the reference's
    ascending-id compaction.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    rep = (
        matching.select(F.col("u").alias("node"), F.col("u").alias("label"))
        .union(matching.select(F.col("v").alias("node"), F.col("u").alias("label")))
    )
    labels = (
        nodes.join(rep, "node", "left")
        .select("node", F.coalesce("label", "node").alias("label"))
    )
    coarse, mapping = coarsen_by_partition(edges, labels)
    if no_self_loops:
        coarse = coarse.filter(F.col("src") != F.col("dst"))
    return coarse, mapping


def project_back(mapping: DataFrame, coarse_labels: DataFrame) -> DataFrame:
    """ClusteringProjector::projectBack (``ClusteringProjector.cpp:13-27``):
    each fine node inherits the cluster of its coarse node.

    ``mapping``: (node, coarse) fine -> coarse; ``coarse_labels``:
    (node, label) on the coarse graph. One hash join, no per-node work —
    broadcastable whenever the coarse side is small.
    """
    return (
        mapping.join(
            coarse_labels.withColumnRenamed("node", "coarse"), "coarse"
        ).select("node", "label")
    )


def project_back_to_finest(
    maps: list[DataFrame], coarse_labels: DataFrame
) -> DataFrame:
    """ClusteringProjector::projectBackToFinest
    (``ClusteringProjector.cpp:29-57``): compose the fine->coarse maps of a
    coarsening hierarchy (finest first), then assign the coarsest cluster.

    Each composition step is one join on the intermediate id; the chain is
    #levels joins — each level's map is usually far smaller than the finest
    graph, so later joins shrink geometrically.
    """
    if not maps:
        return coarse_labels
    cur = maps[0]
    for m in maps[1:]:
        cur = (
            cur.join(
                m.select(
                    F.col("node").alias("coarse"), F.col("coarse").alias("next")
                ),
                "coarse",
            )
            .select("node", F.col("next").alias("coarse"))
        )
    return project_back(cur, coarse_labels)
