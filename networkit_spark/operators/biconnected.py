"""Biconnected components — distributed BFS-forest + cycle-cover variant.

Reference: ``cpp/components/BiconnectedComponents.cpp`` (iterative
Hopcroft-Tarjan: DFS lowpoints, edge-stack popping at articulation
points). A DFS stack is inherently sequential, so this module computes the
same *edge partition* with a parallel plan:

1. **BFS forest** (one frontier superstep per level): roots = the
   min-node-id of each connected component; each non-root gets
   ``parent`` = min visited neighbor one level up. Every tree edge is
   identified by its child node id.
2. **Cycle cover** (the Tarjan-Vishkin observation): a non-tree edge
   (u, v) closes a cycle through the tree path u -> lca -> v; every pair
   of consecutive tree edges on that path lies in one biconnected
   component. We lift the deeper endpoint one level per superstep,
   emitting (previous tree edge, lifted tree edge) merge pairs, until the
   endpoints meet; at the LCA the two branches are merged too. O(depth)
   supersteps, frontier shrinks as paths close.
3. **Hash-min CC on the auxiliary tree-edge graph** (merge pairs as
   edges): connected tree edges form one biconnected component; a tree
   edge covered by no cycle is a bridge — its own component, matching the
   reference's two-node components. Non-tree edges join the component of
   the first tree edge lifted from their endpoint.

Labels are min tree-edge child id per component (deterministic — the
reference's DFS-order component ids are not portable, its tests key on
component count / sizes, ``test_components.py:15-27``).

Scale notes: step 2 emits O(m * depth) merge pairs worst-case — the
standard price of the LCA-walk formulation; on web graphs the BFS depth
is small and the frontier-shrink keeps supersteps cheap. All joins are
key-partitioned; no window sorts, no Python in the loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.operators.components import ConnectedComponents
from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage


def _bfs_forest(und_edges: DataFrame, nodes: DataFrame, max_levels: int = 200) -> DataFrame:
    """(node, level, parent) — parent = min visited neighbor one level up;
    roots (parent null, level 0) are each component's min node id."""
    cc = ConnectedComponents().run(und_edges, nodes).get_partition()
    state = cc.select(
        "node",
        F.when(F.col("node") == F.col("label"), F.lit(0)).alias("level"),
        F.lit(None).cast("long").alias("parent"),
    )
    state = truncate_lineage(state)
    lvl = 0
    while lvl < max_levels:
        frontier = state.filter(F.col("level") == lvl).select(F.col("node").alias("src"))
        if frontier.isEmpty():
            break
        cand = (
            und_edges.join(frontier, "src")
            .select(F.col("dst").alias("node"), F.col("src").alias("cand_parent"))
            .groupBy("node")
            .agg(F.min("cand_parent").alias("new_parent"))
        )
        state = truncate_lineage(
            state.join(cand, "node", "left").select(
                "node",
                F.when(
                    F.col("level").isNull() & F.col("new_parent").isNotNull(), F.lit(lvl + 1)
                )
                .otherwise(F.col("level"))
                .alias("level"),
                F.when(
                    F.col("level").isNull() & F.col("new_parent").isNotNull(),
                    F.col("new_parent"),
                )
                .otherwise(F.col("parent"))
                .alias("parent"),
            )
        )
        lvl += 1
    return state


@dataclass
class BiconnectedResult:
    edge_labels_df: DataFrame  # (u, v, label): u < v, one row per und. edge

    def get_edge_partition(self) -> DataFrame:
        return self.edge_labels_df

    def number_of_components(self) -> int:
        return self.edge_labels_df.select("label").distinct().count()

    def component_sizes(self) -> DataFrame:
        """(label, size) — size in NODES, the reference's componentSizes."""
        members = self.edge_labels_df.select(
            "label", F.explode(F.array("u", "v")).alias("node")
        ).distinct()
        return members.groupBy("label").agg(F.count("*").alias("size"))

    def components_of_node(self) -> DataFrame:
        """(node, label) rows — a node appears once per component it belongs
        to (articulation points appear in several)."""
        return (
            self.edge_labels_df.select("label", F.explode(F.array("u", "v")).alias("node"))
            .distinct()
            .select("node", "label")
        )


class BiconnectedComponents:
    """Edge partition into biconnected components (undirected input;
    self-loops ignored, parallel rows deduped)."""

    def __init__(self, max_levels: int = 200):
        self.max_levels = max_levels

    def run(self, und_edges: DataFrame, nodes: DataFrame | None = None) -> BiconnectedResult:
        spark = und_edges.sparkSession
        with aqe_disabled(spark):
            return self._run(und_edges, nodes)

    def _run(self, und_edges, nodes):
        nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
        e = (
            und_edges.filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
            .persist()
        )
        e.count()
        forest = _bfs_forest(e, nodes, self.max_levels).persist()
        parents = forest.select("node", "level", "parent").persist()
        parents.count()

        tree = forest.filter(F.col("parent").isNotNull()).select(
            F.col("node").alias("c"), F.col("parent").alias("p")
        )
        # undirected edge list with u < v; drop tree pairs -> non-tree edges
        und = e.filter(F.col("src") < F.col("dst"))
        tree_pairs = tree.select(
            F.least("c", "p").alias("src"), F.greatest("c", "p").alias("dst")
        )
        nontree = und.join(tree_pairs, ["src", "dst"], "left_anti")

        # lifting state: one row per open cycle walk
        lvl = parents.select(
            F.col("node"), F.col("level").alias("lv"), F.col("parent").alias("pa")
        )
        state = (
            nontree.join(lvl.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("lv", "la")
            .withColumnRenamed("pa", "pa_a")
            .join(
                lvl.withColumnRenamed("node", "dst")
                .withColumnRenamed("lv", "lb")
                .withColumnRenamed("pa", "pa_b"),
                "dst",
            )
            .select(
                F.col("src").alias("eu"),
                F.col("dst").alias("ev"),
                F.col("src").alias("a"),
                F.col("dst").alias("b"),
                "la",
                "lb",
                F.lit(None).cast("long").alias("lea"),
                F.lit(None).cast("long").alias("leb"),
            )
        )
        state = truncate_lineage(state)
        pair_batches = []
        anchor_batches = []  # (eu, ev, tree edge) for non-tree edge placement
        rounds = 0
        while rounds < self.max_levels:
            active = state.filter(F.col("a") != F.col("b"))
            if active.isEmpty():
                break
            lift_a = F.col("la") >= F.col("lb")
            lift_b = F.col("lb") >= F.col("la")
            stepped = (
                active.join(
                    lvl.select(F.col("node").alias("a"), F.col("pa").alias("pa_a")), "a"
                )
                .join(lvl.select(F.col("node").alias("b"), F.col("pa").alias("pa_b")), "b")
                .select(
                    "eu",
                    "ev",
                    # emitted merge pairs for this round
                    F.when(lift_a & F.col("lea").isNotNull(),
                           F.struct(F.col("lea").alias("x"), F.col("a").alias("y"))).alias("ma"),
                    F.when(lift_b & F.col("leb").isNotNull(),
                           F.struct(F.col("leb").alias("x"), F.col("b").alias("y"))).alias("mb"),
                    F.when(lift_a, F.col("pa_a")).otherwise(F.col("a")).alias("na"),
                    F.when(lift_b, F.col("pa_b")).otherwise(F.col("b")).alias("nb"),
                    F.when(lift_a, F.col("la") - 1).otherwise(F.col("la")).alias("nla"),
                    F.when(lift_b, F.col("lb") - 1).otherwise(F.col("lb")).alias("nlb"),
                    F.when(lift_a, F.col("a")).otherwise(F.col("lea")).alias("nlea"),
                    F.when(lift_b, F.col("b")).otherwise(F.col("leb")).alias("nleb"),
                )
            )
            stepped = truncate_lineage(stepped)
            pairs = stepped.select(
                F.explode(
                    F.filter(F.array("ma", "mb"), lambda s: s.isNotNull())
                ).alias("m")
            ).select(F.col("m.x").alias("x"), F.col("m.y").alias("y"))
            pair_batches.append(pairs)
            closed = stepped.filter(F.col("na") == F.col("nb"))
            # both branches meet at the LCA: merge them; the walk's first
            # lifted tree edge anchors the non-tree edge's component
            pair_batches.append(
                closed.filter(F.col("nlea").isNotNull() & F.col("nleb").isNotNull())
                .select(F.col("nlea").alias("x"), F.col("nleb").alias("y"))
            )
            anchor_batches.append(
                closed.select(
                    "eu", "ev", F.coalesce(F.col("nlea"), F.col("nleb")).alias("anchor")
                )
            )
            state = stepped.filter(F.col("na") != F.col("nb")).select(
                "eu",
                "ev",
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                F.col("nla").alias("la"),
                F.col("nlb").alias("lb"),
                F.col("nlea").alias("lea"),
                F.col("nleb").alias("leb"),
            )
            rounds += 1

        spark = e.sparkSession
        if pair_batches:
            all_pairs = pair_batches[0]
            for p in pair_batches[1:]:
                all_pairs = all_pairs.unionByName(p)
            all_pairs = all_pairs.persist()
        else:
            all_pairs = spark.createDataFrame([], "x long, y long")
        # hash-min CC over tree-edge ids; uncovered tree edges = bridges
        aux = all_pairs.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        aux = aux.unionByName(aux.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        tree_ids = tree.select(F.col("c").alias("id"))
        labels = (
            ConnectedComponents()
            .run(aux.withColumn("weight", F.lit(1.0)), tree_ids)
            .get_partition()
        )  # (node=tree edge id, label)

        tree_lab = (
            tree.join(labels.withColumnRenamed("node", "c"), "c")
            .select(
                F.least("c", "p").alias("u"), F.greatest("c", "p").alias("v"), "label"
            )
        )
        if anchor_batches:
            anchors = anchor_batches[0]
            for a in anchor_batches[1:]:
                anchors = anchors.unionByName(a)
        else:
            anchors = spark.createDataFrame([], "eu long, ev long, anchor long")
        nontree_lab = (
            anchors.join(labels.withColumnRenamed("node", "anchor"), "anchor")
            .select(F.col("eu").alias("u"), F.col("ev").alias("v"), "label")
        )
        out = tree_lab.unionByName(nontree_lab)
        e.unpersist()
        return BiconnectedResult(truncate_lineage(out))
