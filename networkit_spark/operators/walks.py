"""Random-walk corpus generation (the Node2Vec front half).

Reference: ``cpp/embedding/Node2Vec.cpp`` + ``BiasedRandomWalk.cpp`` —
walk corpus -> word2vec. The corpus generation is the graph-native part;
we generate **uniform** random walks deterministically (hash-seeded choice
per (walk, step)); the p/q-biased second-order variant and the embedding
training are out of scope (they need the previous step's neighborhood —
doable with one more join — and an SGD loop respectively).

Design: adjacency arrays per node (``collect_list`` — bounded by max degree;
at web scale hub arrays are capped by ``max_neighbors`` sampling), then
``length`` joins: state (walk_id, step, cur) x adjacency -> pick index
``hash(walk_id, step) % degree``. Output long format (walk_id, step, node)
— one row per visited node, ready for downstream windowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import truncate_lineage


def random_walks(
    und_edges: DataFrame,
    walks_per_node: int = 1,
    length: int = 5,
    seed: int = 42,
    max_neighbors: int = 10_000,
) -> DataFrame:
    """(walk_id, step, node); walk_id = start_node * walks_per_node + r."""
    adj = (
        und_edges.select("src", "dst")
        .groupBy("src")
        .agg(F.slice(F.collect_list("dst"), 1, max_neighbors).alias("nbrs"))
    )
    adj = truncate_lineage(adj)
    starts = (
        adj.select(F.col("src").alias("node"))
        .crossJoin(
            und_edges.sparkSession.range(walks_per_node).select(
                F.col("id").alias("r")
            )
        )
        .select(
            (F.col("node") * walks_per_node + F.col("r")).alias("walk_id"),
            F.lit(0).alias("step"),
            F.col("node").alias("cur"),
        )
    )
    out = starts.select("walk_id", "step", F.col("cur").alias("node"))
    frontier = truncate_lineage(starts)
    for step in range(1, length):
        nxt = (
            frontier.join(adj.withColumnRenamed("src", "cur"), "cur")
            .select(
                "walk_id",
                F.lit(step).alias("step"),
                F.element_at(
                    "nbrs",
                    (
                        F.abs(F.xxhash64("walk_id", F.lit(step), F.lit(seed)))
                        % F.size("nbrs")
                        + 1
                    ).cast("int"),
                ).alias("cur"),
            )
        )
        nxt = truncate_lineage(nxt)
        out = out.unionByName(nxt.select("walk_id", "step", F.col("cur").alias("node")))
        frontier = nxt
    return out


def walk_cooccurrences(walks: DataFrame, window: int = 2) -> DataFrame:
    """(a, b, cnt) skip-gram pair counts within +-window on each walk —
    the word2vec training-pair extraction, as one self-join."""
    x = walks.select("walk_id", F.col("step").alias("sa"), F.col("node").alias("a"))
    y = walks.select("walk_id", F.col("step").alias("sb"), F.col("node").alias("b"))
    return (
        x.join(y, "walk_id")
        .filter(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )
