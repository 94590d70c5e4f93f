"""Dynamic SSSP — incremental shortest paths after edge insertions.

Reference: ``cpp/distance/DynBFS.cpp`` / ``DynDijkstra.cpp`` (the ``DynSSSP``
family): after a batch of edge insertions only the *affected* region
recomputes — the reference walks a priority queue outward from the improved
endpoints; the distributed dual seeds the relaxation frontier with exactly
those endpoints and runs delta rounds until the improvement wave dies out.
Insertions only ever lower distances, so seeded relaxation converges to the
same fixpoint a full recompute reaches (tests pin equality).

Work per batch ~ (affected nodes) × (their degrees) per wave — the full
graph is only *scanned* by the join pruned to the frontier, never fully
re-relaxed. Weight decreases route through the same call (a decrease is an
insertion of a cheaper parallel edge after `remove_multi_edges(min)`);
removals/increases need a recompute of the affected cone (the reference's
DynDijkstra punts there too and recomputes affected subtrees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INF = float("inf")


def update_sssp_insert(
    edges_all: DataFrame,
    dist: DataFrame,
    new_edges: DataFrame,
    max_rounds: int = 10_000,
) -> DataFrame:
    """-> updated (node, dist) after inserting ``new_edges``.

    ``edges_all``: the post-insertion edge table (src, dst, weight).
    ``dist``: settled (node, dist) rows — reached nodes only, like
    :func:`operators.distance.sssp_distances` returns. Hop-count (BFS)
    updates are the weight==1 special case.
    """
    e = edges_all.select("src", "dst", "weight").persist()
    e.count()
    dist = dist.localCheckpoint(eager=True)
    # seed: insertions whose source is settled and that improve (or reach) dst
    seed = (
        new_edges.select("src", "dst", "weight")
        .join(dist.withColumnRenamed("node", "src").withColumnRenamed("dist", "ds"), "src")
        .join(dist.withColumnRenamed("node", "dst").withColumnRenamed("dist", "dd"), "dst", "left")
        .select(
            F.col("dst").alias("node"),
            (F.col("ds") + F.col("weight")).alias("nd"),
            F.col("dd"),
        )
        .filter(F.col("dd").isNull() | (F.col("nd") < F.col("dd")))
        .groupBy("node")
        .agg(F.min("nd").alias("dist"))
    )
    frontier = seed.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        if frontier.isEmpty():
            break
        merged = (
            dist.join(frontier.withColumnRenamed("dist", "nd"), "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(INF)),
                    F.coalesce(F.col("nd"), F.lit(INF)),
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        cand = (
            e.join(frontier.withColumnRenamed("node", "src").withColumnRenamed("dist", "fd"), "src")
            .select(F.col("dst").alias("node"), (F.col("fd") + F.col("weight")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        frontier = (
            cand.join(merged, "node", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("node", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist = merged
    e.unpersist()
    return dist
