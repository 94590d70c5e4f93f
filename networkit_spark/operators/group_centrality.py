"""Group centrality: greedy group-degree maximization.

Reference: ``cpp/centrality/GroupDegree.cpp`` (lazy-greedy with a bucket
priority queue) — greedily grow a k-node group S maximizing
``|N(S) \\ S|`` (``countGroupNodes=False``, the ctor default) or
``|N(S) ∪ S|`` (True). The greedy gives the standard (1 - 1/e)
approximation for this submodular coverage objective.

Distributed form: synchronous greedy — each of the k rounds recomputes every
candidate's marginal gain with one anti-join + agg (no lazy queue; k is
small, each round is one shuffle), argmax with deterministic min-node-id tie
break (the reference's heap order is unspecified under ties; ours is pinned
so runs are reproducible and SQL-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_degree(
    und_edges: DataFrame,
    nodes: DataFrame,
    k: int,
    count_group: bool = False,
) -> tuple[DataFrame, int]:
    """((rank, node) members in selection order, score)."""
    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst").persist()
    e.count()
    sel: list[int] = []
    reach = spark.createDataFrame([], "id long")
    for r in range(k):
        cand = nodes.select(F.col("id").alias("src"))
        if sel:
            cand = cand.filter(~F.col("src").isin(sel))
        # marginal gain = # neighbors not yet reachable
        new_nbrs = (
            e.join(cand, "src", "left_semi")
            .join(reach.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .groupBy("src")
            .agg(F.count("*").alias("g"))
        )
        gains = cand.join(new_nbrs, "src", "left").fillna({"g": 0})
        if count_group:
            bonus = cand.join(reach.withColumnRenamed("id", "src"), "src", "left_anti").select(
                "src", F.lit(1).alias("b")
            )
            gains = gains.join(bonus, "src", "left").fillna({"b": 0}).select(
                "src", (F.col("g") + F.col("b")).alias("g")
            )
        pick = gains.orderBy(F.desc("g"), F.asc("src")).first()["src"]
        sel.append(int(pick))
        reach = (
            reach.union(spark.createDataFrame([(int(pick),)], "id long"))
            .union(e.filter(F.col("src") == pick).select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
    if count_group:
        score = reach.count()
    else:
        score = reach.filter(~F.col("id").isin(sel)).count()
    e.unpersist()
    members = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sel)], "rank long, node long"
    )
    return members, score
