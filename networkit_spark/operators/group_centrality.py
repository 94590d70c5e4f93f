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


def _contrib(d_col):
    """Harmonic contribution of one distance value: 1/d for d > 0 else 0
    (GroupHarmonicCloseness.cpp:622-631 skips dist 0)."""
    return F.when(d_col > 0, F.lit(1.0) / d_col).otherwise(F.lit(0.0))


def group_closeness_greedy(
    und_edges: DataFrame,
    nodes: DataFrame,
    k: int,
    mode: str = "harmonic",
    n_candidates: int = 8,
    max_bfs_rounds: int = 15,
) -> tuple[DataFrame, float]:
    """Greedy group closeness over a pruned candidate pool.

    Reference semantics: ``cpp/centrality/GroupCloseness.cpp`` (greedy
    farness improvement; ``scoreOfGroup`` at ``GroupCloseness.hpp:103-112``
    = (n - |S|) / sum_v d(S, v)) and ``GroupHarmonicCloseness.cpp:622-631``
    (score = sum_{d(S,v) > 0} 1 / d(S, v)). Both references are
    approximation algorithms (pruned/lazy greedy); this one prunes to the
    ``n_candidates`` highest-degree nodes (the reference's own starting
    heuristic, GroupCloseness.cpp:80-83), then runs exact greedy within the
    pool:

    1. ONE batched multi-source BFS gives d(c, v) for every candidate at
       once (source-tagged frontier — one shuffle per BFS level total, not
       per candidate).
    2. Each of the k rounds scores every candidate's exact marginal gain
       with a single join + agg against the current group-distance table
       d_S, argmax with gains rounded to 9 decimals and min-node-id tie
       break (pinned, SQL-checkable).

    mode='harmonic': gain = sum_v [contrib(min(d_S, d_c)) - contrib(d_S)];
    mode='closeness': gain = sum_v [min(d_S, cap) - min(d_S, d_c, cap)],
    cap = n (unreached penalty).

    Returns ((rank, node) in pick order, scoreOfGroup of the final group).
    """
    from .distance import multi_source_bfs

    spark = und_edges.sparkSession
    n = nodes.count()
    cap = float(n)
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("dg"))
    cands = [
        r["node"]
        for r in deg.orderBy(F.desc("dg"), F.asc("node")).limit(n_candidates).collect()
    ]
    cd = multi_source_bfs(
        und_edges, spark.createDataFrame([(c,) for c in cands], "id long"),
        max_rounds=max_bfs_rounds,
    ).persist()
    cd.count()
    sel: list[int] = []
    ds = None  # (node, d); absent row = unreached by S
    for _ in range(k):
        pool = cd.filter(~F.col("source").isin(sel)) if sel else cd
        if ds is None:
            if mode == "harmonic":
                gain = F.sum(_contrib(F.col("dist")))
            else:
                gain = F.sum(F.lit(cap) - F.least(F.col("dist").cast("double"), F.lit(cap)))
            gains = pool.groupBy("source").agg(gain.alias("g"))
        else:
            j = pool.join(ds, "node", "left")
            dS = F.coalesce(F.col("d").cast("double"), F.lit(1e18))
            new_d = F.least(dS, F.col("dist").cast("double"))
            if mode == "harmonic":
                gain = F.sum(_contrib(new_d) - _contrib(F.when(F.col("d").isNotNull(), F.col("d").cast("double")).otherwise(F.lit(0.0))))
            else:
                gain = F.sum(
                    F.least(dS, F.lit(cap)) - F.least(new_d, F.lit(cap))
                )
            gains = j.groupBy("source").agg(gain.alias("g"))
        pick = gains.select(
            "source", F.round("g", 9).alias("g")
        ).orderBy(F.desc("g"), F.asc("source")).first()["source"]
        sel.append(int(pick))
        picked = cd.filter(F.col("source") == pick).select("node", F.col("dist").alias("dp"))
        if ds is None:
            ds = picked.select("node", F.col("dp").alias("d"))
        else:
            ds = (
                ds.join(picked, "node", "full")
                .select(
                    "node",
                    F.least(
                        F.coalesce(F.col("d"), F.lit(2**62)),
                        F.coalesce(F.col("dp"), F.lit(2**62)),
                    ).alias("d"),
                )
            )
        ds = ds.localCheckpoint(eager=True)
    if mode == "harmonic":
        score = ds.agg(F.sum(_contrib(F.col("d").cast("double")))).first()[0] or 0.0
    else:
        sum_d = ds.agg(F.sum("d")).first()[0] or 0
        score = (float(n - len(sel)) / sum_d) if sum_d > 0 else 0.0
    cd.unpersist()
    members = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(sel)], "rank long, node long"
    )
    return members, float(score)
