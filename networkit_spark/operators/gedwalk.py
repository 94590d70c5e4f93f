"""GedWalk group centrality — greedy maximization of walk exposure.

Reference: ``cpp/centrality/GedWalk.cpp`` / ``GedWalk.hpp:160-220,300-345``.
Score of a group S: ``gw(S) = sum_{i>=1} alpha^i * sum_u hit_i(u)`` where
(``evaluateGroup``, GedWalk.cpp:300-341):

- hit_0(u) = [u in S], miss_0(u) = 1 - hit_0(u)
- u in S:     hit_i(u) = sum_{v->u} w * (hit_{i-1}(v) + miss_{i-1}(v)),
              miss_i(u) = 0
- u not in S: hit_i(u) = sum_{v->u} w * hit_{i-1}(v),
              miss_i(u) = sum_{v->u} w * miss_{i-1}(v)

i.e. hit_i counts the i-walks ending at u that touched S. The reference
greedily grows S with lazy gain bounds and adaptively extends the level
cutoff; this version fixes the truncation at ``levels`` (alpha < 1/maxdeg
makes the tail geometric) and evaluates EVERY candidate's group score in
one batched propagation — state keyed (cand, node), one in-edge join + agg
per level for all candidates at once, ties to the smallest node id
(pinned, SQL-checkable; the reference breaks ties randomly).

alpha default: 1 / (1 + degInMax + degOutMax), the reference's
ADAPTIVE_GEOMETRIC convergence condition (GedWalk.hpp:168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _eval_group_scores(
    e: DataFrame,
    nodes: DataFrame,
    cand_groups: DataFrame,
    cands: DataFrame,
    alpha: float,
    levels: int,
) -> dict[int, float]:
    """Exact truncated GedWalk score per candidate group.

    ``cand_groups``: (cand, node) membership of S_cand; ``cands``: (cand).
    One (cand, node)-keyed propagation, all candidates advancing together.
    Returns {cand: score}.
    """
    st = (
        cands.crossJoin(nodes.select(F.col("id").alias("node")))
        .join(cand_groups.withColumn("ingrp", F.lit(1)), ["cand", "node"], "left")
        .select(
            "cand", "node",
            F.coalesce("ingrp", F.lit(0)).alias("ingrp"),
            F.coalesce("ingrp", F.lit(0)).cast("double").alias("hit"),
            (1 - F.coalesce("ingrp", F.lit(0))).cast("double").alias("miss"),
        )
        .localCheckpoint(eager=True)
    )
    scores: dict[int, float] = {
        r["cand"]: 0.0 for r in cands.collect()
    }
    a_pow = 1.0
    for _ in range(levels):
        a_pow *= alpha
        msgs = (
            e.join(st.select("cand", F.col("node").alias("src"), "hit", "miss"), "src")
            .groupBy("cand", F.col("dst").alias("node"))
            .agg(
                F.sum(F.col("weight") * F.col("hit")).alias("whit"),
                F.sum(F.col("weight") * F.col("miss")).alias("wmiss"),
            )
        )
        st = (
            st.select("cand", "node", "ingrp")
            .join(msgs, ["cand", "node"], "left")
            .select(
                "cand", "node", "ingrp",
                F.when(
                    F.col("ingrp") == 1,
                    F.coalesce("whit", F.lit(0.0)) + F.coalesce("wmiss", F.lit(0.0)),
                )
                .otherwise(F.coalesce("whit", F.lit(0.0)))
                .alias("hit"),
                F.when(F.col("ingrp") == 1, F.lit(0.0))
                .otherwise(F.coalesce("wmiss", F.lit(0.0)))
                .alias("miss"),
            )
            .localCheckpoint(eager=True)
        )
        for r in st.groupBy("cand").agg(F.sum("hit").alias("h")).collect():
            scores[r["cand"]] += a_pow * (r["h"] or 0.0)
    return scores


def ged_walk_greedy(
    edges: DataFrame,
    nodes: DataFrame,
    k: int,
    alpha: float | None = None,
    levels: int = 4,
    n_candidates: int = 8,
    early_stop: bool = True,
) -> tuple[DataFrame, float]:
    """Greedy GedWalk over a pruned candidate pool (top in+out weighted
    degree). Returns ((rank, node) picks, score of the final group).
    ``edges`` directed rows (pass the symmetrized table for undirected).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst", "weight").persist()
    e.count()
    if alpha is None:
        dmax_out = (
            e.groupBy("src").agg(F.sum("weight").alias("d")).agg(F.max("d")).first()[0]
            or 0.0
        )
        dmax_in = (
            e.groupBy("dst").agg(F.sum("weight").alias("d")).agg(F.max("d")).first()[0]
            or 0.0
        )
        alpha = 1.0 / (1.0 + dmax_in + dmax_out)
    wdeg = (
        e.select(F.col("src").alias("node"), "weight")
        .union(e.select(F.col("dst").alias("node"), "weight"))
        .groupBy("node")
        .agg(F.sum("weight").alias("d"))
    )
    cand_ids = [
        r["node"] for r in wdeg.orderBy(F.desc("d"), F.asc("node")).limit(n_candidates).collect()
    ]
    sel: list[int] = []
    base_score = 0.0
    for _ in range(k):
        pool = [c for c in cand_ids if c not in sel]
        if not pool:
            break
        cands = spark.createDataFrame([(c,) for c in pool], "cand long")
        groups = spark.createDataFrame(
            [(c, m) for c in pool for m in (sel + [c])], "cand long, node long"
        )
        scores = _eval_group_scores(e, nodes, groups, cands, alpha, levels)
        pick, pick_score = max(
            scores.items(), key=lambda t: (round(t[1], 9), -t[0])
        )
        if early_stop and round(pick_score, 9) <= round(base_score, 9):
            break
        sel.append(int(pick))
        base_score = pick_score
    e.unpersist()
    members = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(sel)], "rank long, node long"
    )
    return members, float(base_score)
