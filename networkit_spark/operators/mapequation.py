"""LouvainMapEquation — local moving under the map-equation objective.

Reference: ``cpp/community/LouvainMapEquation.cpp`` — move fitness
``fitnessChange`` (:349-391): for a move of u (volume ``deg``, no loops in
our link graphs) from ``cur`` to ``t``,

    cutDiffCur = 2*w(u,cur) - deg
    cutDiffT   = deg - 2*w(u,t)
    change(t)  = plogp(totalCut + cutDiffCur + cutDiffT)
                 + (plogp(cut_t + cutDiffT + vol_t + deg) - plogp(cut_t + vol_t))
                 - 2*(plogp(cut_t + cutDiffT) - plogp(cut_t))
    stay       = plogp(totalCut)
                 + (plogp(cut_c + vol_c) - plogp(cut_c + cutDiffCur + vol_c - deg))
                 - 2*(plogp(cut_c) - plogp(cut_c + cutDiffCur))

with ``plogp(x) = (x/totalVolume) * ln(x/totalVolume)`` for x > 0 else 0
(:375-383); u moves to the argmin target iff ``change < stay`` (:312-341,
ties keep the node). Cluster state per ``calculateInitialClusterCutAndVolume``
(:480-522): vol(c) = sum of member weighted degrees, cut(c) = boundary weight
counted once per incident cluster, totalCut = sum over clusters.

Distributed synchronous variant (the reference's SYNCHRONOUS strategy is
also round-based, :124-150): all-relational sweeps like PLM — one
labeled-edge shuffle builds cluster stats + per-node neighbor-cluster
weights, the fitness delta is a pure column expression, argmin by
struct-min (no window sort). Even/odd node-id parity staging prevents the
two-node swap oscillation of synchronous moving; scores are rounded to 9
decimals so the move decision is reproducible across engines (the DuckDB
oracle evaluates the identical expressions).

Map-equation value (:mapEquation, :534-545):
    L = plogp(totalCut) - 2*sum_c plogp(cut_c) + sum_c plogp(cut_c + vol_c)
        - sum_u plogp(deg_u)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import truncate_lineage


def _plogp(x, totvol):
    rel = x / F.lit(totvol)
    return F.when(x > 0, rel * F.log(rel)).otherwise(0.0)


@dataclass
class MapEquationResult:
    labels_df: DataFrame  # (node, label) — min member node id
    iterations: int

    def get_partition(self) -> DataFrame:
        return self.labels_df


def _sweep(e, labels, wdeg, totvol, parity):
    """One synchronous local-move round; returns new (node, comm) labels."""
    la = labels.select(F.col("node").alias("src"), F.col("comm").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("comm").alias("ld"))
    lab = e.join(la, "src").join(lb, "dst")
    st = lab.groupBy(F.col("ls").alias("c")).agg(
        F.sum("weight").alias("vol"),
        F.sum(F.when(F.col("ls") != F.col("ld"), F.col("weight")).otherwise(0.0)).alias("cut"),
    )
    totcut = st.agg(F.sum("cut")).first()[0] or 0.0
    wuc = lab.groupBy(F.col("src").alias("node"), F.col("ld").alias("c")).agg(
        F.sum("weight").alias("w")
    )
    base = (
        labels.withColumnRenamed("comm", "cur")
        .join(wdeg, "node")
        .join(
            wuc.withColumnRenamed("c", "cur").withColumnRenamed("w", "wcur"),
            ["node", "cur"],
            "left",
        )
        .fillna({"wcur": 0.0})
        .join(
            st.withColumnRenamed("c", "cur")
            .withColumnRenamed("vol", "vol_cur")
            .withColumnRenamed("cut", "cut_cur"),
            "cur",
        )
    )
    cut_diff_cur = 2 * F.col("wcur") - F.col("wdeg")
    stay = (
        _plogp(F.lit(totcut), totvol)
        + (
            _plogp(F.col("cut_cur") + F.col("vol_cur"), totvol)
            - _plogp(F.col("cut_cur") + cut_diff_cur + F.col("vol_cur") - F.col("wdeg"), totvol)
        )
        - 2
        * (
            _plogp(F.col("cut_cur"), totvol)
            - _plogp(F.col("cut_cur") + cut_diff_cur, totvol)
        )
    )
    scored_base = base.select(
        "node", "cur", "wdeg", "wcur", F.round(stay, 9).alias("stay")
    )
    cand = (
        wuc.join(scored_base, "node")
        .filter(F.col("c") != F.col("cur"))
        .join(st, "c")
    )
    cut_diff_t = F.col("wdeg") - 2 * F.col("w")
    change = (
        _plogp(F.lit(totcut) + cut_diff_cur + cut_diff_t, totvol)
        + (
            _plogp(F.col("cut") + cut_diff_t + F.col("vol") + F.col("wdeg"), totvol)
            - _plogp(F.col("cut") + F.col("vol"), totvol)
        )
        - 2 * (_plogp(F.col("cut") + cut_diff_t, totvol) - _plogp(F.col("cut"), totvol))
    )
    best = (
        cand.select("node", "c", F.round(change, 9).alias("change"))
        .groupBy("node")
        .agg(F.min(F.struct(F.col("change"), F.col("c"))).alias("top"))
        .select("node", F.col("top.change").alias("change"), F.col("top.c").alias("newc"))
    )
    decided = scored_base.join(best, "node", "left").select(
        "node",
        F.when(
            (F.pmod(F.col("node"), 2) == parity)
            & F.col("change").isNotNull()
            & (F.col("change") < F.col("stay")),
            F.col("newc"),
        )
        .otherwise(F.col("cur"))
        .alias("moved_comm"),
    )
    # isolated nodes never reach scored_base (no wdeg/stats rows): keep them
    return labels.join(decided, "node", "left").select(
        "node",
        F.coalesce(F.col("moved_comm"), F.col("comm")).alias("comm"),
        F.col("comm").alias("prev"),
    )


def map_equation_fixed(
    edges: DataFrame, nodes: DataFrame | None = None, iterations: int = 4
) -> DataFrame:
    """Fixed-sweep synchronous map-equation local moving (driver-query /
    oracle twin of :class:`LouvainMapEquation`). Returns (node, label) with
    label = min member node id. ``edges`` symmetrized, no self-loops."""
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    e = edges.filter(F.col("src") != F.col("dst"))
    totvol = e.agg(F.sum("weight")).first()[0] or 0.0
    if totvol == 0:
        return nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    wdeg = e.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    # loop-invariant pre-partition (the PageRank contrib recipe): the sweep
    # joins e on src every iteration, so only the label table shuffles
    shuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    e = e.repartition(shuf, "src").persist()
    wdeg = wdeg.localCheckpoint(eager=True)
    labels = nodes.select(F.col("id").alias("node"), F.col("id").alias("comm"))
    for k in range(iterations):
        labels = truncate_lineage(_sweep(e, labels, wdeg, totvol, k % 2).select("node", "comm"))
    e.unpersist()
    return _normalize(labels)


def _normalize(labels: DataFrame) -> DataFrame:
    mins = labels.groupBy("comm").agg(F.min("node").alias("label"))
    return labels.join(mins, "comm").select("node", "label")


class LouvainMapEquation:
    """Convergence-driven variant (``maxIterations`` rounds or no moves —
    the reference's flat ``hierarchical=False`` default)."""

    def __init__(self, max_iterations: int = 32):
        self.max_iterations = max_iterations

    def run(self, edges: DataFrame, nodes: DataFrame | None = None) -> MapEquationResult:
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        e = edges.filter(F.col("src") != F.col("dst"))
        totvol = e.agg(F.sum("weight")).first()[0] or 0.0
        if totvol == 0:
            return MapEquationResult(
                nodes.select(F.col("id").alias("node"), F.col("id").alias("label")), 0
            )
        wdeg = e.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
        labels = nodes.select(F.col("id").alias("node"), F.col("id").alias("comm"))
        it = 0
        stable = 0
        while it < self.max_iterations and stable < 2:
            new_labels = truncate_lineage(_sweep(e, labels, wdeg, totvol, it % 2))
            moved = new_labels.filter(F.col("comm") != F.col("prev")).count()
            labels = new_labels.select("node", "comm")
            it += 1
            stable = stable + 1 if moved == 0 else 0
        return MapEquationResult(_normalize(labels), it)


def map_equation_value(edges: DataFrame, labels: DataFrame) -> float:
    """The map equation L of a partition (``mapEquation()``, :534-545)."""
    import math

    e = edges.filter(F.col("src") != F.col("dst"))
    totvol = e.agg(F.sum("weight")).first()[0] or 0.0
    if totvol == 0:
        return 0.0
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ld"))
    lab = e.join(la, "src").join(lb, "dst")
    st = lab.groupBy("ls").agg(
        F.sum("weight").alias("vol"),
        F.sum(F.when(F.col("ls") != F.col("ld"), F.col("weight")).otherwise(0.0)).alias("cut"),
    )
    agg = st.select(
        F.sum("cut").alias("totcut"),
        F.sum(_plogp(F.col("cut"), totvol)).alias("sum_cut"),
        F.sum(_plogp(F.col("cut") + F.col("vol"), totvol)).alias("sum_cutvol"),
    ).first()
    wdeg = e.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    sum_alpha = wdeg.select(F.sum(_plogp(F.col("wdeg"), totvol)).alias("s")).first()["s"]
    totcut_rel = agg["totcut"] / totvol
    plogp_totcut = totcut_rel * math.log(totcut_rel) if agg["totcut"] > 0 else 0.0
    return float(plogp_totcut - 2 * agg["sum_cut"] + agg["sum_cutvol"] - sum_alpha)
