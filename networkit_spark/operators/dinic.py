"""Distributed Dinic max flow — level graph + wave blocking flow.

Reference: ``cpp/flow/Dinic.cpp`` / ``include/networkit/flow/Dinic.hpp``
(directed, weighted, non-negative capacities; ``tolerance =
max(ABSOLUTE_TOLERANCE, RELATIVE_TOLERANCE * max|cap|)``). The reference
builds a BFS level graph per phase, then extracts augmenting paths one at
a time through parent lists — inherently sequential. The same phase
structure distributes cleanly; only the blocking-flow step needs a
parallel re-expression:

phase (repeat while target is BFS-reachable in the residual graph):
  1. LEVELS — distributed frontier BFS from the source over residual arcs
     with ``res > tol`` (one join per hop, stops the layer after the
     target is levelled; deeper levels are useless for shortest paths).
  2. BLOCKING-FLOW WAVE ROUNDS on the fixed level graph, each round:
     a. admissible arcs: ``level(v) == level(u) + 1``, ``res > tol``
        (residuals re-read from the pair state — within-phase reverse
        arcs point level-down and are ignored, as in classic Dinic);
     b. prune to arcs whose head can still reach the target (reverse
        frontier BFS over admissible arcs) — the distributed analogue of
        the reference's DFS retreat/edge deletion: after the prune every
        kept non-target node has a kept out-arc, so every chain from the
        source reaches the target (levels strictly increase => acyclic);
     c. every node picks its min-dst kept out-arc ("chosen"); the source
        pushes on ALL its kept out-arcs, so many paths augment per round;
     d. FORWARD WAVE (one tiny job per level): tentative push
        ``p(u) = min(inflow(u), res(chosen(u)))`` accumulates level by
        level toward the target;
     e. BACKWARD WAVE (one job per level): the target accepts everything
        that arrived; each node allocates its accepted amount back across
        its in-pushes in deterministic ascending-src order via a window
        cumulative sum (the same conflict-free allocation trick as the
        push-relabel kernel) — the accepted per-arc amounts are a
        feasible, conserving augmentation;
     f. apply the signed per-pair flow deltas with one aggregated join.
     Every round adds ``> tol`` flow and saturates at least one kept arc
     (if no downstream clip binds, the source arcs themselves saturate),
     so rounds/phase <= #admissible arcs; the loop exits exactly when no
     s->t path remains in the level graph, i.e. the flow is blocking, so
     the classic phase bound (<= n phases, shortest-path length strictly
     increases) holds.

Outputs match the reference contract exactly: ``getMaxFlow`` == the max
flow value (any max flow is THE max flow value). Scale note: s-t max flow
is the hardest primitive here to distribute; this kernel costs
O(phases * rounds * depth) small supersteps and is the API-parity /
cross-check twin. The batched multi-instance push-relabel in
``operators/flow.py`` remains the 100 TB path (it amortizes superstep
floors across k instances); the two are asserted equal in tests.

State layout (shared with flow.py): one row per unordered node pair
``(lo, hi, cap_fw, cap_bw, flow)``; residual fw = cap_fw - flow,
bw = cap_bw + flow, so an augmentation and its implicit reverse-arc
update are a single signed delta.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.operators.flow import _pairs_from_arcs
from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage

ABSOLUTE_TOLERANCE = 1e-15   # Dinic.hpp:62
RELATIVE_TOLERANCE = 1e-12   # Dinic.hpp:61


@dataclass
class DinicResult:
    value: float
    flow_df: DataFrame        # (u, v, flow) net positive flow per arc
    source_set_df: DataFrame  # (node) residual-reachable from s (min cut)
    phases: int
    converged: bool


def _residual(pairs: DataFrame, tol: float) -> DataFrame:
    fw = pairs.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"),
        (F.col("cap_fw") - F.col("flow")).alias("res"),
    )
    bw = pairs.select(
        F.col("hi").alias("u"), F.col("lo").alias("v"),
        (F.col("cap_bw") + F.col("flow")).alias("res"),
    )
    return fw.union(bw).filter(F.col("res") > tol)


def _bfs_levels(res_arcs: DataFrame, start: int, target: int | None,
                max_depth: int) -> DataFrame:
    """(node, level) exact BFS levels from ``start`` over ``res_arcs``.
    Stops after completing the layer that contains ``target``."""
    spark = res_arcs.sparkSession
    frontier = truncate_lineage(
        spark.range(1).select(
            F.lit(int(start)).cast("long").alias("node"),
            F.lit(0).alias("level"),
        )
    )
    layers = [frontier]
    hit = target is not None and int(start) == int(target)
    for d in range(1, max_depth + 1):
        if hit:
            break
        seen = layers[0].select("node")
        for l in layers[1:]:
            seen = seen.union(l.select("node"))
        nxt = (
            res_arcs.join(frontier.select(F.col("node").alias("u")), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .withColumn("level", F.lit(d))
        )
        nxt = truncate_lineage(nxt)
        rows = nxt.limit(1).count()
        if rows == 0:
            break
        if target is not None and nxt.filter(F.col("node") == int(target)).limit(1).count() > 0:
            hit = True
        layers.append(nxt)
        frontier = nxt
    out = layers[0]
    for l in layers[1:]:
        out = out.union(l)
    return out


def _reverse_reach(adm: DataFrame, target: int, max_depth: int) -> DataFrame:
    """(node) set that can reach ``target`` along admissible arcs."""
    spark = adm.sparkSession
    frontier = truncate_lineage(
        spark.range(1).select(F.lit(int(target)).cast("long").alias("node"))
    )
    layers = [frontier]
    for _ in range(max_depth):
        seen = layers[0]
        for l in layers[1:]:
            seen = seen.union(l)
        nxt = (
            adm.join(frontier.select(F.col("node").alias("v")), "v")
            .select(F.col("u").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
        )
        nxt = truncate_lineage(nxt)
        if nxt.limit(1).count() == 0:
            break
        layers.append(nxt)
        frontier = nxt
    out = layers[0]
    for l in layers[1:]:
        out = out.union(l)
    return out


def _blocking_round(pairs: DataFrame, levels: DataFrame, s: int, t: int,
                    lt: int, tol: float):
    """One wave round on the fixed level graph. Returns
    (arc_flows (u,v,flow) or None if no s->t path remains, pushed_value)."""
    res = _residual(pairs, tol)
    lv_u = levels.select(F.col("node").alias("u"), F.col("level").alias("lu"))
    lv_v = levels.select(F.col("node").alias("v"), F.col("level").alias("lv"))
    adm = (
        res.join(lv_u, "u").join(lv_v, "v")
        .filter((F.col("lv") == F.col("lu") + 1) & (F.col("lv") <= lt))
        .select("u", "v", "res", "lu")
    )
    adm = truncate_lineage(adm)
    reach = _reverse_reach(adm.select("u", "v"), t, lt)
    kept = adm.join(reach.select(F.col("node").alias("v")), "v")
    kept = truncate_lineage(kept.select("u", "v", "res", "lu"))
    # chosen arc per node: min dst (deterministic); the source keeps ALL arcs
    w = Window.partitionBy("u").orderBy("v")
    chosen = (
        kept.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) | (F.col("u") == int(s)))
        .select("u", "v", "res", "lu")
    )
    chosen = truncate_lineage(chosen)
    src_arcs = chosen.filter(F.col("u") == int(s))
    if src_arcs.limit(1).count() == 0:
        return None, 0.0

    # forward wave: inflow per (node) and tentative per-arc push per level
    big = float("inf")
    inflow = src_arcs.sparkSession.range(1).select(
        F.lit(int(s)).cast("long").alias("node"), F.lit(big).alias("amt")
    )
    arc_push = []  # per-level DataFrames (u, v, p)
    for l in range(lt):
        lev_arcs = chosen.filter(F.col("lu") == l)
        pushes = (
            lev_arcs.join(inflow.select(F.col("node").alias("u"), "amt"), "u")
            .select("u", "v", F.least(F.col("amt"), F.col("res")).alias("p"))
            .filter(F.col("p") > tol)
        )
        pushes = truncate_lineage(pushes)
        arc_push.append(pushes)
        inflow = pushes.groupBy(F.col("v").alias("node")).agg(F.sum("p").alias("amt"))
        if inflow.limit(1).count() == 0:
            return None, 0.0

    # backward wave: target accepts all arrivals; allocate per in-arc by
    # ascending src with a cumulative-sum clamp, level by level back
    accepted = inflow.filter(F.col("node") == int(t)) \
        .select(F.col("node").alias("v"), F.col("amt").alias("acc"))
    arrived = accepted.collect()
    if not arrived or arrived[0].acc <= tol:
        return None, 0.0
    flows = []
    for l in range(lt - 1, -1, -1):
        pushes = arc_push[l]
        wv = Window.partitionBy("v").orderBy("u")
        alloc = (
            pushes.join(accepted, "v")
            .withColumn("before", F.coalesce(
                F.sum("p").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0)))
            .withColumn("flow", F.greatest(
                F.lit(0.0),
                F.least(F.col("p"), F.col("acc") - F.col("before"))))
            .filter(F.col("flow") > tol)
            .select("u", "v", "flow")
        )
        alloc = truncate_lineage(alloc)
        flows.append(alloc)
        accepted = alloc.groupBy(F.col("u").alias("v")).agg(F.sum("flow").alias("acc"))
    total = flows[-1].agg(F.sum("flow")).collect()[0][0] or 0.0
    out = flows[0]
    for fdf in flows[1:]:
        out = out.union(fdf)
    return out, float(total)


def dinic_max_flow(
    arcs: DataFrame,
    s: int,
    t: int,
    max_phases: int | None = None,
    max_depth: int | None = None,
) -> DinicResult:
    """Exact max s-t flow via distributed Dinic phases.

    ``arcs``: directed (src, dst, capacity >= 0). Raises on s == t,
    matching ``Dinic.cpp:22-26``. Returns the flow value, a feasible
    per-arc flow assignment, and the residual source set (min cut side).
    """
    if int(s) == int(t):
        raise ValueError("Dinic requires source != target")
    spark = arcs.sparkSession
    neg = arcs.filter(F.col("capacity") < 0).limit(1).count()
    if neg:
        raise ValueError("Dinic requires non-negative capacities")
    with aqe_disabled(spark):
        pairs = truncate_lineage(
            _pairs_from_arcs(arcs).withColumn("flow", F.lit(0.0))
        )
        stats = pairs.agg(
            F.max(F.greatest("cap_fw", "cap_bw")).alias("mx"),
            (F.countDistinct("lo") + F.countDistinct("hi")).alias("nn"),
        ).collect()[0]
        if stats.mx is None:
            empty_f = spark.createDataFrame([], "u long, v long, flow double")
            src = spark.range(1).select(F.lit(int(s)).cast("long").alias("node"))
            return DinicResult(0.0, empty_f, src, 0, True)
        tol = max(ABSOLUTE_TOLERANCE, RELATIVE_TOLERANCE * float(stats.mx))
        n_bound = int(stats.nn) + 2
        depth_cap = int(max_depth) if max_depth is not None else n_bound
        phase_cap = int(max_phases) if max_phases is not None else n_bound
        value = 0.0
        phases = 0
        converged = False
        for _ in range(phase_cap):
            res = _residual(pairs, tol)
            levels = _bfs_levels(res, int(s), int(t), depth_cap)
            lt_row = levels.filter(F.col("node") == int(t)).collect()
            if not lt_row:
                converged = True
                break
            lt = int(lt_row[0].level)
            phases += 1
            phase_flow = 0.0
            # rounds <= #admissible arcs; generous explicit cap as backstop
            for _ in range(10 * n_bound * n_bound):
                arc_flows, pushed = _blocking_round(pairs, levels, int(s),
                                                    int(t), lt, tol)
                if arc_flows is None or pushed <= tol:
                    break
                deltas = (
                    arc_flows.select(
                        F.least("u", "v").alias("lo"),
                        F.greatest("u", "v").alias("hi"),
                        F.when(F.col("u") < F.col("v"), F.col("flow"))
                        .otherwise(-F.col("flow")).alias("d"),
                    )
                    .groupBy("lo", "hi").agg(F.sum("d").alias("d"))
                )
                pairs = truncate_lineage(
                    pairs.join(deltas, ["lo", "hi"], "left")
                    .select(
                        "lo", "hi", "cap_fw", "cap_bw",
                        (F.col("flow") + F.coalesce(F.col("d"), F.lit(0.0)))
                        .alias("flow"),
                    )
                )
                phase_flow += pushed
            value += phase_flow
            if phase_flow <= tol:      # Dinic.cpp:131-133
                converged = True
                break
        flow_df = (
            pairs.select(
                F.col("lo").alias("u"), F.col("hi").alias("v"),
                F.greatest(F.col("flow"), F.lit(0.0)).alias("flow"),
            )
            .union(
                pairs.select(
                    F.col("hi").alias("u"), F.col("lo").alias("v"),
                    F.greatest(-F.col("flow"), F.lit(0.0)).alias("flow"),
                )
            )
            .filter(F.col("flow") > 1e-12)
        )
        res = _residual(pairs, tol)
        source_set = _bfs_levels(res, int(s), None, n_bound).select("node")
        return DinicResult(
            value=float(value),
            flow_df=flow_df,
            source_set_df=source_set,
            phases=phases,
            converged=converged,
        )
