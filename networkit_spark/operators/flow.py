"""Distributed max flow / min cut — synchronous parallel push-relabel.

Reference: ``cpp/flow/EdmondsKarp.cpp`` (``networkit/flow.pyx``) — BFS
augmenting paths, inherently sequential (each augmentation depends on the
previous residual graph). The parallel classic with the same outputs (flow
value, per-edge flows via ``getFlow``, source-side min cut via
``getSourceSet``) is Goldberg-Tarjan push-relabel, whose push and relabel
steps are per-node-local and therefore batchable:

every superstep, ALL active nodes (excess > 0) in parallel
  1. push: saturate admissible residual arcs (height(u) == height(v)+1)
     in deterministic arc order until the excess is spent — per-node
     allocation is a window cumulative-sum over the node's arcs (no Python),
  2. relabel: nodes that had excess but no admissible arc lift to
     1 + min(height over positive-residual out-arcs),
and the flow/excess updates are two hash aggregations. Heights only grow
(<= 2n), excess at t only grows => standard O(V^2 E) termination bound; a
periodic GLOBAL RELABEL (exact reverse-BFS distances to t, then to s, over
the residual graph — the heuristic every practical implementation uses)
keeps real round counts near the residual-graph diameter.

The kernel is MULTI-INSTANCE: it solves k independent (s_i, t) flow
problems on the SAME graph in one superstep loop by carrying a ``run``
column (run id == that instance's source node) through the pair/state
tables — k small flows cost one loop of slightly wider supersteps instead
of k loops, amortizing the per-superstep scheduling floor that dominates
distributed iterative jobs. This is what makes CutClustering (n min-cuts
on one augmented graph) tractable: batch the sources, replicate the edge
state per run (memory = batch x |E| rows — choose the batch so it fits
the cluster's shuffle capacity), share every BFS/relabel superstep.

State layout: one row per (run, unordered node pair) holding both directed
capacities and the NET flow (positive = lo->hi), so a push and its reverse
cancel arithmetically and each superstep updates flow with one aggregated
join — no per-arc locking, matching how parallel push-relabel resolves
write conflicts by summing signed deltas.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage


@dataclass
class FlowResult:
    value: float
    flow_df: DataFrame     # (u, v, flow) positive flow on original arcs
    source_set_df: DataFrame  # (node) residual-reachable from s (min cut side)
    iterations: int
    converged: bool


@dataclass
class MultiFlowResult:
    values_df: DataFrame       # (run, value) max-flow value per instance
    source_sets_df: DataFrame  # (run, node) residual-reachable from s_run
    pairs_df: DataFrame        # (run, lo, hi, cap_fw, cap_bw, flow)
    iterations: int
    converged: bool


def _pairs_from_arcs(arcs: DataFrame) -> DataFrame:
    """(lo, hi, cap_fw, cap_bw): merge parallel arcs; cap_fw = lo->hi."""
    canon = arcs.select(
        F.least("src", "dst").alias("lo"),
        F.greatest("src", "dst").alias("hi"),
        F.when(F.col("src") < F.col("dst"), F.col("capacity")).otherwise(F.lit(0.0)).alias("cfw"),
        F.when(F.col("src") > F.col("dst"), F.col("capacity")).otherwise(F.lit(0.0)).alias("cbw"),
    ).filter(F.col("lo") != F.col("hi"))
    return canon.groupBy("lo", "hi").agg(
        F.sum("cfw").alias("cap_fw"), F.sum("cbw").alias("cap_bw")
    )


def _residual_arcs(pairs: DataFrame) -> DataFrame:
    """Explode pair state to directed residual arcs (run, u, v, res)."""
    fw = pairs.select(
        "run", F.col("lo").alias("u"), F.col("hi").alias("v"),
        (F.col("cap_fw") - F.col("flow")).alias("res"),
    )
    bw = pairs.select(
        "run", F.col("hi").alias("u"), F.col("lo").alias("v"),
        (F.col("cap_bw") + F.col("flow")).alias("res"),
    )
    return fw.union(bw).filter(F.col("res") > 1e-12)


def _bfs_heights2(res_arcs: DataFrame, runs_df: DataFrame, t: int,
                  max_depth: int) -> DataFrame:
    """Exact distance to BOTH endpoints (t, and each run's source s_run)
    along residual arcs in ONE frontier sweep across ALL runs (u->v usable
    means u is one hop farther from the target than v, so we traverse arcs
    backwards from each target). Returns (run, node, dt, ds) with NULL for
    unreachable — one fused BFS loop instead of 2k separate ones; the
    per-hop driver round-trips dominate global-relabel cost.

    Frontiers are checkpointed per hop but unioned ONCE at the end: each hop
    is a LogicalRDD leaf, so the accumulated plan is O(1) deep / O(hops)
    wide instead of re-checkpointing the growing union every hop."""
    frontier = truncate_lineage(
        runs_df.select("run", F.lit(int(t)).alias("node"),
                       F.lit(0).alias("src"), F.lit(0).alias("dist"))
        .union(
            runs_df.select("run", F.col("run").alias("node"),
                           F.lit(1).alias("src"), F.lit(0).alias("dist"))
        )
    )
    layers = [frontier]
    for d in range(1, max_depth + 1):
        seen = layers[0].select("run", "node", "src")
        for l in layers[1:]:
            seen = seen.union(l.select("run", "node", "src"))
        nxt = (
            res_arcs.join(
                frontier.select("run", F.col("node").alias("v"), "src"),
                ["run", "v"],
            )
            .select("run", F.col("u").alias("node"), "src")
            .distinct()
            .join(seen, ["run", "node", "src"], "left_anti")
            .withColumn("dist", F.lit(d))
        )
        nxt = truncate_lineage(nxt)
        if nxt.limit(1).count() == 0:
            break
        layers.append(nxt)
        frontier = nxt
    dist = layers[0]
    for l in layers[1:]:
        dist = dist.union(l)
    return (
        dist.groupBy("run", "node")
        .agg(
            F.min(F.when(F.col("src") == 0, F.col("dist"))).alias("dt"),
            F.min(F.when(F.col("src") == 1, F.col("dist"))).alias("ds"),
        )
    )


def max_flow(
    arcs: DataFrame,
    s: int,
    t: int,
    max_rounds: int = 500,
    relabel_every: int = 8,
) -> FlowResult:
    """Max s-t flow of the directed capacitated graph ``arcs``
    (src, dst, capacity). EdmondsKarp API parity: ``value`` (gain),
    ``flow_df`` (getFlow), ``source_set_df`` (getSourceSet)."""
    spark = arcs.sparkSession
    with aqe_disabled(spark):
        multi = _push_relabel_multi(arcs, [int(s)], int(t), max_rounds,
                                    relabel_every)
        vr = multi.values_df.collect()
        value = float(vr[0].value) if vr else 0.0
        pairs = multi.pairs_df
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
        return FlowResult(
            value=value,
            flow_df=flow_df,
            source_set_df=multi.source_sets_df.select("node"),
            iterations=multi.iterations,
            converged=multi.converged,
        )


def max_flow_multi(
    arcs: DataFrame,
    sources: list[int],
    t: int,
    max_rounds: int = 500,
    relabel_every: int = 8,
) -> MultiFlowResult:
    """k independent max s_i-t flows on the same graph, one superstep loop.
    ``run`` id == source node id. Returns per-run values + minimal
    source-side min-cut sets (residual-reachable from s_run)."""
    spark = arcs.sparkSession
    with aqe_disabled(spark):
        return _push_relabel_multi(
            arcs, [int(s) for s in sources], int(t), max_rounds, relabel_every
        )


def _push_relabel_multi(arcs, sources, t, max_rounds, relabel_every):
    spark = arcs.sparkSession
    pairs0 = _pairs_from_arcs(arcs)
    node_ids = (
        pairs0.select(F.col("lo").alias("node"))
        .union(pairs0.select(F.col("hi").alias("node")))
        .distinct()
    )
    n = node_ids.count()
    runs_df = truncate_lineage(
        spark.createDataFrame([(int(s),) for s in sources], "run long")
    )
    # initial preflow per run: saturate the run's source out-arcs
    pairs = runs_df.crossJoin(pairs0).withColumn(
        "flow",
        F.when(F.col("lo") == F.col("run"), F.col("cap_fw"))
        .when(F.col("hi") == F.col("run"), -F.col("cap_bw"))
        .otherwise(F.lit(0.0)),
    )
    pairs = truncate_lineage(pairs)
    # excess from the preflow; heights: s_run at n, rest 0 (global relabel fixes)
    ex0 = (
        _signed_outflow(pairs)
        .groupBy("run", "node")
        .agg((-F.sum("out")).alias("ex"))
    )
    state = (
        runs_df.crossJoin(node_ids)
        .join(ex0, ["run", "node"], "left")
        .select(
            "run", "node",
            F.when(F.col("node") == F.col("run"), F.lit(n))
            .otherwise(F.lit(0)).cast("int").alias("h"),
            F.coalesce("ex", F.lit(0.0)).alias("ex"),
        )
    )
    state = truncate_lineage(state)
    rounds = 0
    converged = False
    for rnd in range(max_rounds):
        rounds = rnd + 1
        if rnd % relabel_every == 0:
            state = _global_relabel(pairs, state, node_ids, runs_df, t, n)
        active = state.filter(
            (F.col("ex") > 1e-12) & (F.col("node") != F.col("run"))
            & (F.col("node") != t) & (F.col("h") < 2 * n)
        )
        n_active = active.limit(1).count()
        if n_active == 0:
            converged = True
            break
        res = _residual_arcs(pairs)
        adm = (
            res.join(active.select("run", F.col("node").alias("u"), "ex",
                                   F.col("h").alias("hu")), ["run", "u"])
            .join(state.select("run", F.col("node").alias("v"),
                               F.col("h").alias("hv")), ["run", "v"])
            .filter(F.col("hu") == F.col("hv") + 1)
        )
        # deterministic per-node excess allocation: cumsum over (v asc)
        wsp = Window.partitionBy("run", "u").orderBy("v")
        pushes = (
            adm.withColumn("cum", F.sum("res").over(wsp))
            .withColumn(
                "amt",
                F.greatest(
                    F.lit(0.0),
                    F.least(F.col("res"), F.col("ex") - (F.col("cum") - F.col("res"))),
                ),
            )
            .filter(F.col("amt") > 1e-12)
            .select("run", "u", "v", "amt")
        )
        pushes = truncate_lineage(pushes)
        # signed flow deltas on canonical pairs
        deltas = (
            pushes.select(
                "run",
                F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi"),
                F.when(F.col("u") < F.col("v"), F.col("amt")).otherwise(-F.col("amt")).alias("d"),
            )
            .groupBy("run", "lo", "hi").agg(F.sum("d").alias("d"))
        )
        pairs = truncate_lineage(
            pairs.join(deltas, ["run", "lo", "hi"], "left")
            .select("run", "lo", "hi", "cap_fw", "cap_bw",
                    (F.col("flow") + F.coalesce("d", F.lit(0.0))).alias("flow"))
        )
        # excess updates: out minus in per node
        exd = (
            pushes.select("run", F.col("u").alias("node"), (-F.col("amt")).alias("d"))
            .union(pushes.select("run", F.col("v").alias("node"), F.col("amt").alias("d")))
            .groupBy("run", "node").agg(F.sum("d").alias("d"))
        )
        # relabel: active nodes with NO admissible arc lift to 1+min nbr h
        lift = (
            active.join(pushes.select("run", F.col("u").alias("node")).distinct(),
                        ["run", "node"], "left_anti")
            .select("run", F.col("node").alias("u"), F.col("h"))
            .join(res, ["run", "u"])
            .join(state.select("run", F.col("node").alias("v"),
                               F.col("h").alias("hv")), ["run", "v"])
            .groupBy("run", F.col("u").alias("node"))
            .agg((F.min("hv") + 1).alias("newh"))
        )
        state = truncate_lineage(
            state.join(exd, ["run", "node"], "left")
            .join(lift, ["run", "node"], "left")
            .select(
                "run", "node",
                F.least(
                    F.greatest(F.coalesce("newh", "h"), F.col("h")),
                    F.lit(2 * n),
                ).cast("int").alias("h"),
                (F.col("ex") + F.coalesce("d", F.lit(0.0))).alias("ex"),
            )
        )
    values_df = (
        state.filter(F.col("node") == t)
        .select("run", F.col("ex").alias("value"))
    )
    # source side of each run's min cut: residual-reachable from s_run
    res = _residual_arcs(pairs)
    frontier = truncate_lineage(
        runs_df.select("run", F.col("run").alias("node"))
    )
    layers = [frontier]
    for _ in range(n):
        seen = layers[0]
        for l in layers[1:]:
            seen = seen.union(l)
        nxt = (
            res.join(frontier.select("run", F.col("node").alias("u")),
                     ["run", "u"])
            .select("run", F.col("v").alias("node")).distinct()
            .join(seen, ["run", "node"], "left_anti")
        )
        nxt = truncate_lineage(nxt)
        if nxt.limit(1).count() == 0:
            break
        layers.append(nxt)
        frontier = nxt
    reach = layers[0]
    for l in layers[1:]:
        reach = reach.union(l)
    return MultiFlowResult(
        values_df=values_df, source_sets_df=reach, pairs_df=pairs,
        iterations=rounds, converged=converged,
    )


def _signed_outflow(pairs: DataFrame) -> DataFrame:
    """(run, node, out) net flow leaving node from the pair state."""
    return (
        pairs.select("run", F.col("lo").alias("node"), F.col("flow").alias("out"))
        .union(pairs.select("run", F.col("hi").alias("node"), (-F.col("flow")).alias("out")))
    )


def _global_relabel(pairs, state, node_ids, runs_df, t, n):
    """Exact heights: dist-to-t over residual arcs; unreachable nodes get
    n + dist-to-s (they can only return excess to s). s pinned at n."""
    res = _residual_arcs(pairs)
    d2 = _bfs_heights2(res, runs_df, t, n)
    new_h = (
        runs_df.crossJoin(node_ids)
        .join(d2, ["run", "node"], "left")
        .select(
            "run", "node",
            F.when(F.col("node") == F.col("run"), F.lit(n))
            .when(F.col("dt").isNotNull(), F.col("dt"))
            .when(F.col("ds").isNotNull(), F.lit(n) + F.col("ds"))
            .otherwise(F.lit(2 * n))
            .cast("int").alias("gh"),
        )
    )
    out = (
        state.join(new_h, ["run", "node"])
        # heights must never decrease (push-relabel invariant)
        .select("run", "node", F.greatest("h", "gh").alias("h"), "ex")
    )
    return truncate_lineage(out)
