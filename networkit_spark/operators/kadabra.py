"""KADABRA adaptive-sampling betweenness (absolute mode).

Reference: ``cpp/centrality/KadabraBetweenness.cpp`` (Borassi-Natale 2016,
parallel variant van der Grinten et al. Euro-Par 2019). Public algorithm:

1. ``omega = 0.5/err^2 * (log2(diam_ub - 1) + 1 + ln(0.5/delta))`` is the
   worst-case sample bound (``KadabraBetweenness.cpp:305-311``);
   ``tau = omega / startFactor`` pilot samples estimate per-node
   betweenness for the delta-allocation phase.
2. ``computeDeltaGuess`` (``:173-228``): binary-search the Chernoff budget
   ``c`` so the summed per-node failure probabilities fit ``delta``, then
   give every node its own ``delta_L/delta_U`` guess. In absolute mode
   (k = 0, the default — approximate EVERY node within ``err``) the
   per-node error targets are all ``err`` (``computeBetErr:138-142``).
3. Adaptive main loop: keep sampling random node pairs and ONE uniformly
   random shortest path per pair (interior nodes get +1); after each epoch
   check the per-node Chernoff bounds ``f``/``g``
   (``computeF/computeG:87-104``) and stop when every node satisfies
   ``f < err && g < err``, or when ``nPairs >= omega``
   (``checkConvergence:447-479``).
4. Scores: ``apx/nPairs`` (x2 for undirected, ``run():428-433``).

Distributed shape (this is NOT a port of the lock-free epoch machinery —
that solves a shared-memory synchronization problem Spark doesn't have):

- pair sampling + path sampling reuse the batched RK machinery
  (:mod:`approx_betweenness`): per epoch ONE multi-source Brandes BFS over
  the batch's distinct sources and one backward sigma-weighted walk for
  all samples simultaneously — no per-sample jobs.
- the reference's per-thread epoch frames become literal sample batches;
  batch size grows geometrically (``batch_growth``) so the number of
  convergence checks is O(log(omega/tau)) — the distributed analog of
  "itersPerStep per thread between checks".
- the convergence check is one JVM-side aggregation over the accumulated
  per-node counts (f/g are closed-form column expressions); the
  delta-guess binary search is ~30 tiny aggregations on a persisted
  per-node DataFrame. Nothing per-node ever reaches the driver.
- diameter upper bound: the reference runs ``Diameter ESTIMATED_RANGE``;
  we reuse the pedantic vertex-diameter estimate already pinned by the
  RK tests (conservative upper bound -> never fewer samples than the
  guarantee needs; documented divergence).

Determinism: portable LCG streams keyed by global sample id, so a given
(seed, graph) always produces the same scores regardless of parallelism —
the semantics of the reference's ``deterministic=true`` mode
(``KadabraBetweenness.hpp:114-116``) by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.operators.approx_betweenness import (
    path_sample_hits,
    sample_pairs,
    vertex_diameter_pedantic,
)
from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage

_BALANCING = 0.001  # KadabraBetweenness.cpp:175 balancingFactor


def _accumulate(apx: DataFrame, hits: DataFrame) -> DataFrame:
    """apx(node, apx) += hits(node, hits); keeps one row per node."""
    return truncate_lineage(
        apx.join(hits, "node", "left").select(
            "node",
            (F.col("apx") + F.coalesce(F.col("hits"), F.lit(0))).alias("apx"),
        )
    )


def _delta_guess(
    bet: DataFrame, n: int, err: float, delta: float,
    iters: int | None = None,
) -> tuple[DataFrame, float]:
    """Absolute-mode ``computeDeltaGuess`` (KadabraBetweenness.cpp:173-228):
    binary-search ``c`` in [0, (1/err^2) ln(4n(1-bf)/delta)] until the total
    failure mass sum_v 2*exp(-c*err^2/bet_v) drops below delta/2*(1-bf)
    (absolute mode: errL = errU = err for every node, so the L and U terms
    coincide; unionSample = n, so the tail terms vanish). Returns
    (guess(node, dl, du), b) — dl == du in absolute mode but both are kept
    for shape parity with the reference."""
    bf = _BALANCING
    a, b = 0.0, (1.0 / err / err) * math.log(n * 4 * (1 - bf) / delta)
    target = delta / 2.0 * (1 - bf)
    e2 = err * err
    # exp(-c*err^2/bet) with bet=0 -> exp(-inf) = 0, the C++ semantics.
    # iters pins the halving count (oracle twins unroll EXACTLY this many
    # rounds in SQL); None = the reference's width-threshold loop.
    k = 0
    while (b - a > err / 10.0) if iters is None else (k < iters):
        k += 1
        c = (a + b) / 2.0
        s = bet.agg(
            F.sum(
                F.when(
                    F.col("bet") > 0,
                    2.0 * F.exp(-F.lit(c) * F.lit(e2) / F.col("bet")),
                ).otherwise(F.lit(0.0))
            ).alias("s")
        ).first()["s"]
        if (s or 0.0) >= target:
            a = c
        else:
            b = c
    floor_term = delta * bf / 4.0 / n
    guess = bet.select(
        "node",
        (
            F.when(
                F.col("bet") > 0, F.exp(-F.lit(b) * F.lit(e2) / F.col("bet"))
            ).otherwise(F.lit(0.0))
            + F.lit(floor_term)
        ).alias("dl"),
    ).withColumn("du", F.col("dl"))
    return guess, b


def _f_col(bt, t: int, omega: float, dl):
    """computeF (KadabraBetweenness.cpp:87-94): lower error bound."""
    tmp = F.lit(omega / t - 1.0 / 3.0)
    logd = -F.log(dl)  # log(1/dl)
    chern = (
        logd
        / F.lit(float(t))
        * (-tmp + F.sqrt(tmp * tmp + 2.0 * bt * F.lit(omega) / logd))
    )
    return F.least(chern, bt)


def _g_col(bt, t: int, omega: float, du):
    """computeG (KadabraBetweenness.cpp:98-104): upper error bound."""
    tmp = F.lit(omega / t + 1.0 / 3.0)
    logd = -F.log(du)
    chern = (
        logd
        / F.lit(float(t))
        * (tmp + F.sqrt(tmp * tmp + 2.0 * bt * F.lit(omega) / logd))
    )
    return F.least(chern, 1.0 - bt)


def kadabra_fixed_epochs(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    err: float = 0.05,
    delta: float = 0.1,
    tau: int = 64,
    batch_sizes: tuple[int, ...] = (64, 128),
    vd: int = 16,
    seed: int = 42,
    undirected: bool = True,
    delta_guess_iters: int = 24,
) -> DataFrame:
    """KADABRA with the adaptivity pinned: the pilot phase, the
    delta-allocation binary search (EXACTLY ``delta_guess_iters``
    halvings), and ``len(batch_sizes)`` fixed-size epochs, then the
    per-node f/g Chernoff bounds of the final convergence check — every
    piece of ``kadabra_betweenness`` EXCEPT the data-dependent stopping
    rule, so the whole run is SQL-replayable (gate query
    ``kadabra_two_epochs``). ``vd`` (vertex-diameter upper bound) is a
    pinned parameter for the same reason. Returns
    (node, score, f, g)."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        diam_ub = max(vd - 1, 2)
        omega = (
            0.5
            / err
            / err
            * (math.log2(max(diam_ub - 1, 1)) + 1 + math.log(0.5 / delta))
        )
        from networkit_spark.plans.ids import dense_ids

        nd = (
            dense_ids(nodes.select(F.col("id")), "id", id_col="idx")
            .select("idx", "id")
            .persist()
        )
        n = nd.count()
        node_col = nodes.select(F.col("id").alias("node"))

        pilot = sample_pairs(nd, n, 0, tau, seed)
        pilot_hits = path_sample_hits(edges, pilot, seed)
        bet = (
            node_col.join(pilot_hits, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(tau))).alias(
                    "bet"
                ),
            )
            .persist()
        )
        bet.count()
        guess, _b = _delta_guess(bet, n, err, delta, iters=delta_guess_iters)
        guess = guess.localCheckpoint(eager=True)
        bet.unpersist()

        apx = truncate_lineage(
            node_col.select("node", F.lit(0).cast("long").alias("apx"))
        )
        sid_off = tau
        for bsz in batch_sizes:
            samples = sample_pairs(nd, n, sid_off, bsz, seed)
            sid_off += bsz
            apx = _accumulate(apx, path_sample_hits(edges, samples, seed))
        t = sum(batch_sizes)
        nd.unpersist()
        bt = F.col("apx") / F.lit(float(t))
        mult = (2.0 if undirected else 1.0) / t
        return apx.join(guess, "node").select(
            "node",
            (F.col("apx") * F.lit(mult)).alias("score"),
            _f_col(bt, t, omega, F.col("dl")).alias("f"),
            _g_col(bt, t, omega, F.col("du")).alias("g"),
        )


def kadabra_betweenness(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    err: float = 0.05,
    delta: float = 0.1,
    start_factor: int = 100,
    seed: int = 42,
    undirected: bool = True,
    batch_growth: float = 2.0,
    max_epochs: int = 40,
    vd: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Absolute-mode KADABRA: every node's score within ``err`` of its
    normalized betweenness estimand w.p. >= 1 - ``delta``, using adaptively
    few samples. Returns (node, score); ``stats`` (optional dict) receives
    {"omega", "tau", "n_pairs", "epochs", "delta_guess_b"}.

    Top-k use: ``scores.orderBy(F.desc("score")).limit(k)`` — the reference's
    k > 0 mode only sharpens the stopping rule for ranked output; absolute
    mode dominates it in guarantee (documented scope).
    """
    spark = edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        if vd is None:
            vd = vertex_diameter_pedantic(edges, nodes)
        diam_ub = max(vd - 1, 2)  # vertex diameter -> edge-count diameter UB
        omega = (
            0.5
            / err
            / err
            * (math.log2(max(diam_ub - 1, 1)) + 1 + math.log(0.5 / delta))
        )
        tau = max(int(math.ceil(omega / start_factor)), 1)

        from networkit_spark.plans.ids import dense_ids

        nd = (
            dense_ids(nodes.select(F.col("id")), "id", id_col="idx")
            .select("idx", "id")
            .persist()
        )
        n = nd.count()
        node_col = nodes.select(F.col("id").alias("node"))
        if n < 2:
            nd.unpersist()
            return node_col.withColumn("score", F.lit(0.0))

        # ---- phase 1: tau pilot samples -> per-node delta allocation -----
        pilot = sample_pairs(nd, n, 0, tau, seed)
        pilot_hits = path_sample_hits(edges, pilot, seed)
        bet = (
            node_col.join(pilot_hits, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(tau))).alias(
                    "bet"
                ),
            )
            .persist()
        )
        bet.count()
        guess, b = _delta_guess(bet, n, err, delta)
        guess = guess.persist()
        guess.count()
        bet.unpersist()

        # ---- phase 2: adaptive epochs (apx reset, KadabraBetweenness.cpp:345-346)
        apx = truncate_lineage(
            node_col.select("node", F.lit(0).cast("long").alias("apx"))
        )
        n_pairs = 0
        sid_off = tau  # pilot used sids [0, tau)
        batch = tau
        epochs = 0
        while True:
            batch = min(batch, max(int(math.ceil(omega)) - n_pairs, 1))
            samples = sample_pairs(nd, n, sid_off, batch, seed)
            sid_off += batch
            hits = path_sample_hits(edges, samples, seed)
            apx = _accumulate(apx, hits)
            n_pairs += batch
            epochs += 1
            bt = F.col("apx") / F.lit(float(n_pairs))
            unfinished = (
                apx.join(guess, "node")
                .select(
                    (
                        (_f_col(bt, n_pairs, omega, F.col("dl")) >= err)
                        | (_g_col(bt, n_pairs, omega, F.col("du")) >= err)
                    ).alias("open")
                )
                .filter("open")
                .limit(1)
                .count()
            )
            if unfinished == 0 or n_pairs >= omega or epochs >= max_epochs:
                break
            batch = int(math.ceil(batch * batch_growth))

        mult = (2.0 if undirected else 1.0) / n_pairs
        scores = apx.select(
            "node", (F.col("apx") * F.lit(mult)).alias("score")
        )
        guess.unpersist()
        nd.unpersist()
        if stats is not None:
            stats.update(
                omega=omega,
                tau=tau,
                n_pairs=n_pairs,
                epochs=epochs,
                delta_guess_b=b,
            )
        return scores
