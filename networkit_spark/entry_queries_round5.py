"""Round-5 gate queries: the KADABRA fixed-epoch oracle twin.

Round-4 verdict item 6: the adaptive ``kadabra_betweenness`` is rows-only
because its stopping rule is data-dependent; everything else — the pilot
phase, the delta-allocation binary search, the epoch sampling engine, and
the per-node f/g Chernoff bounds of the convergence check
(``KadabraBetweenness.cpp:87-104,173-228,305-380,447-479``) — is
deterministic given pinned epoch sizes, so this module unrolls ALL of it in
DuckDB SQL against :func:`networkit_spark.operators.kadabra.
kadabra_fixed_epochs` and shrinks the rows-only set by one.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.entry_queries_round4 import _kadabra_sidhits_parts
from networkit_spark.graph import nodes_range
from networkit_spark.testgraph import doc_edges_undirected

_BALANCING = 0.001  # KadabraBetweenness.cpp:175


def _kadabra_fixed_oracle_sql(
    tau: int,
    batch_sizes: tuple[int, ...],
    seed: int,
    vd: int,
    err: float,
    delta: float,
    guess_iters: int,
    rounds: int = 8,
) -> str:
    """SQL replay of the full fixed-epoch KADABRA run: sid-hits for every
    sample (shared machinery with the pilot twin), pilot bet = hits/tau for
    sids < tau, the delta-guess binary search unrolled for EXACTLY
    ``guess_iters`` halvings (scalar (a, b) state CTE per round, the sum
    term re-aggregated from bet each round), dl = exp(-b err^2 / bet) +
    floor, epoch apx = hits for sids >= tau, and the closed-form f/g
    Chernoff columns at t = sum(batch_sizes). Every float expression
    mirrors the engine's evaluation order; omega and tmp constants are
    Python-folded exactly as the engine folds them into literals."""
    total = tau + sum(batch_sizes)
    t = sum(batch_sizes)
    bf = _BALANCING
    e2 = err * err
    diam_ub = max(vd - 1, 2)
    omega = (
        0.5 / err / err * (math.log2(max(diam_ub - 1, 1)) + 1 + math.log(0.5 / delta))
    )
    target = delta / 2.0 * (1 - bf)
    tmp_f = omega / t - 1.0 / 3.0  # _f_col's tmp, folded like F.lit does
    tmp_g = omega / t + 1.0 / 3.0
    mult = 2.0 / t  # undirected

    parts = _kadabra_sidhits_parts(total, seed, rounds)
    parts.append(
        f"""
, bet AS MATERIALIZED (
    SELECT d.doc_id AS node, coalesce(h.c, 0)::DOUBLE / {tau} AS bet
    FROM documents d LEFT JOIN (
        SELECT node, count(*) AS c FROM sidhits WHERE sid < {tau} GROUP BY node
    ) h ON d.doc_id = h.node)
, g0 AS (SELECT CAST(0.0 AS DOUBLE) AS a,
                (1.0 / {err!r} / {err!r}) * ln(n * 4 * {(1 - bf)!r} / {delta!r}) AS b
         FROM nn)"""
    )
    for k in range(1, guess_iters + 1):
        parts.append(
            f""", g{k} AS MATERIALIZED (
    SELECT CASE WHEN s.s >= {target!r} THEN (g.a + g.b) / 2 ELSE g.a END AS a,
           CASE WHEN s.s >= {target!r} THEN g.b ELSE (g.a + g.b) / 2 END AS b
    FROM g{k - 1} g CROSS JOIN (
        SELECT coalesce(sum(CASE WHEN b2.bet > 0
            THEN 2.0 * exp(-((p.a + p.b) / 2) * {e2!r} / b2.bet)
            ELSE 0.0 END), 0.0) AS s
        FROM bet b2 CROSS JOIN g{k - 1} p) s)"""
        )
    parts.append(
        f"""
, guess AS MATERIALIZED (
    SELECT b.node,
           (CASE WHEN b.bet > 0 THEN exp(-g.b * {e2!r} / b.bet) ELSE 0.0 END
            + {delta!r} * {bf!r} / 4.0 / nn.n) AS dl
    FROM bet b CROSS JOIN g{guess_iters} g CROSS JOIN nn)
, apx AS (
    SELECT d.doc_id AS node, coalesce(h.c, 0) AS apx
    FROM documents d LEFT JOIN (
        SELECT node, count(*) AS c FROM sidhits WHERE sid >= {tau} GROUP BY node
    ) h ON d.doc_id = h.node)
SELECT a.node,
       round(a.apx * {mult!r}, 6) AS score,
       round(least(
           (-ln(g.dl)) / {float(t)!r}
             * (-({tmp_f!r}) + sqrt({tmp_f!r} * {tmp_f!r}
                 + 2.0 * (a.apx / {float(t)!r}) * {omega!r} / (-ln(g.dl)))),
           a.apx / {float(t)!r}), 6) AS f,
       round(least(
           (-ln(g.dl)) / {float(t)!r}
             * (({tmp_g!r}) + sqrt({tmp_g!r} * {tmp_g!r}
                 + 2.0 * (a.apx / {float(t)!r}) * {omega!r} / (-ln(g.dl)))),
           1.0 - a.apx / {float(t)!r}), 6) AS g
FROM apx a JOIN guess g ON a.node = g.node"""
    )
    return "\n".join(parts)


_K5 = dict(err=0.05, delta=0.1, tau=64, batch_sizes=(64, 128), vd=16, seed=11,
           delta_guess_iters=24)


@register(
    "kadabra_two_epochs",
    _kadabra_fixed_oracle_sql(
        _K5["tau"], _K5["batch_sizes"], _K5["seed"], _K5["vd"], _K5["err"],
        _K5["delta"], _K5["delta_guess_iters"],
    ),
)
def q_kadabra_two_epochs(spark, sf_dir):
    """Fixed-two-epoch KADABRA (pilot tau=64 -> delta guess, 24 halvings ->
    epochs of 64 + 128 samples -> f/g Chernoff columns) — the adaptive
    algorithm with its only data-dependent branch pinned, fully replayed by
    the oracle. Pins the epoch accumulation + convergence-check arithmetic
    the rows-only adaptive query iterates."""
    from networkit_spark.operators.kadabra import kadabra_fixed_epochs

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    out = kadabra_fixed_epochs(e, nodes_range(spark, n), **_K5)
    return out.select(
        "node",
        F.round("score", 6).alias("score"),
        F.round("f", 6).alias("f"),
        F.round("g", 6).alias("g"),
    )
