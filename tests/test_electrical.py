"""Electrical family: block-CG Laplacian solves vs numpy pseudoinverse.

Oracles: r(u,v) = (e_u - e_v)^T L^+ (e_u - e_v); on a tree every edge's
spanning centrality = 1; cycle of n: every edge r = (n-1)/n."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.electrical import (
    commute_time,
    effective_resistance,
    effective_resistance_jacobi,
    electrical_closeness,
    spanning_edge_centrality,
)


def _edges_df(spark, pairs):
    df = spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")
    return df.withColumn("weight", F.lit(1.0))


def _lap_pinv(n, pairs):
    L = np.zeros((n, n))
    for a, b in pairs:
        L[a, a] += 1; L[b, b] += 1
        L[a, b] -= 1; L[b, a] -= 1
    return np.linalg.pinv(L)


def _res(Lp, u, v):
    return Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]


def test_effective_resistance_path(spark):
    # path 0-1-2-3-4: r(0,4) = 4 (series), r(1,2) = 1
    pairs = [(i, i + 1) for i in range(4)]
    e = _edges_df(spark, pairs)
    got = {(r["u"], r["v"]): r["resistance"]
           for r in effective_resistance(e, [(0, 4), (1, 2)]).collect()}
    assert got[(0, 4)] == pytest.approx(4.0, abs=1e-6)
    assert got[(1, 2)] == pytest.approx(1.0, abs=1e-6)


def test_effective_resistance_random_graph_vs_pinv(spark):
    rng = np.random.RandomState(7)
    n = 24
    und = set()
    for i in range(1, n):  # spanning tree + extra edges => connected
        und.add((rng.randint(0, i), i))
    for _ in range(30):
        a, b = rng.randint(0, n, 2)
        if a != b:
            und.add((min(a, b), max(a, b)))
    und = sorted(und)
    Lp = _lap_pinv(n, und)
    probe = [(0, n - 1), (3, 7), (1, 2)]
    e = _edges_df(spark, und)
    got = {(r["u"], r["v"]): r["resistance"]
           for r in effective_resistance(e, probe).collect()}
    for u, v in probe:
        assert got[(u, v)] == pytest.approx(_res(Lp, u, v), abs=1e-6)


def test_commute_time_identity(spark):
    # C(u,v) = vol * r(u,v); path of 3 edges: vol = 6, r(0,3)=3 -> 18
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    row = commute_time(e, [(0, 3)]).first()
    assert row["commute_time"] == pytest.approx(18.0, abs=1e-5)


def test_spanning_edge_centrality_tree_is_one(spark):
    # star: every edge is a bridge -> r = 1 exactly; JLT within eps
    e = _edges_df(spark, [(0, i) for i in range(1, 9)])
    out = spanning_edge_centrality(e, eps=0.25, seed=3).collect()
    assert len(out) == 8
    for r in out:
        assert r["score"] == pytest.approx(1.0, rel=0.35)


def test_spanning_edge_centrality_cycle_vs_exact(spark):
    n = 12
    und = [(i, (i + 1) % n) for i in range(n)]
    und = [(min(a, b), max(a, b)) for a, b in und]
    e = _edges_df(spark, und)
    out = spanning_edge_centrality(e, k_override=220, seed=11).collect()
    expect = (n - 1) / n
    mean = sum(r["score"] for r in out) / len(out)
    assert mean == pytest.approx(expect, rel=0.15)
    for r in out:
        assert r["score"] == pytest.approx(expect, rel=0.4)


def test_electrical_closeness_exact_diag(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    n = 4
    Lp = _lap_pinv(n, und)
    tr = np.trace(Lp)
    e = _edges_df(spark, und)
    got = {r["node"]: (r["score"], r["diag"])
           for r in electrical_closeness(e, exact_diag=True).collect()}
    for v in range(n):
        assert got[v][1] == pytest.approx(Lp[v, v], abs=1e-7)
        assert got[v][0] == pytest.approx((n - 1) / (n * Lp[v, v] + tr), abs=1e-6)


def test_electrical_closeness_hutchinson_ranks_star_center(spark):
    # star center has the lowest diag(L^+) -> highest electrical closeness
    e = _edges_df(spark, [(0, i) for i in range(1, 13)])
    got = electrical_closeness(e, k=192, seed=5).collect()
    best = max(got, key=lambda r: r["score"])
    assert best["node"] == 0


def test_jacobi_twin_deterministic_and_signed(spark):
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    a = effective_resistance_jacobi(e, [(0, 2), (1, 3)], iterations=10)
    b = effective_resistance_jacobi(e, [(0, 2), (1, 3)], iterations=10)
    ra = sorted((r["u"], r["v"], round(r["r_est"], 9)) for r in a.collect())
    rb = sorted((r["u"], r["v"], round(r["r_est"], 9)) for r in b.collect())
    assert ra == rb
    # partial sweeps move toward the true value (r = 1 on the 4-cycle diag)
    assert all(0 < x[2] <= 1.2 for x in ra)
