"""KADABRA adaptive-sampling betweenness (absolute mode).

Anchors:
- the reference's own golden scores on looptest1
  (``networkit/test/test_centrality.py:409-424``: [0.0, 0.397, 0.0, 0.0,
  0.896, 0.0, 0.844, 0.395, 0.0], tolerance 0.1) — these pin the estimand
  2*bc_raw/(n(n-1)) including the undirected x2
  (``KadabraBetweenness.cpp:428-433``);
- the accuracy contract of ``CentralityGTest.cpp:1684-1708``: at most
  ceil(delta*n) nodes outside the error bound (here vs the exact estimand,
  the mathematically guaranteed quantity).
"""

import os

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.kadabra import kadabra_betweenness

INPUT = "/root/reference/input"

GOLDEN_LOOPTEST1 = [0.0, 0.397, 0.0, 0.0, 0.896, 0.0, 0.844, 0.395, 0.0]


def _estimand(edges, nodes, n):
    """2 * bc_raw / (n(n-1)) — what absolute-mode KADABRA estimates for an
    undirected graph (verified against the reference's golden scores)."""
    raw = {r["node"]: r["score"] for r in betweenness(edges, nodes).collect()}
    return {v: 2.0 * raw.get(v, 0.0) / (n * (n - 1)) for v in range(n)}


@pytest.mark.skipif(not os.path.isdir(INPUT), reason="fixtures absent")
def test_kadabra_looptest1_golden(spark):
    from networkit_spark.sources.edgelist import read_gml

    _, edges, _ = read_gml(spark, f"{INPUT}/looptest1.gml")
    stats = {}
    scores = kadabra_betweenness(edges, err=0.05, delta=0.1, seed=42, stats=stats)
    got = {r["node"]: r["score"] for r in scores.collect()}
    for v, g in enumerate(GOLDEN_LOOPTEST1):
        assert abs(got.get(v, 0.0) - g) <= 0.1, (v, got.get(v), g)
    # sample accounting: adaptive loop is bounded by omega and actually ran
    assert 0 < stats["n_pairs"] <= stats["omega"] + stats["tau"] * 2
    assert stats["epochs"] >= 1


def test_kadabra_accuracy_contract_star(spark):
    """Star K1,7: center's estimand is (n-1)(n-2)/(n(n-1))*2 = 2(n-2)/n —
    high-signal check of the x2 + normalization chain, with the gtest's
    ceil(delta*n) violation allowance."""
    import math

    n = 8
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, n)]))
    nodes = nodes_range(spark, n)
    exact = _estimand(e, nodes, n)
    assert abs(exact[0] - 2.0 * (n - 2) / n) < 1e-9
    scores = kadabra_betweenness(e, nodes, err=0.1, delta=0.1, seed=42)
    got = {r["node"]: r["score"] for r in scores.collect()}
    # err bounds the PRE-x2 estimate, so the score is within 2*err w.p 1-delta
    violations = sum(1 for v in range(n) if abs(got[v] - exact[v]) > 2 * 0.1)
    assert violations <= math.ceil(0.1 * n)


def test_kadabra_deterministic_and_scale_free_of_parallelism(spark):
    """Same seed -> identical scores (the reference's deterministic=true
    contract, free here because sampling is keyed by global sample id)."""
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3)]))
    nodes = nodes_range(spark, 5)
    s1 = {r["node"]: r["score"] for r in
          kadabra_betweenness(e, nodes, err=0.15, delta=0.2, seed=9).collect()}
    s2 = {r["node"]: r["score"] for r in
          kadabra_betweenness(e, nodes, err=0.15, delta=0.2, seed=9).collect()}
    assert s1 == s2


def test_kadabra_sampling_bounded_by_omega(spark):
    """The adaptive loop never exceeds the worst-case bound: n_pairs <=
    ceil(omega) (the reference stops at nPairs >= omega,
    KadabraBetweenness.cpp:475), and the epoch batches grow geometrically
    so the convergence-check count is logarithmic in omega/tau."""
    import math

    e = symmetrize(edges_df(spark, [(i, i + 1) for i in range(4)]))
    nodes = nodes_range(spark, 5)
    stats = {}
    kadabra_betweenness(e, nodes, err=0.3, delta=0.3, seed=3, stats=stats)
    assert stats["n_pairs"] <= math.ceil(stats["omega"])
    assert stats["epochs"] <= math.ceil(math.log2(stats["omega"] / stats["tau"])) + 2
