"""Distributed Dinic max flow vs networkx + push-relabel cross-check.

Contract parity with cpp/flow/Dinic.cpp: exact max flow value on directed
weighted graphs, source != target enforced, non-negative capacities
enforced, antiparallel arcs preserved (not merged). Any valid max flow
passes feasibility; the VALUE is unique and asserted against networkx and
against the repo's own push-relabel kernel (two independent engines).
"""

import random

import networkx as nx
import pytest

from networkit_spark.operators.dinic import dinic_max_flow
from networkit_spark.operators.flow import max_flow


def _df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in triples],
        "src long, dst long, capacity double",
    )


def _nx_value(triples, s, t):
    G = nx.DiGraph()
    for a, b, c in triples:
        if G.has_edge(a, b):
            G[a][b]["capacity"] += c
        else:
            G.add_edge(a, b, capacity=c)
    if s not in G or t not in G:
        return 0.0
    return float(nx.maximum_flow_value(G, s, t))


def _check_feasible(triples, res, s, t):
    cap = {}
    for a, b, c in triples:
        cap[(a, b)] = cap.get((a, b), 0.0) + c
    flows = {(r.u, r.v): r.flow for r in res.flow_df.collect()}
    net = {}
    for (u, v), f in flows.items():
        assert f <= cap.get((u, v), 0.0) + 1e-6, f"over capacity on {(u, v)}"
        net[u] = net.get(u, 0.0) + f
        net[v] = net.get(v, 0.0) - f
    for node, bal in net.items():
        if node == s:
            assert abs(bal - res.value) < 1e-6
        elif node == t:
            assert abs(bal + res.value) < 1e-6
        else:
            assert abs(bal) < 1e-6, f"conservation violated at {node}"


def _check_cut(triples, res, s, t):
    S = {r.node for r in res.source_set_df.collect()}
    assert s in S and t not in S
    crossing = sum(c for a, b, c in triples if a in S and b not in S)
    assert abs(crossing - res.value) < 1e-6


CLRS = [
    (0, 1, 16), (0, 2, 13), (1, 3, 12), (2, 1, 4), (2, 4, 14),
    (3, 2, 9), (3, 5, 20), (4, 3, 7), (4, 5, 4),
]


def test_clrs_fixture(spark):
    res = dinic_max_flow(_df(spark, CLRS), 0, 5)
    assert abs(res.value - 23.0) < 1e-9
    _check_feasible(CLRS, res, 0, 5)
    _check_cut(CLRS, res, 0, 5)
    assert res.converged


def test_antiparallel_arcs(spark):
    triples = [(0, 1, 5), (1, 0, 3), (1, 2, 4), (2, 1, 7), (0, 2, 1)]
    res = dinic_max_flow(_df(spark, triples), 0, 2)
    assert abs(res.value - _nx_value(triples, 0, 2)) < 1e-9
    _check_feasible(triples, res, 0, 2)


def test_disconnected_and_missing_nodes(spark):
    triples = [(0, 1, 2), (2, 3, 4)]
    assert dinic_max_flow(_df(spark, triples), 0, 3).value == 0.0
    assert dinic_max_flow(_df(spark, triples), 0, 9).value == 0.0


def test_same_source_target_raises(spark):
    with pytest.raises(ValueError):
        dinic_max_flow(_df(spark, CLRS), 3, 3)


def test_negative_capacity_raises(spark):
    with pytest.raises(ValueError):
        dinic_max_flow(_df(spark, [(0, 1, -1.0)]), 0, 1)


def test_parallel_arcs_merge_additively(spark):
    triples = [(0, 1, 2), (0, 1, 3), (1, 2, 4)]
    res = dinic_max_flow(_df(spark, triples), 0, 2)
    assert abs(res.value - 4.0) < 1e-9


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_vs_networkx_and_push_relabel(spark, seed):
    rng = random.Random(seed)
    n = 12
    triples = []
    for u in range(n):
        for v in range(n):
            if u != v and rng.random() < 0.25:
                triples.append((u, v, rng.randint(1, 9)))
    s, t = 0, n - 1
    want = _nx_value(triples, s, t)
    df = _df(spark, triples)
    res = dinic_max_flow(df, s, t)
    assert abs(res.value - want) < 1e-6
    _check_feasible(triples, res, s, t)
    _check_cut(triples, res, s, t)
    pr = max_flow(df, s, t)
    assert abs(pr.value - res.value) < 1e-6


def test_determinism(spark):
    triples = [(0, 1, 3), (0, 2, 2), (1, 3, 2), (2, 3, 3), (1, 2, 1)]
    df = _df(spark, triples)
    a = dinic_max_flow(df, 0, 3)
    b = dinic_max_flow(df, 0, 3)
    assert a.value == b.value
    fa = sorted((r.u, r.v, r.flow) for r in a.flow_df.collect())
    fb = sorted((r.u, r.v, r.flow) for r in b.flow_df.collect())
    assert fa == fb
