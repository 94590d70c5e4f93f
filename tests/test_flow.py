"""Parallel push-relabel max flow vs networkx oracle.

EdmondsKarp API parity (cpp/flow/EdmondsKarp.cpp, networkit/flow.pyx):
gain (flow value), getFlow (per-arc flows), getSourceSet (min-cut side).
Any valid max flow passes: we assert value == networkx value, capacity +
conservation feasibility, and that the returned source set is a minimum cut
whose crossing capacity equals the flow value (max-flow-min-cut).
"""

import random

import networkx as nx
import pytest

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
    return nx.maximum_flow_value(G, s, t)


def _check_feasible(triples, res, s, t):
    cap = {}
    for a, b, c in triples:
        cap[(a, b)] = cap.get((a, b), 0.0) + c
    flows = {(r.u, r.v): r.flow for r in res.flow_df.collect()}
    net = {}
    for (u, v), f in flows.items():
        # net flow may route through either direction of a pair; feasibility
        # bound is cap(u,v) (flows on non-arcs only appear via cancellation)
        assert f <= cap.get((u, v), 0.0) + 1e-9, ((u, v), f)
        net[u] = net.get(u, 0.0) - f
        net[v] = net.get(v, 0.0) + f
    for node, x in net.items():
        if node not in (s, t):
            assert abs(x) < 1e-9, (node, x)
    assert abs(net.get(t, 0.0) - res.value) < 1e-9


def _check_cut(triples, res, s, t):
    S = {r.node for r in res.source_set_df.collect()}
    assert s in S and t not in S
    cut_cap = sum(c for a, b, c in triples if a in S and b not in S)
    assert abs(cut_cap - res.value) < 1e-9


CASES = [
    # classic CLRS-style network
    ([(0, 1, 16), (0, 2, 13), (1, 2, 10), (2, 1, 4), (1, 3, 12), (3, 2, 9),
      (2, 4, 14), (4, 3, 7), (3, 5, 20), (4, 5, 4)], 0, 5),
    # diamond with bottleneck
    ([(0, 1, 3), (0, 2, 5), (1, 3, 4), (2, 3, 2)], 0, 3),
    # disconnected t
    ([(0, 1, 5), (2, 3, 5)], 0, 3),
    # parallel arcs + back arc
    ([(0, 1, 2), (0, 1, 3), (1, 2, 4), (2, 0, 7)], 0, 2),
]


@pytest.mark.parametrize("triples,s,t", CASES)
def test_max_flow_fixed_cases(spark, triples, s, t):
    res = max_flow(_df(spark, triples), s, t)
    assert res.converged
    assert abs(res.value - _nx_value(triples, s, t)) < 1e-9
    _check_feasible(triples, res, s, t)
    _check_cut(triples, res, s, t)


def test_max_flow_random(spark):
    rng = random.Random(4)
    n = 14
    triples = [
        (a, b, float(rng.randint(1, 9)))
        for a in range(n) for b in range(n)
        if a != b and rng.random() < 0.18
    ]
    triples += [(0, 1, 5.0), (n - 2, n - 1, 5.0)]  # ensure s/t touched
    res = max_flow(_df(spark, triples), 0, n - 1)
    assert res.converged
    assert abs(res.value - _nx_value(triples, 0, n - 1)) < 1e-9
    _check_feasible(triples, res, 0, n - 1)
    _check_cut(triples, res, 0, n - 1)
