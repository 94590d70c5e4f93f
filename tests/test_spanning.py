"""Spanning forest (Boruvka) + UMSF tests vs networkx oracles.

Reference semantics: RandomMaximumSpanningForest.cpp:11-71 (Kruskal,
weight-desc), UnionMaximumSpanningForest.cpp (edges in >= 1 MSF),
SpanningForest.cpp (any forest). With the deterministic edge total order
(weight desc, (lo,hi) asc) the max spanning forest is unique, so the edge
SET must equal networkx's maximum_spanning_edges under the same weights.
"""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.spanning import (
    max_spanning_forest,
    max_spanning_forest_fixed,
    spanning_forest,
    union_maximum_spanning_forest,
)


def _weighted_gnp(n, p, seed, distinct=True, levels=4):
    rng = random.Random(seed)
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < p]
    if distinct:
        ws = rng.sample(range(1, 10 * len(pairs) + 1), len(pairs))
        return [(a, b, float(w)) for (a, b), w in zip(pairs, ws)]
    return [(a, b, float(rng.randint(1, levels))) for a, b in pairs]


def _df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _nx(triples):
    G = nx.Graph()
    G.add_weighted_edges_from(triples)
    return G


@pytest.mark.parametrize("seed", [1, 5])
def test_max_spanning_forest_matches_networkx(spark, seed):
    triples = _weighted_gnp(60, 0.08, seed)
    G = _nx(triples)
    expected = {
        (min(u, v), max(u, v))
        for u, v, _ in nx.maximum_spanning_edges(G, data=True)
    }
    res = max_spanning_forest(_df(spark, triples))
    got = {(r.src, r.dst) for r in res.forest_df.collect()}
    assert got == expected
    assert res.converged
    # forest labels == connected components of G
    labels = {r.node: r.label for r in res.labels_df.collect()}
    for comp in nx.connected_components(G):
        assert len({labels[v] for v in comp}) == 1


def test_fixed_twin_equals_engine(spark):
    triples = _weighted_gnp(50, 0.1, seed=9)
    df = _df(spark, triples)
    eng = {(r.src, r.dst) for r in max_spanning_forest(df).forest_df.collect()}
    fixed = {(r.src, r.dst)
             for r in max_spanning_forest_fixed(df, rounds=8, jumps=8).collect()}
    assert eng == fixed


def test_min_spanning_forest(spark):
    triples = _weighted_gnp(40, 0.12, seed=3)
    G = _nx(triples)
    expected = {
        (min(u, v), max(u, v))
        for u, v, _ in nx.minimum_spanning_edges(G, data=True)
    }
    got = {
        (r.src, r.dst)
        for r in max_spanning_forest(_df(spark, triples), maximum=False)
        .forest_df.collect()
    }
    assert got == expected


def test_unweighted_spanning_forest_counts(spark):
    # two components: path 0-1-2-3 + triangle 10-11-12
    triples = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0),
               (10, 11, 1.0), (11, 12, 1.0), (10, 12, 1.0)]
    res = spanning_forest(_df(spark, triples))
    forest = [(r.src, r.dst) for r in res.forest_df.collect()]
    assert len(forest) == 7 - 2  # n - n_components
    G = nx.Graph()
    G.add_edges_from(forest)
    assert nx.number_connected_components(G) == 2
    assert not any(True for _ in nx.cycle_basis(G))


def test_umsf_distinct_weights_equals_msf(spark):
    triples = _weighted_gnp(16, 0.2, seed=7)
    df = _df(spark, triples)
    msf = {(r.src, r.dst) for r in max_spanning_forest(df).forest_df.collect()}
    um = union_maximum_spanning_forest(df)
    got = {(r.src, r.dst) for r in um.filter("in_umsf").collect()}
    assert got == msf


def test_umsf_many_distinct_weights_log_rounds(spark):
    """Round-2 verdict scale fix: 10^4 all-distinct weights must sweep in
    O(log L) depths (segment-tree batching), not O(L) driver rounds — and
    with distinct weights UMSF == the unique MSF."""
    import math

    rng = random.Random(42)
    n, m = 1500, 10_000
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    ws = rng.sample(range(1, 20 * m), m)
    triples = [(a, b, float(w)) for (a, b), w in zip(sorted(pairs), ws)]
    df = _df(spark, triples)
    stats = {}
    um = union_maximum_spanning_forest(df, stats=stats)
    got = {(r.src, r.dst) for r in um.filter("in_umsf").collect()}
    assert stats["distinct_weights"] == m
    assert stats["depths"] <= math.ceil(math.log2(m)) + 1  # 15 for 10^4
    G = _nx(triples)
    expected = {
        (min(u, v), max(u, v))
        for u, v, _ in nx.maximum_spanning_edges(G, data=True)
    }
    assert got == expected


def test_umsf_tied_weights_cut_property(spark):
    # few weight levels -> real ties; oracle: edge in UMSF iff endpoints
    # disconnected in the strictly-heavier subgraph
    triples = _weighted_gnp(22, 0.18, seed=11, distinct=False, levels=3)
    df = _df(spark, triples)
    um = {(r.src, r.dst): r.in_umsf
          for r in union_maximum_spanning_forest(df).collect()}
    nodes = sorted({v for a, b, _ in triples for v in (a, b)})
    for a, b, w in triples:
        H = nx.Graph()
        H.add_nodes_from(nodes)
        H.add_edges_from([(x, y) for x, y, ww in triples if ww > w])
        expected = not nx.has_path(H, a, b)
        assert um[(min(a, b), max(a, b))] == expected, (a, b, w)
