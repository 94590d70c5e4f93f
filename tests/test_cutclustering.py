"""Cut clustering vs a sequential reference replica (networkx min cuts).

CutClustering.cpp parity: augmented sink with alpha edges, decreasing-degree
processing order (node-id ties ascending), skip already-clustered sources,
source side of each min cut labeled by the source, later sides absorb
earlier clusters. The minimal source-side min cut is unique, so the replica
(networkx ``minimum_cut``, whose source partition is residual-reachable)
must produce the IDENTICAL partition — labels included.
"""

import networkx as nx
import pytest

from networkit_spark.operators.cutclustering import cut_clustering


def _nodes_df(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "node long")


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _reference_replica(triples, n, alpha):
    G = nx.Graph()
    G.add_nodes_from(range(n))
    for a, b, w in triples:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        cap = max(G[lo][hi]["capacity"], w) if G.has_edge(lo, hi) else w
        G.add_edge(lo, hi, capacity=float(cap))
    deg = {u: G.degree(u) for u in range(n)}
    t = n
    for u in range(n):
        G.add_edge(u, t, capacity=float(alpha))
    labels = {}
    for u in sorted(range(n), key=lambda x: (-deg[x], x)):
        if u in labels:
            continue
        # NOT nx.minimum_cut's partition: that returns the MAXIMAL min cut
        # (complement of can-reach-t) when cuts tie; EdmondsKarp.cpp's
        # getSourceSet is a residual BFS from the source = the unique
        # MINIMAL source side, invariant across max flows.
        R = nx.algorithms.flow.edmonds_karp(G, u, t)
        seen = {u}
        stack = [u]
        while stack:
            a = stack.pop()
            for b in R[a]:
                if b not in seen and (
                    R[a][b]["capacity"] - R[a][b]["flow"] > 1e-9
                ):
                    seen.add(b)
                    stack.append(b)
        for v in seen:
            labels[v] = u
    return labels


def _run_and_compare(spark, triples, n, alpha, batch=8):
    got = {
        r.node: r.label
        for r in cut_clustering(
            _edges_df(spark, triples), _nodes_df(spark, n), alpha, batch=batch
        ).collect()
    }
    want = _reference_replica(triples, n, alpha)
    assert got == want


def test_two_communities_bridge(spark):
    # two triangles joined by a weak bridge; alpha between bridge and
    # internal weights splits them into the two triangles
    triples = [
        (0, 1, 2.0), (1, 2, 2.0), (0, 2, 2.0),
        (3, 4, 2.0), (4, 5, 2.0), (3, 5, 2.0),
        (2, 3, 0.5),
    ]
    _run_and_compare(spark, triples, 6, alpha=1.0)


def test_alpha_extremes(spark):
    triples = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    # huge alpha -> every node its own cluster
    _run_and_compare(spark, triples, 4, alpha=10.0)
    # tiny alpha -> one cluster per connected component
    _run_and_compare(spark, triples, 4, alpha=0.05)


def test_isolated_nodes_singletons(spark):
    triples = [(0, 1, 3.0)]
    _run_and_compare(spark, triples, 4, alpha=1.0)


@pytest.mark.parametrize("seed", [1, 7])
def test_random_weighted_graphs(spark, seed):
    import random

    rng = random.Random(seed)
    n = 12
    triples = []
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < 0.3:
                triples.append((a, b, rng.choice([0.5, 1.0, 2.0, 3.0])))
    _run_and_compare(spark, triples, n, alpha=1.0, batch=5)
