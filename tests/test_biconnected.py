"""Biconnected components vs a sequential Hopcroft-Tarjan oracle.

The Spark operator returns the edge partition; the reference's component
ids are DFS-order dependent, so equality is checked on the canonical form:
the set of frozensets of (u, v) edges per component
(``BiconnectedComponents.cpp`` semantics; property bar of the reference's
``test_components.py:15-27``).
"""

import random

import pytest

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.biconnected import BiconnectedComponents


def _bcc_oracle(n, edge_list):
    """Sequential iterative Hopcroft-Tarjan; returns set of frozensets of
    normalized (u, v) edges (test-only oracle)."""
    adj = {u: [] for u in range(n)}
    for u, v in edge_list:
        adj[u].append(v)
        adj[v].append(u)
    visited = [False] * n
    depth = [0] * n
    low = [0] * n
    parent = [None] * n
    comps = []
    for root in range(n):
        if visited[root] or not adj[root]:
            continue
        stack = [(root, iter(adj[root]))]
        estack = []
        visited[root] = True
        while stack:
            u, it = stack[-1]
            advanced = False
            for v in it:
                if not visited[v]:
                    visited[v] = True
                    parent[v] = u
                    depth[v] = low[v] = depth[u] + 1
                    estack.append((u, v))
                    stack.append((v, iter(adj[v])))
                    advanced = True
                    break
                elif v != parent[u] and depth[v] < depth[u]:
                    estack.append((u, v))
                    low[u] = min(low[u], depth[v])
            if not advanced:
                stack.pop()
                if parent[u] is None:
                    continue
                p = parent[u]
                low[p] = min(low[p], low[u])
                if low[u] >= depth[p]:
                    comp = []
                    while estack:
                        a, b = estack[-1]
                        if depth[a] < depth[p] or (a, b) == (p, u) or (b, a) == (p, u):
                            break
                        comp.append(estack.pop())
                    if estack and ((estack[-1] == (p, u)) or (estack[-1] == (u, p))):
                        comp.append(estack.pop())
                    comps.append(frozenset(tuple(sorted(e)) for e in comp))
    return set(comps)


def _spark_bcc(spark, n, edge_list):
    e = symmetrize(edges_df(spark, edge_list))
    res = BiconnectedComponents().run(e, nodes_range(spark, n))
    rows = res.get_edge_partition().collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], set()).add((r["u"], r["v"]))
    return {frozenset(s) for s in by_label.values()}, res


CASES = {
    "path": (4, [(0, 1), (1, 2), (2, 3)]),
    "cycle_with_tail": (5, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]),
    "two_triangles_shared_vertex": (
        5,
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)],
    ),
    "theta_graph": (6, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (0, 3)]),
    "two_components": (7, [(0, 1), (1, 2), (2, 0), (4, 5), (5, 6)]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_biconnected_fixed_graphs(spark, name):
    n, edges = CASES[name]
    got, _ = _spark_bcc(spark, n, edges)
    assert got == _bcc_oracle(n, edges)


def test_biconnected_random_graph(spark):
    rng = random.Random(7)
    n = 24
    edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                    for _ in range(40)})
    edges = [e for e in edges if e[0] != e[1]]
    got, res = _spark_bcc(spark, n, edges)
    assert got == _bcc_oracle(n, edges)
    assert res.number_of_components() == len(got)


def test_component_sizes_two_triangles(spark):
    n, edges = CASES["two_triangles_shared_vertex"]
    _, res = _spark_bcc(spark, n, edges)
    sizes = sorted(r["size"] for r in res.component_sizes().collect())
    assert sizes == [3, 3]  # node 2 (articulation) counted in both
