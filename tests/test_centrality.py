import numpy as np

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.centrality import (
    degree_centrality,
    eigenvector_centrality,
    eigenvector_fixed,
    katz_centrality,
)

from tests.fixtures import PR8_EDGES, PR8_EVZ_EXPECTED


def vec(df, n, col="score"):
    rows = {r["node"]: r[col] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_eigenvector_pr8_golden(spark):
    """CentralityGTest.cpp:567-606 — Matlab golden eigenvector scores."""
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    res = eigenvector_centrality(e, nodes_range(spark, 8), tol=1e-12)
    got = vec(res.scores(), 8)
    assert np.allclose(got, PR8_EVZ_EXPECTED, atol=1e-4)
    assert res.converged


def test_degree_centrality(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (0, 2), (0, 3)]))
    got = vec(degree_centrality(e, nodes_range(spark, 5)), 5)
    assert got.tolist() == [3.0, 1.0, 1.0, 1.0, 0.0]
    norm = vec(degree_centrality(e, nodes_range(spark, 5), normalized=True), 5)
    assert np.allclose(norm, np.array([3, 1, 1, 1, 0]) / 4.0)


def test_degree_centrality_directed_in(spark):
    e = edges_df(spark, [(0, 1), (2, 1), (1, 3)])
    got = vec(degree_centrality(e, nodes_range(spark, 4), out_deg=False), 4)
    assert got.tolist() == [0.0, 2.0, 0.0, 1.0]


def test_katz_star_ordering(spark):
    """Star graph: center must outrank leaves; scores L2-normalized."""
    e = symmetrize(edges_df(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]))
    res = katz_centrality(e, nodes_range(spark, 5), tol=1e-10)
    got = vec(res.scores(), 5)
    assert got[0] > got[1]
    assert np.allclose(got[1:], got[1])  # leaves symmetric
    assert abs(np.linalg.norm(got) - 1.0) < 1e-6


def test_katz_vs_numpy(spark):
    """Katz recurrence cross-checked against a dense numpy implementation."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e = symmetrize(edges_df(spark, edges))
    n = 4
    res = katz_centrality(e, nodes_range(spark, n), alpha=0.1, beta=1.0, tol=1e-12)
    got = vec(res.scores(), n)

    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = A[v, u] = 1.0
    s = np.ones(n)
    for _ in range(2000):
        s_new = A @ (0.1 * (1 + s)) + 1.0
        if np.allclose(s_new, s, atol=1e-15):
            s = s_new
            break
        s = s_new
    expect = s / np.linalg.norm(s)
    assert np.allclose(got, expect, atol=1e-6)


def test_eigenvector_fixed_normalized(spark):
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    got = vec(eigenvector_fixed(e, nodes_range(spark, 8), iterations=50), 8)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9
    assert np.allclose(got, PR8_EVZ_EXPECTED, atol=1e-3)


def test_sfigality_star(spark):
    """Star: every leaf's single neighbor (hub) has higher degree -> 1.0;
    the hub has none -> 0.0 (Sfigality.cpp)."""
    from networkit_spark.graph import edges_df, nodes_range, symmetrize
    from networkit_spark.operators.centrality import sfigality

    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 5)]))
    got = {r["node"]: r["score"] for r in sfigality(e, nodes_range(spark, 5)).collect()}
    assert got[0] == 0.0
    assert all(got[i] == 1.0 for i in range(1, 5))


def test_laplacian_centrality_path(spark):
    """P3 0-1-2: LC(1) = 4+2+2*(1+1) = 10; LC(0) = 1+1+2*2 = 6."""
    from networkit_spark.graph import edges_df, nodes_range, symmetrize
    from networkit_spark.operators.centrality import laplacian_centrality_unweighted

    e = symmetrize(edges_df(spark, [(0, 1), (1, 2)]))
    got = {r["node"]: r["score"] for r in
           laplacian_centrality_unweighted(e, nodes_range(spark, 3)).collect()}
    assert got == {0: 6, 1: 10, 2: 6}


def test_group_degree_star_plus_path(spark):
    """Star(0;1..5) + path 6-7-8: greedy picks hub 0 first (gain 5), then 7
    (gain 2: covers 6, 8); score = |N(S) \\ S| with k=2."""
    from networkit_spark.graph import edges_df, nodes_range, symmetrize
    from networkit_spark.operators.group_centrality import group_degree

    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8)]))
    members, score = group_degree(e, nodes_range(spark, 9), k=2)
    picks = [r["node"] for r in members.orderBy("rank").collect()]
    assert picks == [0, 7]
    assert score == 7  # {1..5} + {6, 8}


def test_group_degree_count_group_variant(spark):
    from networkit_spark.graph import edges_df, nodes_range, symmetrize
    from networkit_spark.operators.group_centrality import group_degree

    e = symmetrize(edges_df(spark, [(0, 1), (1, 2)]))
    members, score = group_degree(e, nodes_range(spark, 3), k=1, count_group=True)
    assert [r["node"] for r in members.collect()] == [1]
    assert score == 3  # {0, 1, 2}
