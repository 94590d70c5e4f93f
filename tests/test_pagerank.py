import numpy as np
import pytest

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.pagerank import (
    DISTRIBUTE_SINKS,
    PageRank,
    pagerank_fixed,
)

from tests.fixtures import (
    PR5_DIRECTED_EXPECTED,
    PR5_EDGES,
    PR5_N,
    PR5_UNDIRECTED_EXPECTED,
    PR8_EDGES,
    PR8_EXPECTED,
)


def scores_vec(df, n):
    rows = {r["node"]: r["score"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_pr8_weighted_undirected(spark):
    """CentralityGTest.cpp:608-648 — Matlab golden scores, tol 1e-4."""
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    nodes = nodes_range(spark, 8)
    res = PageRank(damp=0.85, tol=1e-8).run(e, nodes, directed=False)
    got = scores_vec(res.scores(), 8)
    assert np.allclose(got, PR8_EXPECTED, atol=1e-4)
    assert abs(got.sum() - 1.0) < 1e-9
    assert res.converged
    assert res.iterations > 1
    assert abs(res.maximum() - got.max()) < 1e-12


def test_pr5_directed_normalized_distribute_sinks(spark):
    """CentralityGTest.cpp:521-565 — normalized + DISTRIBUTE_SINKS, tol 2e-4."""
    e = edges_df(spark, PR5_EDGES)
    nodes = nodes_range(spark, PR5_N)
    res = PageRank(
        damp=0.85, tol=1e-8, normalized=True, distribute_sinks=DISTRIBUTE_SINKS
    ).run(e, nodes, directed=True)
    got = scores_vec(res.scores(), PR5_N)
    assert np.allclose(got, PR5_DIRECTED_EXPECTED, atol=2e-4)


def test_pr5_undirected_normalized(spark):
    e = symmetrize(edges_df(spark, PR5_EDGES))
    nodes = nodes_range(spark, PR5_N)
    res = PageRank(
        damp=0.85, tol=1e-8, normalized=True, distribute_sinks=DISTRIBUTE_SINKS
    ).run(e, nodes, directed=False)
    got = scores_vec(res.scores(), PR5_N)
    assert np.allclose(got, PR5_UNDIRECTED_EXPECTED, atol=2e-4)


def test_directed_no_sink_handling_rescales_to_1(spark):
    e = edges_df(spark, PR5_EDGES)
    nodes = nodes_range(spark, PR5_N)
    res = PageRank(damp=0.85, tol=1e-10).run(e, nodes, directed=True)
    got = scores_vec(res.scores(), PR5_N)
    assert abs(got.sum() - 1.0) < 1e-9


def test_l1_norm_converges(spark):
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    nodes = nodes_range(spark, 8)
    res = PageRank(damp=0.85, tol=1e-8, norm="l1").run(e, nodes, directed=False)
    got = scores_vec(res.scores(), 8)
    assert np.allclose(got, PR8_EXPECTED, atol=1e-4)


def test_max_iterations_cap(spark):
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    nodes = nodes_range(spark, 8)
    res = PageRank(damp=0.85, tol=0.0, max_iterations=3).run(e, nodes, directed=False)
    assert res.iterations == 3
    assert not res.converged


def test_pagerank_fixed_matches_numpy(spark):
    """Fixed-iteration variant vs a dense numpy reference on pr8."""
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    nodes = nodes_range(spark, 8)
    got = scores_vec(pagerank_fixed(e, nodes, iterations=10, rescale_sum1=False), 8)

    # numpy oracle
    n = 8
    W = np.zeros((n, n))
    for u, v, w in PR8_EDGES:
        W[u, v] = w
        W[v, u] = w
    deg = W.sum(axis=1)
    s = np.full(n, 1.0 / n)
    for _ in range(10):
        s = 0.85 * (W.T @ (s / deg)) + 0.15 / n
    assert np.allclose(got, s, atol=1e-12)


def test_ranking_topk(spark):
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    nodes = nodes_range(spark, 8)
    res = PageRank().run(e, nodes, directed=False)
    top = res.ranking(3).collect()
    assert [r["node"] for r in top] == [2, 5, 3]
