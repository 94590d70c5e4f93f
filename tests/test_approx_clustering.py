"""Schank-Wagner sampled clustering (ClusteringCoefficient.cpp:130-162)
and the globals.clustering wrapper (globals.pyx:107)."""
from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.triangles import (
    approx_avg_local_clustering,
    avg_local_clustering_coefficient,
    clustering,
)


def ring_of_cliques(spark, k=5, c=8):
    edges = []
    for b in range(c):
        lo = b * k
        edges += [(lo + a, lo + j) for a in range(k) for j in range(a + 1, k)]
        edges.append((lo, (lo + k) % (k * c)))
    return symmetrize(edges_df(spark, edges))


def test_estimate_close_to_exact(spark):
    g = ring_of_cliques(spark)
    exact = avg_local_clustering_coefficient(g)
    est = approx_avg_local_clustering(g, trials=4000, seed=3)
    assert abs(est - exact) < 0.05


def test_deterministic_under_seed(spark):
    g = ring_of_cliques(spark, k=4, c=4)
    a = approx_avg_local_clustering(g, trials=300, seed=11)
    b = approx_avg_local_clustering(g, trials=300, seed=11)
    assert a == b
    c = approx_avg_local_clustering(g, trials=300, seed=12)
    assert 0.0 <= c <= 1.0


def test_clique_estimate_is_one(spark):
    g = symmetrize(edges_df(spark, [(a, b) for a in range(6) for b in range(a + 1, 6)]))
    assert approx_avg_local_clustering(g, trials=200, seed=1) == 1.0


def test_no_eligible_nodes(spark):
    g = symmetrize(edges_df(spark, [(0, 1)]))
    assert approx_avg_local_clustering(g, trials=50, seed=1) == 0.0


def test_clustering_wrapper_small_graph_exact(spark):
    g = symmetrize(edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)]))
    assert clustering(g) == avg_local_clustering_coefficient(g)
