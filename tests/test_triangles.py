import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.triangles import (
    avg_local_clustering_coefficient,
    enumerate_triangles,
    global_clustering_coefficient,
    local_clustering_coefficient,
    total_triangles,
    triangle_counts,
    triangle_edge_score,
)

from tests.fixtures import (
    LCC6_EDGES,
    LCC6_EXPECTED,
    LCC6_N,
    LCC16_EDGES,
    LCC16_EXPECTED,
    LCC16_N,
)


def vec(df, n, col):
    rows = {r["node"]: r[col] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_lcc16_golden(spark):
    """CentralityGTest.cpp:1247-1303 — exact LCC vector."""
    e = symmetrize(edges_df(spark, LCC16_EDGES))
    got = vec(local_clustering_coefficient(e, nodes_range(spark, LCC16_N)), LCC16_N, "lcc")
    assert np.allclose(got, LCC16_EXPECTED, atol=1e-12)


def test_lcc6_golden(spark):
    """CentralityGTest.cpp:1305-1325."""
    e = symmetrize(edges_df(spark, LCC6_EDGES))
    got = vec(local_clustering_coefficient(e, nodes_range(spark, LCC6_N)), LCC6_N, "lcc")
    assert np.allclose(got, LCC6_EXPECTED, atol=1e-12)


def test_triangle_total_triangle_graph(spark):
    # K3: exactly 1 triangle
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (0, 2)]))
    assert total_triangles(e) == 1
    # K4: 4 triangles
    k4 = symmetrize(edges_df(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]))
    assert total_triangles(k4) == 4


def test_each_triangle_enumerated_once(spark):
    e = symmetrize(edges_df(spark, LCC6_EDGES))
    tri = enumerate_triangles(e).collect()
    seen = {tuple(sorted((r["a"], r["b"], r["c"]))) for r in tri}
    assert len(seen) == len(tri)  # no duplicates


def test_per_node_counts_consistent_with_total(spark):
    e = symmetrize(edges_df(spark, LCC16_EDGES))
    per_node = triangle_counts(e, nodes_range(spark, LCC16_N))
    s = per_node.agg(F.sum("triangles")).first()[0]
    assert s == 3 * total_triangles(e)


def test_global_cc_k4(spark):
    k4 = symmetrize(edges_df(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]))
    assert abs(global_clustering_coefficient(k4) - 1.0) < 1e-12
    assert abs(avg_local_clustering_coefficient(k4) - 1.0) < 1e-12


def test_triangle_edge_score(spark):
    # K3 + pendant edge (0,3): triangle edges score 1, pendant scores 0
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (0, 2), (0, 3)]))
    scores = {(r["src"], r["dst"]): r["score"] for r in triangle_edge_score(e).collect()}
    assert scores == {(0, 1): 1, (1, 2): 1, (0, 2): 1, (0, 3): 0}


def test_local_square_clustering(spark):
    """C4: every node in a plain 4-cycle scores 1.0; paths score 0; a
    triangle's potential cancels to 0 (LocalSquareClusteringCoefficient.cpp
    semantics)."""
    from networkit_spark.graph import edges_df, nodes_range, symmetrize
    from networkit_spark.operators.triangles import local_square_clustering

    c4 = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    got = {r["node"]: r["score"] for r in
           local_square_clustering(c4, nodes_range(spark, 4)).collect()}
    assert all(abs(got[v] - 1.0) < 1e-12 for v in range(4))

    p4 = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    got = {r["node"]: r["score"] for r in
           local_square_clustering(p4, nodes_range(spark, 4)).collect()}
    assert got[1] == 0.0 and got[2] == 0.0

    tri = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 0)]))
    got = {r["node"]: r["score"] for r in
           local_square_clustering(tri, nodes_range(spark, 3)).collect()}
    assert all(got[v] == 0.0 for v in range(3))
