import numpy as np

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.distance import (
    bfs_distances,
    bfs_fixed,
    diameter_double_sweep,
    eccentricity,
    multi_source_bfs,
    sssp_distances,
)
from networkit_spark.operators.kcore import coreness, coreness_fixed, k_core


def dmap(df, key="node", val="dist"):
    return {r[key]: r[val] for r in df.collect()}


# K4 + tail 4-5-6: coreness [3,3,3,3,2-core? no] — build a graph with known cores:
# K4 on {0,1,2,3}; node 4 attached to 0,1 (core 2); node 5 attached to 4 (core 1)
CORE_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 0), (4, 1), (5, 4)]
CORE_EXPECTED = {0: 3, 1: 3, 2: 3, 3: 3, 4: 2, 5: 1}


def test_coreness_known_graph(spark):
    e = symmetrize(edges_df(spark, CORE_EDGES))
    got = dmap(coreness(e, nodes_range(spark, 6)), val="core")
    assert got == CORE_EXPECTED


def test_coreness_fixed_matches(spark):
    e = symmetrize(edges_df(spark, CORE_EDGES))
    nodes = nodes_range(spark, 6)
    fixed = dmap(coreness_fixed(e, nodes, iterations=8), val="core")
    assert fixed == CORE_EXPECTED


def test_k_core_subgraph(spark):
    e = symmetrize(edges_df(spark, CORE_EDGES))
    core3 = k_core(e, 3)
    nodes_in = {r["src"] for r in core3.collect()}
    assert nodes_in == {0, 1, 2, 3}
    assert core3.count() == 12  # K4 symmetrized
    assert k_core(e, 4).count() == 0


PATH_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_bfs_path(spark):
    e = symmetrize(edges_df(spark, PATH_EDGES))
    got = dmap(bfs_distances(e, 0))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_unreachable_omitted(spark):
    e = edges_df(spark, [(0, 1), (2, 3)])  # directed, two parts
    got = dmap(bfs_distances(e, 0))
    assert got == {0: 0, 1: 1}


def test_sssp_weighted(spark):
    # 0->1 w=10; 0->2 w=1; 2->1 w=2  => dist(1)=3 via 2
    e = edges_df(spark, [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 2.0)], weighted=True)
    got = dmap(sssp_distances(e, 0))
    assert got == {0: 0.0, 1: 3.0, 2: 1.0}


def test_multi_source_bfs(spark):
    e = symmetrize(edges_df(spark, PATH_EDGES))
    srcs = nodes_range(spark, 5).filter("id in (0, 4)")
    got = {(r["source"], r["node"]): r["dist"] for r in multi_source_bfs(e, srcs).collect()}
    assert got[(0, 4)] == 4 and got[(4, 0)] == 4 and got[(0, 2)] == 2 and got[(4, 2)] == 2


def test_eccentricity_and_diameter(spark):
    e = symmetrize(edges_df(spark, PATH_EDGES))
    far, ecc = eccentricity(e, 2)
    assert ecc == 2 and far in (0, 4)
    assert diameter_double_sweep(e, 2) == 4


def test_bfs_fixed_total_table(spark):
    e = symmetrize(edges_df(spark, PATH_EDGES))
    nodes = nodes_range(spark, 6)  # node 5 isolated
    got = dmap(bfs_fixed(e, nodes, source=0, rounds=10))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: -1}
    # under-iterated: nodes beyond 2 hops stay -1
    got2 = dmap(bfs_fixed(e, nodes, source=0, rounds=2))
    assert got2 == {0: 0, 1: 1, 2: 2, 3: -1, 4: -1, 5: -1}
