from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.plp import PLP, plp_fixed

from tests.fixtures import clique_edges


def labels_map(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_plp_recovers_disjoint_cliques(spark):
    """CommunityGTest.cpp:204-281 pattern: k disjoint cliques -> k communities."""
    k, size = 5, 8
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    res = PLP(update_threshold=0).run(e, nodes)
    lab = labels_map(res.get_partition())
    assert res.converged
    # each clique converges to one label == min node id of the clique
    for c in range(k):
        base = c * size
        labels_in_clique = {lab[base + i] for i in range(size)}
        assert labels_in_clique == {base}
    assert res.number_of_communities() == k


def test_plp_isolated_nodes_stay_singletons(spark):
    """PLP.cpp:50-61 — isolated nodes keep their own label."""
    k, size, extra = 3, 6, 5
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    n = k * size + extra
    nodes = nodes_range(spark, n)
    res = PLP(update_threshold=0).run(e, nodes)
    lab = labels_map(res.get_partition())
    for i in range(k * size, n):
        assert lab[i] == i
    assert res.number_of_communities() == k + extra


def test_plp_fixed_matches_engine_on_cliques(spark):
    k, size = 4, 6
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    fixed = labels_map(plp_fixed(e, nodes, iterations=5))
    full = labels_map(PLP(update_threshold=0).run(e, nodes).get_partition())
    assert fixed == full


def test_plp_partition_covers_all_nodes(spark):
    """test_community.py:146-160 analog — partition is total."""
    k, size = 3, 5
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    res = PLP(update_threshold=0).run(e, nodes)
    assert res.get_partition().count() == k * size
    assert res.get_partition().filter("label is null").count() == 0
