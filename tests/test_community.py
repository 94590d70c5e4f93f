import math

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.community import (
    adjusted_rand_index,
    continuous_balanced_partition,
    coverage,
    edge_cut,
    jaccard_partition_similarity,
    modularity,
    nmi,
    one_partition,
    rand_index,
    singleton_partition,
)
from networkit_spark.operators.plp import PLP

from tests.fixtures import clique_edges


def test_modularity_disjoint_cliques_closed_form(spark):
    """k disjoint equal cliques, partition = cliques: Q = 1 - 1/k
    (Modularity.cpp:23-70 semantics; FIXTURES.md plp-cliques quality check)."""
    k, size = 4, 6
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    labels = PLP(update_threshold=0).run(e, nodes).get_partition()
    q = modularity(e, labels)
    assert abs(q - (1 - 1 / k)) < 1e-9
    assert abs(coverage(e, labels) - 1.0) < 1e-12
    assert abs(edge_cut(e, labels)) < 1e-12


def test_modularity_one_partition_zero(spark):
    e = symmetrize(edges_df(spark, clique_edges(2, 5)))
    nodes = nodes_range(spark, 10)
    assert abs(modularity(e, one_partition(nodes))) < 1e-12


def test_partition_similarity_identity(spark):
    nodes = nodes_range(spark, 30)
    a = continuous_balanced_partition(nodes, 3)
    assert rand_index(a, a) == 1.0
    assert jaccard_partition_similarity(a, a) == 1.0
    assert abs(adjusted_rand_index(a, a) - 1.0) < 1e-12
    assert abs(nmi(a, a) - 1.0) < 1e-12


def test_partition_similarity_disagreement(spark):
    nodes = nodes_range(spark, 30)
    a = continuous_balanced_partition(nodes, 3)
    b = singleton_partition(nodes)
    # singleton vs blocks: no pair co-clustered in b -> jaccard = 0
    assert jaccard_partition_similarity(a, b) == 0.0
    r = rand_index(a, b)
    assert 0.0 < r < 1.0
    # NMI of singleton vs anything: H(singleton) = log n is the max entropy
    v = nmi(a, b)
    expected = math.log(3) / math.log(30)  # MI = H(a); normalized by max entropy
    assert abs(v - expected) < 1e-9


def test_partition_intersection(spark):
    from networkit_spark.operators.community import partition_intersection

    nodes = nodes_range(spark, 12)
    a = continuous_balanced_partition(nodes, 2)   # blocks of 6
    b = continuous_balanced_partition(nodes, 4)   # blocks of 3
    inter = partition_intersection(a, b)
    rows = {r["node"]: r["label"] for r in inter.collect()}
    # refinement = blocks of 3, labeled by min member
    for n in range(12):
        assert rows[n] == (n // 3) * 3
    # intersecting with singletons yields singletons
    s = singleton_partition(nodes)
    rows = {r["node"]: r["label"] for r in partition_intersection(a, s).collect()}
    assert all(rows[n] == n for n in range(12))


def test_graph_structural_rand(spark):
    from networkit_spark.operators.community import graph_structural_rand
    from networkit_spark.graph import symmetrize, edges_df

    # path 0-1-2-3; a = {01}{23}, b = {0}{123}: edge 01 split in b only,
    # edge 12 split in both (e00), edge 23 internal in b only
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    mk = lambda m: spark.createDataFrame(list(m.items()), "node long, label long")
    a = mk({0: 0, 1: 0, 2: 2, 3: 2})
    b = mk({0: 0, 1: 1, 2: 1, 3: 1})
    assert abs(graph_structural_rand(e, a, b) - 2 / 3) < 1e-12
    assert graph_structural_rand(e, a, a) == 0.0


def test_cover_f1_similarity(spark):
    from networkit_spark.operators.community import cover_f1_similarity

    nodes = nodes_range(spark, 12)
    a = continuous_balanced_partition(nodes, 4)
    # identical covers: F1 = 1 everywhere
    rows = cover_f1_similarity(a, a).collect()
    assert all(r["f1"] == 1.0 for r in rows) and len(rows) == 4
    # cover vs the 2-block coarsening: overlap 3, |ref|=6, |c|=3 -> F1 = 2/3
    b = continuous_balanced_partition(nodes, 2)
    rows = cover_f1_similarity(a, b).collect()
    assert all(abs(r["f1"] - 2 / 3) < 1e-12 for r in rows)
