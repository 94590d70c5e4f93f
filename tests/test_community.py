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
