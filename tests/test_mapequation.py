"""LouvainMapEquation — map-equation local moving quality tests.

Reference bar (``CommunityGTest`` style): quality of the objective, not an
exact partition — plus exact recovery on planted disjoint cliques.
"""

import pytest

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.mapequation import (
    LouvainMapEquation,
    map_equation_fixed,
    map_equation_value,
)
from networkit_spark.operators.community import one_partition, singleton_partition

from tests.fixtures import clique_edges


def test_map_equation_recovers_disjoint_cliques(spark):
    k, size = 3, 5
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    res = LouvainMapEquation().run(e, nodes)
    labels = res.get_partition()
    # each clique collapses to one community labeled by its min node id
    rows = {r["node"]: r["label"] for r in labels.collect()}
    for c in range(k):
        base = c * size
        assert {rows[base + i] for i in range(size)} == {base}


def test_map_equation_value_improves(spark):
    k, size = 3, 5
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    singles = singleton_partition(nodes)
    cliques = LouvainMapEquation().run(e, nodes).get_partition()
    l_singles = map_equation_value(e, singles)
    l_cliques = map_equation_value(e, cliques)
    # the map equation is minimized; the planted partition must beat
    # singletons, and the index-codelength-only lower bound holds
    assert l_cliques < l_singles
    # one big module ~= no cut term but a large within-module codebook;
    # for disjoint cliques the planted partition also beats it
    l_one = map_equation_value(e, one_partition(nodes))
    assert l_cliques < l_one


def test_map_equation_fixed_matches_converged_on_cliques(spark):
    k, size = 2, 4
    e = symmetrize(edges_df(spark, clique_edges(k, size)))
    nodes = nodes_range(spark, k * size)
    fixed = map_equation_fixed(e, nodes, iterations=8)
    conv = LouvainMapEquation().run(e, nodes).get_partition()
    a = sorted((r["node"], r["label"]) for r in fixed.collect())
    b = sorted((r["node"], r["label"]) for r in conv.collect())
    assert a == b


def test_map_equation_isolated_nodes_survive(spark):
    e = symmetrize(edges_df(spark, [(0, 1)]))
    nodes = nodes_range(spark, 4)  # nodes 2,3 isolated
    labels = map_equation_fixed(e, nodes, iterations=2)
    rows = {r["node"]: r["label"] for r in labels.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2] == 2 and rows[3] == 3
