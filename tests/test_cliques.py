"""Maximal-clique enumeration vs networkx.find_cliques.

Reference: cpp/clique/MaximalCliques.cpp (degeneracy-order Bron-Kerbosch
with pivoting); test analog cpp/clique/test/. The distributed ELS
decomposition must produce exactly the same clique SET.
"""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.cliques import maximal_cliques, maximal_triangles


def _gnp(n, p, seed):
    rng = random.Random(seed)
    return [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < p]


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _nx_cliques(pairs, nodes=None):
    G = nx.Graph()
    if nodes:
        G.add_nodes_from(nodes)
    G.add_edges_from(pairs)
    return {tuple(sorted(c)) for c in nx.find_cliques(G)}


@pytest.mark.parametrize("n,p,seed", [(40, 0.15, 1), (60, 0.1, 2), (25, 0.3, 3)])
def test_maximal_cliques_match_networkx(spark, n, p, seed):
    pairs = _gnp(n, p, seed)
    nodes = spark.range(n).select(F.col("id"))
    got = {
        tuple(r.clique) for r in maximal_cliques(_df(spark, pairs), nodes).collect()
    }
    assert got == _nx_cliques(pairs, nodes=range(n))


def test_cliques_fixture_shapes(spark):
    # K4 + pendant + isolated: cliques {0,1,2,3}, {3,4}, {9}
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    nodes = spark.range(10).select(F.col("id")).filter("id in (0,1,2,3,4,9)")
    got = {tuple(r.clique) for r in maximal_cliques(_df(spark, pairs), nodes).collect()}
    assert got == {(0, 1, 2, 3), (3, 4), (9,)}


def test_min_size_filter(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    nodes = spark.range(4).select(F.col("id"))
    got = {tuple(r.clique)
           for r in maximal_cliques(_df(spark, pairs), nodes, min_size=3).collect()}
    assert got == {(0, 1, 2)}


def test_maximal_triangles(spark):
    # triangle 0-1-2 extendable by 3 (K4 minus nothing...) build: K4 on
    # 0..3 (its triangles are NOT maximal) + separate triangle 10,11,12
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (10, 11), (10, 12), (11, 12)]
    got = {(r.a, r.b, r.c) for r in maximal_triangles(_df(spark, pairs)).collect()}
    assert got == {(10, 11, 12)}
