"""Coarsening (ParallelPartitionCoarsening / MatchingCoarsening) and
reachability (ReachableNodes / AllSimplePaths) tests.

Oracles: networkx (`nx.quotient_graph`-style manual contraction, `descendants`,
`all_simple_paths`) plus the reference's closed-form conventions
(`cpp/coarsening/ParallelPartitionCoarsening.cpp:23-66`,
`cpp/reachability/ReachableNodes.cpp:26-156`, `AllSimplePaths.cpp`).
"""

import networkx as nx
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.coarsening import (
    coarsen_by_matching,
    coarsen_by_partition,
    compact_partition,
)
from networkit_spark.operators.reachability import all_simple_paths, reachable_nodes


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def test_compact_partition_ascending_rank(spark):
    labels = spark.createDataFrame(
        [(0, 9), (1, 2), (2, 9), (3, 5)], "node long, label long"
    )
    got = dict(
        (r.node, r.coarse) for r in compact_partition(labels).collect()
    )
    # ascending-label rank: 2 -> 0, 5 -> 1, 9 -> 2 (Partition::compact useTurbo)
    assert got == {0: 2, 1: 0, 2: 2, 3: 1}


def test_partition_coarsening_weights_and_loops(spark):
    # two triangles joined by one bridge; partition = triangle membership.
    # canonical undirected rows (src <= dst), unit weights
    fine = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
        (2, 3, 2.5),
    ]
    e = _wedges(spark, fine)
    labels = spark.createDataFrame(
        [(i, 10 if i < 3 else 20) for i in range(6)], "node long, label long"
    )
    coarse, mapping = coarsen_by_partition(e, labels)
    rows = {(r.src, r.dst): r.weight for r in coarse.collect()}
    # self-loop weight = sum of intra-block fine weights (each edge once)
    assert rows == {(0, 0): 3.0, (1, 1): 3.0, (0, 1): 2.5}
    m = dict((r.node, r.coarse) for r in mapping.collect())
    assert m == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_partition_coarsening_preserves_total_weight(spark):
    fine = [(i, (i * 2 + 1) % 40, 1.0 + (i % 3)) for i in range(40)]
    fine = [(min(a, b), max(a, b), w) for a, b, w in fine if a != b]
    e = _wedges(spark, fine).groupBy("src", "dst").agg(
        F.sum("weight").alias("weight")
    )
    labels = spark.range(40).select(
        F.col("id").alias("node"), (F.col("id") % 7).alias("label")
    )
    coarse, _ = coarsen_by_partition(e, labels)
    tot_fine = e.agg(F.sum("weight")).first()[0]
    tot_coarse = coarse.agg(F.sum("weight")).first()[0]
    assert abs(tot_fine - tot_coarse) < 1e-9


def test_matching_coarsening(spark):
    # path 0-1-2-3-4, matching {(0,1),(2,3)}; node 4 stays singleton.
    e = _wedges(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)])
    matching = spark.createDataFrame([(0, 1), (2, 3)], "u long, v long")
    coarse, mapping = coarsen_by_matching(e, matching)
    m = dict((r.node, r.coarse) for r in mapping.collect())
    # representatives 0, 2, 4 -> dense ranks 0, 1, 2
    assert m == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}
    rows = {(r.src, r.dst): r.weight for r in coarse.collect()}
    assert rows == {(0, 0): 1.0, (0, 1): 1.0, (1, 1): 1.0, (1, 2): 1.0}
    no_loops, _ = coarsen_by_matching(e, matching, no_self_loops=True)
    rows2 = {(r.src, r.dst): r.weight for r in no_loops.collect()}
    assert rows2 == {(0, 1): 1.0, (1, 2): 1.0}


def _toy_digraph():
    # two SCCs {0,1,2} and {4,5}, a tail 3, and an isolated node 6
    return [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 4)]


def test_reachable_nodes_directed_matches_networkx(spark):
    pairs = _toy_digraph()
    e = edges_df(spark, pairs)
    nodes = nodes_range(spark, 7)
    got = dict(
        (r.node, r.reachable) for r in reachable_nodes(e, nodes, directed=True).collect()
    )
    g = nx.DiGraph(pairs)
    g.add_nodes_from(range(7))
    want = {u: len(nx.descendants(g, u)) + 1 for u in g.nodes}
    assert got == want


def test_reachable_nodes_undirected_component_sizes(spark):
    pairs = [(0, 1), (1, 2), (4, 5)]
    e = symmetrize(edges_df(spark, pairs))
    nodes = nodes_range(spark, 7)
    got = dict(
        (r.node, r.reachable)
        for r in reachable_nodes(e, nodes, directed=False).collect()
    )
    assert got == {0: 3, 1: 3, 2: 3, 4: 2, 5: 2, 3: 1, 6: 1}


def test_all_simple_paths_matches_networkx(spark):
    pairs = [
        (0, 1), (0, 2), (1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 0), (3, 0),
    ]
    e = edges_df(spark, pairs)
    cutoff = 4
    got = sorted(r.path for r in all_simple_paths(e, 0, 4, cutoff).collect())
    g = nx.DiGraph(pairs)
    want = sorted(
        "->".join(map(str, p)) for p in nx.all_simple_paths(g, 0, 4, cutoff=cutoff)
    )
    assert got == want
    hops = {r.path: r.hops for r in all_simple_paths(e, 0, 4, cutoff).collect()}
    for p, h in hops.items():
        assert h == p.count("->")


def test_all_simple_paths_no_path(spark):
    e = edges_df(spark, [(0, 1), (1, 2)])
    assert all_simple_paths(e, 2, 0, 5).count() == 0
