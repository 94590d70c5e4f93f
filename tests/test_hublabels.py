"""Pruned landmark labeling: exact all-pairs queries (batch=1 == sequential
PLL; batched variant stays exact), label-size sanity on a star."""

import networkx as nx
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range
from networkit_spark.operators.hublabels import hub_distances, pruned_landmark_labels


def _toy(n=18):
    pairs = {(min(i, (i * 3 + 1) % n), max(i, (i * 3 + 1) % n)) for i in range(n)}
    pairs |= {(min(i, (i * 5 + 2) % n), max(i, (i * 5 + 2) % n)) for i in range(n)}
    return sorted((a, b) for a, b in pairs if a != b)


def _all_pairs(spark, n):
    a = spark.range(n).select(F.col("id").alias("u"))
    b = spark.range(n).select(F.col("id").alias("v"))
    return a.crossJoin(b).filter(F.col("u") < F.col("v"))


def test_pll_exact_queries_batched_and_sequentialish(spark):
    n = 18
    pairs = _toy(n)
    e = edges_df(spark, pairs)
    g = nx.Graph(pairs)
    want = {
        (u, v): d
        for u, lens in nx.all_pairs_shortest_path_length(g)
        for v, d in lens.items()
        if u < v
    }
    for batch in (1, 6, 32):
        labels = pruned_landmark_labels(e, nodes_range(spark, n), batch=batch)
        got = {
            (r.u, r.v): r.dist
            for r in hub_distances(labels, _all_pairs(spark, n)).collect()
        }
        assert got == want, f"batch={batch}"


def test_pll_star_labels_are_small(spark):
    n = 20
    pairs = [(0, i) for i in range(1, n)]
    e = edges_df(spark, pairs)
    # batch=1 == sequential PLL: the center (highest degree, first hub)
    # covers everything, so every later hub keeps only its own root entry ->
    # O(n) labels, nowhere near the n^2 all-pairs table. (Bigger batches
    # trade label size for wave count: batch-mates can't prune each other.)
    labels = pruned_landmark_labels(e, nodes_range(spark, n), batch=1)
    assert labels.count() <= 3 * n
    got = {
        (r.u, r.v): r.dist
        for r in hub_distances(labels, _all_pairs(spark, n)).collect()
    }
    assert got[(1, 2)] == 2 and got[(0, 5)] == 1
