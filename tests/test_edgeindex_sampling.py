"""index_edges / sort_edges / seeded sampling (Graph::indexEdges,
GraphTools::randomEdges analogs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.edgeindex import index_edges, sort_edges
from networkit_spark.operators.sampling import (
    seeded_edge_sample,
    seeded_node_sample,
)


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        (u, v, 1.0)
        for u in range(40)
        for v in [(u * 2 + 1) % 40, (u * 3 + 7) % 40, (u * 5 + 11) % 40]
        if u != v
    ]
    return spark.createDataFrame(
        sorted(set(rows)), "src long, dst long, weight double"
    )


def test_index_edges_directed_is_rank(edges):
    out = index_edges(edges, directed=True).collect()
    m = edges.distinct().count()
    ids = sorted(r["edge_id"] for r in out)
    assert ids == list(range(m))  # consecutive 0-based, no gaps/dups
    by_rank = sorted(out, key=lambda r: (r["src"], r["dst"]))
    assert [r["edge_id"] for r in by_rank] == list(range(m))  # rank order


def test_index_edges_rank_stable_under_partitioning(edges):
    a = {(r["src"], r["dst"]): r["edge_id"]
         for r in index_edges(edges.repartition(13), directed=True).collect()}
    b = {(r["src"], r["dst"]): r["edge_id"]
         for r in index_edges(edges.coalesce(1), directed=True).collect()}
    assert a == b


def test_index_edges_undirected_shares_id(spark, edges):
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    out = index_edges(und, directed=False).collect()
    ids = {}
    for r in out:
        key = (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        ids.setdefault(key, set()).add(r["edge_id"])
    # both orientations carry the same id; ids consecutive over canon pairs
    assert all(len(v) == 1 for v in ids.values())
    all_ids = sorted(next(iter(v)) for v in ids.values())
    assert all_ids == list(range(len(ids)))


def test_sort_edges_preserves_rows(edges):
    out = sort_edges(edges, num_partitions=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, edges.collect()))


def test_seeded_edge_sample_deterministic_and_subset(edges):
    s1 = set(map(tuple, seeded_edge_sample(edges, 0.3, seed=5).collect()))
    s2 = set(
        map(tuple, seeded_edge_sample(edges.repartition(7), 0.3, seed=5).collect())
    )
    assert s1 == s2  # partitioning-independent
    assert s1 <= set(map(tuple, edges.collect()))
    s3 = set(map(tuple, seeded_edge_sample(edges, 0.3, seed=6).collect()))
    assert s1 != s3  # seed actually matters


def test_for_node_pairs_semantics_and_guard(spark):
    from networkit_spark.plans.pairs import for_node_pairs

    nodes = spark.range(12).select(F.col("id").alias("node"))
    pairs = set(map(tuple, for_node_pairs(nodes, "node").collect()))
    assert pairs == {(u, v) for u in range(12) for v in range(12) if u < v}
    with pytest.raises(ValueError, match="quadratic"):
        for_node_pairs(spark.range(30).select(F.col("id").alias("node")),
                       "node", max_nodes=10)


def test_seeded_node_sample_fraction(spark):
    nodes = spark.range(5000).select(F.col("id").alias("node"))
    got = seeded_node_sample(nodes, 0.2, seed=3).count()
    assert abs(got / 5000 - 0.2) < 0.03  # uniform draw, 3σ ≈ 0.017
