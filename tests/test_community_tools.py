"""community.pyx convenience layer (detectCommunities :1640,
inspectCommunities :1673, kCoreCommunityDetection :1831)."""
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.community import (
    detect_communities,
    inspect_communities,
    k_core_community_detection,
)


def test_inspect_communities_hand_values(spark):
    # two triangles joined by one bridge; labels = the two triangles
    e = symmetrize(
        edges_df(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    )
    labels = spark.createDataFrame(
        [(n, 0 if n < 3 else 1) for n in range(6)], "node long, label long"
    )
    props = {r["property"]: r["value"] for r in inspect_communities(e, labels).collect()}
    assert props["# communities"] == 2.0
    assert props["min community size"] == 3.0
    assert props["max community size"] == 3.0
    assert props["avg. community size"] == 3.0
    assert props["imbalance"] == 1.0
    assert props["edge cut"] == 1.0            # the bridge
    assert abs(props["edge cut (portion)"] - 1.0 / 7.0) < 1e-12
    # Q = 6/7 - (7^2 + 7^2)/(14^2)
    assert abs(props["modularity"] - (6.0 / 7.0 - 98.0 / 196.0)) < 1e-12


def test_detect_communities_two_cliques(spark):
    clique = lambda lo: [(a, b) for a in range(lo, lo + 4) for b in range(a + 1, lo + 4)]
    e = symmetrize(edges_df(spark, clique(0) + clique(4) + [(3, 4)]))
    labels, props = detect_communities(e)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert len(set(got.values())) == 2
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(4, 8)}) == 1
    assert {r["property"] for r in props.collect()} >= {"modularity", "edge cut"}


def test_k_core_community_detection(spark):
    # 4-clique (3-core) with pendant path hanging off it
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = symmetrize(edges_df(spark, clique + [(3, 4), (4, 5)]))
    labels = k_core_community_detection(e, k=3)
    nodes = {r["node"] for r in labels.collect()}
    assert nodes == {0, 1, 2, 3}  # pendant path is not in the 3-core
