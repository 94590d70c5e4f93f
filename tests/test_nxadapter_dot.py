"""nxadapter (nxadapter.py:41 nx2nk / :165 nk2nx analogs) + DOT writer
(DotGraphWriter, graphio.pyx:451-463) roundtrip tests."""

import networkx as nx
import pytest

from networkit_spark.nxadapter import from_networkx, from_networkx_with_map, to_networkx
from networkit_spark.sources.edgelist import read_dot, write_dot


def test_nx_roundtrip_undirected(spark):
    G = nx.Graph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 3.0), (2, 0, 1.5), (3, 4, 1.0)])
    df = from_networkx(spark, G)
    back = to_networkx(df, directed=False)
    assert set(map(frozenset, back.edges)) == set(map(frozenset, G.edges))
    for u, v, d in G.edges(data=True):
        assert back[u][v]["weight"] == d["weight"]


def test_nx_string_labels_dictionary_encoded(spark):
    G = nx.DiGraph()
    G.add_edge("b.com", "a.com")
    G.add_edge("a.com", "c.com")
    df, mapping = from_networkx_with_map(spark, G)
    m = {r.label: r.id for r in mapping.collect()}
    assert m == {"a.com": 0, "b.com": 1, "c.com": 2}  # sorted-label dense ids
    assert {(r.src, r.dst) for r in df.collect()} == {(1, 0), (0, 2)}


def test_to_networkx_guard(spark):
    df = spark.range(10).selectExpr("id as src", "id+1 as dst", "1.0 as weight")
    with pytest.raises(ValueError):
        to_networkx(df, max_edges=5)


def test_dot_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 1.0), (3, 0, 4.0)], "src long, dst long, weight double"
    )
    p = str(tmp_path / "g.dot")
    write_dot(df, p, directed=True)
    back, directed = read_dot(spark, p)
    assert directed
    assert {(r.src, r.dst, r.weight) for r in back.collect()} == {
        (0, 1, 2.5), (1, 2, 1.0), (3, 0, 4.0)
    }
    # undirected variant
    p2 = str(tmp_path / "g2.dot")
    write_dot(df.select("src", "dst"), p2, directed=False)
    back2, directed2 = read_dot(spark, p2)
    assert not directed2
    assert {(r.src, r.dst, r.weight) for r in back2.collect()} == {
        (0, 1, 1.0), (1, 2, 1.0), (3, 0, 1.0)
    }
