"""Writer/reader roundtrips: GML, GraphML, METIS, edge-list cover."""

from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.sources.edgelist import (
    read_gml,
    read_graphml,
    read_metis,
    write_gml,
    write_graphml,
    write_metis,
)
from networkit_spark.sources.partitions import read_edgelist_cover


def _canon(spark, n=15):
    pairs = {(min(i, (i * 4 + 1) % n), max(i, (i * 4 + 1) % n)) for i in range(n)}
    pairs = sorted((a, b) for a, b in pairs if a != b)
    return edges_df(spark, pairs).withColumn(
        "weight", (1.0 + (F.col("src") % 3) / 2.0)
    )


def test_gml_roundtrip_directed_and_undirected(spark, tmp_path):
    n = 15
    e = _canon(spark, n)
    nodes = nodes_range(spark, n)
    p = str(tmp_path / "d.gml")
    write_gml(e, nodes, p, directed=True)
    nids, back, directed = read_gml(spark, p)
    assert directed and nids.count() == n
    assert {(r.src, r.dst, r.weight) for r in back.collect()} == {
        (r.src, r.dst, r.weight) for r in e.collect()
    }
    p2 = str(tmp_path / "u.gml")
    write_gml(e, nodes, p2, directed=False)
    _nids, back2, directed2 = read_gml(spark, p2)
    assert not directed2
    want = {(r.src, r.dst) for r in symmetrize(e).collect()}
    assert {(r.src, r.dst) for r in back2.collect()} == want


def test_graphml_roundtrip(spark, tmp_path):
    n = 12
    e = _canon(spark, n)
    nodes = nodes_range(spark, n)
    p = str(tmp_path / "g.graphml")
    write_graphml(e, nodes, p, directed=True)
    nids, back, directed = read_graphml(spark, p)
    assert directed
    # string ids n0..n11 dictionary-encode by lexicographic rank; map back
    raw2id = {r.raw: r.id for r in nids.collect()}
    id2orig = {v: int(k[1:]) for k, v in raw2id.items()}
    got = {
        (id2orig[r.src], id2orig[r.dst], r.weight) for r in back.collect()
    }
    assert got == {(r.src, r.dst, r.weight) for r in e.collect()}


def test_metis_roundtrip(spark, tmp_path):
    n = 15
    e = symmetrize(_canon(spark, n).drop("weight").withColumn("weight", F.lit(1.0)))
    p = str(tmp_path / "g.graph")
    write_metis(e, n, p, weighted=False)
    nodes, back = read_metis(spark, p)
    assert {(r.src, r.dst) for r in back.collect()} == {
        (r.src, r.dst) for r in e.collect()
    }


def test_edgelist_cover_reader(spark, tmp_path):
    p = str(tmp_path / "c.cover")
    with open(p, "w") as f:
        f.write("# comment\n")
        f.write("1 0 2\n")   # node 0 (1-based) in subsets 0 and 2
        f.write("2 1\n")
        f.write("3 0 1\n")
    got = sorted(
        (r.node, r.subset) for r in read_edgelist_cover(spark, p, first_node=1).collect()
    )
    assert got == [(0, 0), (0, 2), (1, 1), (2, 0), (2, 1)]
