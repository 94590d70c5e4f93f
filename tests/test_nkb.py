"""NetworkitBinary (.nkbg003): varint codec, fixture golden vs the KONECT
twin of the same graph, and write->read roundtrips."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.edgelist import read_konect
from networkit_spark.sources.nkb import (
    read_networkit_binary,
    varint_decode,
    varint_encode,
    write_networkit_binary,
    zigzag_decode,
    zigzag_encode,
)

FOODWEB_NKB = "/root/reference/input/foodweb-baydry.nkbg003"
FOODWEB_KONECT = "/root/reference/input/foodweb-baydry.konect"


def test_varint_roundtrip_boundaries():
    vals = [0, 1, 2, 127, 128, 255, 256, 2**14 - 1, 2**14, 2**21, 2**49 - 1,
            2**56 - 1, 2**56, 2**63, 2**64 - 1]
    for v in vals:
        buf = varint_encode(v)
        got, pos = varint_decode(buf, 0)
        assert got == v and pos == len(buf), v
    # concatenated stream decodes sequentially
    stream = b"".join(varint_encode(v) for v in vals)
    pos = 0
    for v in vals:
        got, pos = varint_decode(stream, pos)
        assert got == v
    assert pos == len(stream)


def test_zigzag():
    for v in [0, 1, -1, 2, -2, 63, -64, 2**31, -(2**31)]:
        assert zigzag_decode(zigzag_encode(v)) == v


@pytest.mark.skipif(
    not __import__("os").path.exists(FOODWEB_NKB), reason="fixture absent"
)
def test_foodweb_golden_matches_konect(spark):
    """The nkbg003 and KONECT fixtures encode the same graph
    (IOGTest.cpp:851-860: directed, 128 nodes, 2137 edges,
    w(0,1)=1.261404, w(127,48)=0.03050447)."""
    nodes, edges, directed = read_networkit_binary(spark, FOODWEB_NKB)
    assert directed
    assert nodes.count() == 128
    rows = {(r.src, r.dst): r.weight for r in edges.collect()}
    assert len(rows) == 2137
    assert abs(rows[(0, 1)] - 1.261404) < 1e-12
    assert abs(rows[(127, 48)] - 0.03050447) < 1e-12
    _n2, e2 = read_konect(spark, FOODWEB_KONECT, directed=True)
    kon = {(r.src, r.dst): r.weight for r in e2.collect()}
    assert rows == kon


def test_roundtrip_directed_weighted(spark, tmp_path):
    n = 50
    e = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            ((F.col("id") * 7 + 3) % n).alias("dst"),
            (1.0 + (F.col("id") % 5) / 4.0).alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    p = str(tmp_path / "g.nkbg")
    write_networkit_binary(e, n, p, directed=True, weighted=True, chunks=7)
    nodes, back, directed = read_networkit_binary(spark, p)
    assert directed and nodes.count() == n
    want = {(r.src, r.dst): r.weight for r in e.collect()}
    got = {(r.src, r.dst): r.weight for r in back.collect()}
    assert got == want


def test_roundtrip_undirected_unweighted(spark, tmp_path):
    n = 40
    e = (
        spark.range(n)
        .select(
            F.least(F.col("id"), (F.col("id") * 3 + 1) % n).alias("src"),
            F.greatest(F.col("id"), (F.col("id") * 3 + 1) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    p = str(tmp_path / "u.nkbg")
    write_networkit_binary(e, n, p, directed=False, weighted=False, chunks=5)
    nodes, back, directed = read_networkit_binary(spark, p)
    assert not directed and nodes.count() == n
    want = {(r.src, r.dst) for r in e.collect()}
    got = [(r.src, r.dst) for r in back.collect()]
    assert all(a <= b for a, b in got)
    assert set(got) == want and len(got) == len(want)
    assert all(abs(r.weight - 1.0) < 1e-12 for r in back.collect())
