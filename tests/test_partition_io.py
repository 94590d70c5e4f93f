"""Partition/Cover I/O roundtrips (CoverReader/Writer, BinaryPartition,
BinaryEdgeListPartition semantics)."""

from networkit_spark.sources.edgelist import read_partition
from networkit_spark.sources.partitions import (
    read_binary_edgelist_partition,
    read_binary_partition,
    read_cover,
    write_binary_edgelist_partition,
    write_binary_partition,
    write_cover,
    write_partition,
)


def _labels(spark, n=25, k=4):
    return spark.range(n).selectExpr("id AS node", f"id % {k} AS label")


def test_text_partition_roundtrip(spark, tmp_path):
    lab = _labels(spark)
    p = str(tmp_path / "p.partition")
    write_partition(lab, p)
    back = {(r.node, r.label) for r in read_partition(spark, p).collect()}
    assert back == {(r.node, r.label) for r in lab.collect()}


def test_cover_roundtrip_and_comments(spark, tmp_path):
    p = str(tmp_path / "c.cover")
    with open(p, "w") as f:
        f.write("# a comment line does not consume a subset id\n")
        f.write("0 1 2\n")
        f.write("2 3\n")  # node 2 overlaps both subsets
        f.write("4\n")
    got = sorted((r.node, r.subset) for r in read_cover(spark, p).collect())
    assert got == [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1), (4, 2)]
    p2 = str(tmp_path / "c2.cover")
    write_cover(read_cover(spark, p), p2)
    back = sorted((r.node, r.subset) for r in read_cover(spark, p2).collect())
    assert back == got


def test_binary_partition_roundtrip_widths(spark, tmp_path):
    lab = _labels(spark, 30, 5)
    want = {(r.node, r.label) for r in lab.collect()}
    for width in (4, 8):
        p = str(tmp_path / f"b{width}.bin")
        write_binary_partition(lab, p, width=width)
        got = {(r.node, r.label) for r in read_binary_partition(spark, p, width=width).collect()}
        assert got == want, width


def test_binary_edgelist_partition_roundtrip(spark, tmp_path):
    import os

    lab = _labels(spark, 40, 6)
    want = {(r.node, r.label) for r in lab.collect()}
    d = str(tmp_path / "shards")
    write_binary_edgelist_partition(lab, d, width=8, shards=3)
    paths = sorted(os.path.join(d, f) for f in os.listdir(d))
    got = {
        (r.node, r.label)
        for r in read_binary_edgelist_partition(spark, paths, width=8).collect()
    }
    assert got == want


def test_cover_reference_fixture_golden(spark):
    """IOGTest.cpp:447-458: community_overlapping.cover -> 9 subsets,
    10 member nodes, node 0 in 3 subsets incl. subset 1, node 3 in 1."""
    import os

    import pytest

    path = "/root/reference/input/community_overlapping.cover"
    if not os.path.exists(path):
        pytest.skip("fixture absent")
    cov = read_cover(spark, path)
    rows = [(r.node, r.subset) for r in cov.collect()]
    subsets = {s for _, s in rows}
    # the file's empty first line consumes subset id 0 in the reference too
    # (CoverReader.cpp increments i for every non-'#' line) -> upperBound 9
    assert max(subsets) + 1 == 9 and len(subsets) == 8
    assert len({n for n, _ in rows}) == 10
    of_node0 = {s for n, s in rows if n == 0}
    assert 1 in of_node0 and len(of_node0) == 3
    assert len({s for n, s in rows if n == 3}) == 1
