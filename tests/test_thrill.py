"""Thrill binary I/O: byte-compat vs a reference-replica writer + roundtrip.

ThrillGraphBinaryWriter.cpp stores, per node u in sequence, a varint7
degree then uint32-LE neighbors with v >= u; the reader symmetrizes via
addHalfEdge/completeGraph. Single-shard output must be byte-identical to
the sequential replica; multi-shard write/read must roundtrip the edge set.
"""

import pytest

from networkit_spark.sources.thrill import read_thrill, write_thrill


def _replica_bytes(n, half_edges):
    """Sequential replica of ThrillGraphBinaryWriter.cpp."""
    adj = {u: [] for u in range(n)}
    for u, v in half_edges:
        adj[min(u, v)].append(max(u, v))
    out = bytearray()
    for u in range(n):
        nbrs = sorted(set(adj[u]))
        deg = len(nbrs)
        if not deg:
            out.append(0)
        d = deg
        while d:
            b = d & 0x7F
            d >>= 7
            out.append(b | (0x80 if d else 0))
        for v in nbrs:
            out += int(v).to_bytes(4, "little")
    return bytes(out)


EDGES = [(0, 1), (0, 2), (1, 2), (2, 5), (3, 3), (4, 6), (5, 6)]
N = 8  # node 7 isolated


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def test_write_single_shard_byte_identical(spark, tmp_path):
    import os

    out = str(tmp_path / "g.thrill")
    write_thrill(_edges_df(spark, EDGES), N, out, shards=1)
    files = sorted(os.listdir(out))
    assert files == ["part-00000"]
    with open(os.path.join(out, files[0]), "rb") as f:
        got = f.read()
    assert got == _replica_bytes(N, EDGES)


@pytest.mark.parametrize("shards", [1, 3])
def test_roundtrip(spark, tmp_path, shards):
    out = str(tmp_path / f"g{shards}.thrill")
    write_thrill(_edges_df(spark, EDGES), N, out, shards=shards)
    nodes, edges = read_thrill(spark, out)
    assert nodes.count() == N
    got = {(r.src, r.dst) for r in edges.collect()}
    want = set()
    for a, b in EDGES:
        want.add((a, b))
        if a != b:
            want.add((b, a))
    assert got == want


def test_degree_128_varint_two_bytes(spark, tmp_path):
    """Degree >= 128 exercises the multi-byte varint path."""
    n = 130
    pairs = [(0, v) for v in range(1, 129)]  # deg(0) = 128
    out = str(tmp_path / "big.thrill")
    write_thrill(_edges_df(spark, pairs), n, out, shards=2)
    nodes, edges = read_thrill(spark, out)
    assert nodes.count() == n
    assert edges.filter("src = 0").count() == 128
    assert edges.filter("dst = 0").count() == 128
