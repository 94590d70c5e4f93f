"""DibaP binary format: hand-built golden (byte layout from
``DibapGraphReader.cpp``) + writer/reader roundtrips."""

import struct

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.dibap import read_dibap, write_dibap


def _golden_bytes() -> bytes:
    # Triangle 0-1-2 plus pendant 3 on node 2, edge weights 5,6,7,8:
    # edges (0,1,w5) (0,2,w6) (1,2,w7) (2,3,w8); symmetric CSR.
    adj = {0: [1, 2], 1: [0, 2], 2: [0, 1, 3], 3: [2]}
    wts = {(0, 1): 5, (0, 2): 6, (1, 2): 7, (2, 3): 8}
    of, to, ew = [0], [], []
    for u in range(4):
        for v in adj[u]:
            to.append(v)
            ew.append(wts[(min(u, v), max(u, v))])
        of.append(len(to))
    buf = b"GI" + struct.pack(">ii", 4, 0)
    buf += b"".join(struct.pack(">i", x) for x in of)
    buf += b"".join(struct.pack(">i", x) for x in to)
    buf += struct.pack(">i", 1)
    buf += b"".join(struct.pack(">i", x) for x in ew)
    buf += struct.pack(">i", 0)
    return buf


def test_dibap_golden(spark, tmp_path):
    p = str(tmp_path / "g.dib")
    with open(p, "wb") as f:
        f.write(_golden_bytes())
    nodes, edges = read_dibap(spark, p)
    assert nodes.count() == 4
    got = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    assert got == {(0, 1): 5.0, (0, 2): 6.0, (1, 2): 7.0, (2, 3): 8.0}


def test_dibap_golden_unweighted_with_vertex_weights(spark, tmp_path):
    # dvw=2 vertex weights are skipped; dew=0 -> weight 1.0; self-loop kept.
    buf = b"GI" + struct.pack(">ii", 2, 2)
    buf += b"".join(struct.pack(">i", x) for x in [9, 9, 9, 9])  # vw
    buf += b"".join(struct.pack(">i", x) for x in [0, 2, 3])  # of
    buf += b"".join(struct.pack(">i", x) for x in [0, 1, 0])  # to: loop(0),0-1
    buf += struct.pack(">ii", 0, 0)
    p = str(tmp_path / "g2.dib")
    with open(p, "wb") as f:
        f.write(buf)
    nodes, edges = read_dibap(spark, p)
    got = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    assert got == {(0, 0): 1.0, (0, 1): 1.0}


@pytest.mark.parametrize("weighted", [False, True])
def test_dibap_roundtrip(spark, tmp_path, weighted):
    rows = [(0, 1, 3.0), (0, 4, 2.0), (1, 2, 9.0), (2, 2, 4.0), (3, 4, 1.0)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    if not weighted:
        df = df.withColumn("weight", F.lit(1.0))
    p = str(tmp_path / "rt.dib")
    write_dibap(df, 5, p, weighted=weighted)
    nodes, back = read_dibap(spark, p, tasks=3)
    assert nodes.count() == 5
    want = {(r[0], r[1]): r[2] for r in df.collect()}
    got = {(r["src"], r["dst"]): r["weight"] for r in back.collect()}
    assert got == want
