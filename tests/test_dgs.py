"""DGS004 stream parser/writer vs the reference fixture example2.dgs
(DGSStreamParser.cpp semantics: mapped first-appearance ids, direct
baseIndex offset, tag set st/an/ae/ce/ie/de/dn/rn)."""

import os

import pytest

from networkit_spark.streaming.dgs import read_dgs, write_dgs

FIXTURE = "/root/reference/input/example2.dgs"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture absent")
def test_example2_mapped(spark):
    ev = sorted(
        (r.seq, r.etype, r.u, r.v, r.w) for r in read_dgs(spark, FIXTURE, mapped=True).collect()
    )
    # first appearances: "1"->0, "2"->1, "3"->2, "4"->3, "5"->4, "6"->5
    assert ev[0] == (0, "NODE_ADDITION", 0, None, None)
    assert ev[1] == (1, "NODE_ADDITION", 1, None, None)
    assert ev[2] == (2, "EDGE_ADDITION", 0, 1, 1.0)
    assert ev[3] == (3, "TIME_STEP", None, None, None)
    assert ev[4] == (4, "EDGE_WEIGHT_UPDATE", 0, 1, 2.0)
    assert ev[5] == (5, "EDGE_REMOVAL", 0, 1, None)
    assert ev[6] == (6, "NODE_REMOVAL", 0, None, None)
    types = [e[1] for e in ev]
    assert types.count("NODE_ADDITION") == 6
    assert "NODE_RESTORATION" in types  # the 'rn 6' line
    # 'ae 3-4 3 4 weight=5' under first-appearance mapping: 3->2, 4->3
    assert (10, "EDGE_ADDITION", 2, 3, 5.0) in ev


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture absent")
def test_example2_direct_base1(spark):
    ev = {r.seq: (r.etype, r.u, r.v, r.w) for r in read_dgs(spark, FIXTURE, base_index=1).collect()}
    assert ev[0] == ("NODE_ADDITION", 0, None, None)
    assert ev[2] == ("EDGE_ADDITION", 0, 1, 1.0)
    # direct mode: 'ae 5-3 5 3 weight=2' -> (4, 2)
    assert ev[12] == ("EDGE_ADDITION", 4, 2, 2.0)


def test_dgs_roundtrip(spark, tmp_path):
    rows = [
        (0, "NODE_ADDITION", 0, None, None),
        (1, "NODE_ADDITION", 1, None, None),
        (2, "EDGE_ADDITION", 0, 1, 2.5),
        (3, "TIME_STEP", None, None, None),
        (4, "EDGE_WEIGHT_INCREMENT", 0, 1, 1.5),
        (5, "EDGE_REMOVAL", 0, 1, None),
        (6, "NODE_REMOVAL", 1, None, None),
        (7, "NODE_RESTORATION", 1, None, None),
    ]
    ev = spark.createDataFrame(rows, "seq long, etype string, u long, v long, w double")
    p = str(tmp_path / "out.dgs")
    write_dgs(ev, p)
    back = sorted(
        (r.seq, r.etype, r.u, r.v, r.w) for r in read_dgs(spark, p, base_index=0).collect()
    )
    assert back == rows
