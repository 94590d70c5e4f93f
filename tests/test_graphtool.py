"""graph-tool binary (.gt): power.gt fixture golden (IOGTest.cpp:642-649:
4941 nodes, 6594 edges, undirected) + write->read roundtrips."""

import os

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.graphtool import read_graphtool, write_graphtool

POWER = "/root/reference/input/power.gt"


@pytest.mark.skipif(not os.path.exists(POWER), reason="fixture absent")
def test_power_gt_golden(spark):
    nodes, edges, directed = read_graphtool(spark, POWER)
    assert not directed
    assert nodes.count() == 4941
    rows = [(r.src, r.dst) for r in edges.collect()]
    assert len(rows) == 6594
    assert len(set(rows)) == 6594
    assert all(a <= b for a, b in rows)
    assert edges.agg(F.max("dst")).first()[0] < 4941


def test_gt_roundtrip_directed(spark, tmp_path):
    n = 300  # forces 2-byte adjacency width
    e = (
        spark.range(n)
        .select(F.col("id").alias("src"), ((F.col("id") * 7 + 3) % n).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    p = str(tmp_path / "d.gt")
    write_graphtool(e, n, p, directed=True)
    nodes, back, directed = read_graphtool(spark, p, tasks=5)
    assert directed and nodes.count() == n
    assert {(r.src, r.dst) for r in back.collect()} == {
        (r.src, r.dst) for r in e.collect()
    }


def test_gt_roundtrip_undirected_small_width(spark, tmp_path):
    n = 50  # 1-byte width
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
    p = str(tmp_path / "u.gt")
    write_graphtool(e, n, p, directed=False)
    _nodes, back, directed = read_graphtool(spark, p, tasks=3)
    assert not directed
    assert {(r.src, r.dst) for r in back.collect()} == {
        (r.src, r.dst) for r in e.collect()
    }
