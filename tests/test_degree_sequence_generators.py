"""Havel-Hakimi (exact), erased configuration model (scale path), and
degree-preserving edge switching (EdgeSwitchingMarkovChainGenerator /
randomization/EdgeSwitching.cpp semantics)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.generators import (
    configuration_model,
    edge_switching,
    havel_hakimi,
    havel_hakimi_edges,
)


def _degrees(edges):
    """und canonical rows -> {node: degree}"""
    out = {}
    for r in edges:
        out[r[0]] = out.get(r[0], 0) + 1
        out[r[1]] = out.get(r[1], 0) + 1
    return out


def test_havel_hakimi_exact_degrees():
    seq = [3, 3, 2, 2, 1, 1]
    edges = havel_hakimi_edges(seq)
    deg = _degrees(edges)
    assert [deg.get(v, 0) for v in range(len(seq))] == seq
    assert len(set(edges)) == len(edges)  # simple
    assert all(a != b for a, b in edges)


def test_havel_hakimi_power_law_sequence():
    # realizable power-law-ish sequence, n=40
    seq = sorted((max(1, 12 // (i + 1)) for i in range(40)), reverse=True)
    if sum(seq) % 2:
        seq[-1] += 1
    edges = havel_hakimi_edges(seq)
    deg = _degrees(edges)
    got = sorted(deg.values(), reverse=True)
    assert got == sorted(seq, reverse=True)


def test_havel_hakimi_rejects_non_graphical():
    with pytest.raises(ValueError):
        havel_hakimi_edges([3, 1])  # even sum, not graphical
    with pytest.raises(ValueError):
        havel_hakimi_edges([1, 1, 1])  # odd sum


def test_driver_generators_guarded_at_scale():
    """Driver-side sequential generators refuse n beyond DRIVER_GEN_MAX_N
    and point at their distributed twins (round-2 verdict item)."""
    from networkit_spark.sources.generators import (
        DRIVER_GEN_MAX_N,
        dorogovtsev_mendes,
    )

    big = DRIVER_GEN_MAX_N + 1
    with pytest.raises(ValueError, match="configuration_model"):
        # len() check fires before any work: a lazy fake list is enough
        class _FakeSeq(list):
            def __len__(self):
                return big

        havel_hakimi_edges(_FakeSeq())
    with pytest.raises(ValueError, match="barabasi_albert"):
        dorogovtsev_mendes(None, big)


def test_havel_hakimi_dataframe(spark):
    df = havel_hakimi(spark, [2, 2, 2, 1, 1])
    deg = {r["src"]: r["c"] for r in df.groupBy("src").agg(F.count("*").alias("c")).collect()}
    assert deg == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_configuration_model_degrees_and_determinism(spark):
    n = 300
    degs = spark.range(n).select(
        F.col("id").alias("node"),
        (2 + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(5))).cast("int").alias("deg"),
    )
    e = configuration_model(degs, seed=9)
    assert e.filter("src = dst").count() == 0
    und = e.filter("src < dst")
    assert und.count() == und.distinct().count()
    # erased model: realized degree <= requested, and total erasure is small
    got = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    j = got.join(degs, "node")
    assert j.filter("d > deg").count() == 0
    tot_req = degs.agg(F.sum("deg")).first()[0]
    tot_got = j.agg(F.sum("d")).first()[0]
    assert tot_got >= 0.9 * tot_req
    # pure function of (degrees, seed): same edges under different partitioning
    e2 = configuration_model(degs.repartition(7), seed=9)
    assert e.exceptAll(e2).count() == 0 and e2.exceptAll(e).count() == 0


def test_edge_switching_preserves_degrees(spark):
    n = 200
    degs = spark.range(n).select(
        F.col("id").alias("node"),
        (2 + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4))).cast("int").alias("deg"),
    )
    g0 = configuration_model(degs, seed=5).filter("src < dst")
    g1 = edge_switching(g0, rounds=6, seed=11)
    d0 = g0.select(F.explode(F.array("src", "dst")).alias("v")).groupBy("v").count()
    d1 = g1.select(F.explode(F.array("src", "dst")).alias("v")).groupBy("v").count()
    assert d0.exceptAll(d1).count() == 0 and d1.exceptAll(d0).count() == 0
    # stays simple + canonical
    assert g1.filter("src >= dst").count() == 0
    assert g1.count() == g1.distinct().count()
    # the chain actually moved (some switches applied)
    moved = g1.select("src", "dst").exceptAll(g0.select("src", "dst")).count()
    assert moved > 0
    # deterministic
    g2 = edge_switching(g0.repartition(5), rounds=6, seed=11)
    assert g1.select("src", "dst").exceptAll(g2.select("src", "dst")).count() == 0
