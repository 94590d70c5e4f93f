"""LFM local expansion (LFMLocal.cpp:12-100 fitness/greedy semantics)."""

from pyspark.sql import functions as F

from networkit_spark.graph import symmetrize
from networkit_spark.operators.scd import lfm_local


def _und(spark, pairs):
    df = spark.createDataFrame(list(pairs), "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    return symmetrize(df)


def _clique(lo, k):
    return [(lo + i, lo + j) for i in range(k) for j in range(i + 1, k)]


def test_lfm_recovers_planted_clique(spark):
    # two 6-cliques joined by one bridge edge
    und = _clique(0, 6) + _clique(10, 6) + [(0, 10)]
    e = _und(spark, und)
    m = lfm_local(e, seeds=[3, 13], alpha=1.0)
    got = {}
    for r in m.collect():
        got.setdefault(r["seed"], set()).add(r["node"])
    assert got[3] == set(range(0, 6))
    assert got[13] == set(range(10, 16))


def test_lfm_seed_kept_and_deterministic(spark):
    und = _clique(0, 5) + [(4, 20), (20, 21)]
    e = _und(spark, und)
    a = lfm_local(e, seeds=[20], alpha=1.0)
    b = lfm_local(e, seeds=[20], alpha=1.0)
    sa = sorted((r["seed"], r["node"]) for r in a.collect())
    sb = sorted((r["seed"], r["node"]) for r in b.collect())
    assert sa == sb
    assert (20, 20) in sa  # seed never dropped


def test_lfm_isolated_seed_stays_singleton(spark):
    und = _clique(0, 4)
    e = _und(spark, und)
    m = lfm_local(e, seeds=[99], alpha=1.0)
    rows = [(r["seed"], r["node"]) for r in m.collect()]
    assert rows == [(99, 99)]
