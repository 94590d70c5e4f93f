"""profiling.py — Profile stat battery + correlation matrix vs numpy.

Reference numbers model: networkit/profiling/profiling.py assembles
per-measure stats and a Spearman correlation heatmap; here the same numbers
come out of DataFrames and are pinned against a straightforward numpy
replica on a small deterministic graph.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.profiling import (
    measure_correlations,
    measure_stats,
    node_measures,
)

# 6-node graph: a triangle 0-1-2, a path 2-3-4, isolated node 5
EDGES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
N = 6


@pytest.fixture(scope="module")
def mt(spark):
    und = spark.createDataFrame(
        [(a, b) for a, b in EDGES] + [(b, a) for a, b in EDGES],
        "src bigint, dst bigint",
    ).withColumn("weight", F.lit(1.0))
    nodes = spark.range(N).withColumnRenamed("id", "id")
    return node_measures(und, nodes, ("degree", "lcc", "triangles"))


def expected_measures():
    deg = np.array([2, 2, 3, 2, 1, 0], dtype=float)
    tri = np.array([1, 1, 1, 0, 0, 0], dtype=float)
    lcc = np.array(
        [2 * t / (d * (d - 1)) if d >= 2 else 0.0 for d, t in zip(deg, tri)]
    )
    return deg, lcc, tri


def test_node_measures(mt):
    rows = {r["node"]: r for r in mt.collect()}
    deg, lcc, tri = expected_measures()
    for i in range(N):
        assert rows[i]["degree"] == deg[i]
        assert rows[i]["triangles"] == tri[i]
        assert abs(rows[i]["lcc"] - lcc[i]) < 1e-9


def test_measure_stats(mt):
    out = {r["measure"]: r for r in measure_stats(mt, ("degree", "lcc", "triangles")).collect()}
    deg, lcc, tri = expected_measures()
    for name, v in (("degree", deg), ("lcc", lcc), ("triangles", tri)):
        r = out[name]
        assert r["n"] == N
        assert r["min"] == pytest.approx(v.min(), abs=1e-6)
        assert r["max"] == pytest.approx(v.max(), abs=1e-6)
        assert r["mean"] == pytest.approx(v.mean(), abs=1e-6)
        assert r["stddev"] == pytest.approx(v.std(ddof=1), abs=1e-6)
        assert r["median"] == pytest.approx(np.percentile(v, 50), abs=1e-6)
        assert r["q1"] == pytest.approx(np.percentile(v, 25), abs=1e-6)
        assert r["q3"] == pytest.approx(np.percentile(v, 75), abs=1e-6)


def _avg_rank(v):
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    i = 0
    sv = v[order]
    pos = 1
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (pos + pos + (j - i) - 1) / 2.0
        pos += j - i
        i = j
    return ranks


def test_measure_correlations(mt):
    out = {(r["m1"], r["m2"]): r for r in measure_correlations(mt, ("degree", "lcc", "triangles")).collect()}
    deg, lcc, tri = expected_measures()
    vals = {"degree": deg, "lcc": lcc, "triangles": tri}
    assert set(out) == {("degree", "lcc"), ("degree", "triangles"), ("lcc", "triangles")}
    for (a, b), r in out.items():
        pearson = np.corrcoef(vals[a], vals[b])[0, 1]
        spearman = np.corrcoef(_avg_rank(vals[a]), _avg_rank(vals[b]))[0, 1]
        assert r["pearson"] == pytest.approx(pearson, abs=1e-6)
        assert r["spearman"] == pytest.approx(spearman, abs=1e-6)


def test_measure_histogram(mt):
    from networkit_spark.profiling import measure_histogram

    out = measure_histogram(mt, "degree", bins=3).collect()
    # degrees [2,2,3,2,1,0]: lo=0, hi=3, w=1 -> bins 0:[0,1) 1:[1,2) 2:[2,3]
    got = {r["bin"]: r["count"] for r in out}
    assert got == {0: 1, 1: 1, 2: 4}
    assert sum(got.values()) == N


def test_profile_one_call(mt, spark):
    from pyspark.sql import functions as F

    from networkit_spark.profiling import profile

    und = spark.createDataFrame(
        [(a, b) for a, b in EDGES] + [(b, a) for a, b in EDGES],
        "src bigint, dst bigint",
    ).withColumn("weight", F.lit(1.0))
    p = profile(und, spark.range(N), ("degree", "lcc"))
    assert p["measures"].count() == N
    assert p["stats"].count() == 2
    assert p["correlations"].count() == 1
    assert {r["measure"] for r in p["histograms"].collect()} == {"degree", "lcc"}
    p["measures"].unpersist()
