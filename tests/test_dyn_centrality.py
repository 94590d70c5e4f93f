"""Incremental centrality: affected-source Brandes + warm-start Katz must
match from-scratch recompute exactly / within tol."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import symmetrize
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.centrality import katz_centrality
from networkit_spark.streaming.dyn_centrality import (
    betweenness_init,
    betweenness_scores,
    betweenness_update,
    katz_warm,
)


def _und(spark, pairs):
    df = spark.createDataFrame(list(pairs), "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    return symmetrize(df)


def test_dyn_betweenness_matches_full_recompute(spark):
    # two stars + a chain; then connect the far ends
    base = [(0, i) for i in range(1, 5)] + [(10, i) for i in range(11, 15)] + [
        (4, 10)
    ]
    e0 = _und(spark, base)
    nodes = spark.range(15)
    sources = spark.range(15)  # exact
    st = betweenness_init(e0, nodes, sources)
    new = [(1, 11), (2, 12)]
    new_sym = new + [(b, a) for a, b in new]
    new_df = spark.createDataFrame(new_sym, "src long, dst long")
    st2, n_aff = betweenness_update(st, new_df)
    assert n_aff > 0
    got = {r["node"]: r["score"] for r in betweenness_scores(st2).collect()}
    e1 = _und(spark, base + new)
    exp = {r["node"]: r["score"] for r in betweenness(e1, nodes).collect()}
    assert set(got) | {n for n, s in exp.items() if s == 0.0} == set(exp) | set(got)
    for n_, s in exp.items():
        assert got.get(n_, 0.0) == pytest.approx(s, abs=1e-9), n_


def test_dyn_betweenness_prunes_unaffected_sources(spark):
    # long path; an edge added at one end leaves far sources' DAGs intact
    n = 20
    base = [(i, i + 1) for i in range(n - 1)]
    e0 = _und(spark, base)
    st = betweenness_init(e0, spark.range(n), spark.range(n))
    # add a shortcut at the left end: (0, 2)
    new_df = spark.createDataFrame([(0, 2), (2, 0)], "src long, dst long")
    st2, n_aff = betweenness_update(st, new_df)
    # sources far to the right already reach 2 via 1 at dist <= its
    # alternative; only sources where d(u)+1 <= d(v) for (0,2)/(2,0) recompute
    assert 0 < n_aff < n
    got = {r["node"]: r["score"] for r in betweenness_scores(st2).collect()}
    exp = {r["node"]: r["score"]
           for r in betweenness(_und(spark, base + [(0, 2)]), spark.range(n)).collect()}
    for n_, s in exp.items():
        assert got.get(n_, 0.0) == pytest.approx(s, abs=1e-9), n_


def test_dyn_betweenness_noop_batch(spark):
    # adding an existing edge affects nobody
    base = [(0, 1), (1, 2), (2, 3)]
    e0 = _und(spark, base)
    st = betweenness_init(e0, spark.range(4), spark.range(4))
    st2, n_aff = betweenness_update(
        st, spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    )
    assert n_aff == 0


def test_katz_warm_matches_cold(spark):
    base = [(i, i + 1) for i in range(30)] + [(0, 15), (5, 25)]
    e0 = _und(spark, base)
    st0 = katz_warm(e0, None, alpha=0.05, tol=1e-10)
    e1 = _und(spark, base + [(3, 27), (8, 22)])
    warm = katz_warm(e1, st0, alpha=0.05, tol=1e-10)
    cold = katz_warm(e1, None, alpha=0.05, tol=1e-10)
    ref = katz_centrality(e1, alpha=0.05, tol=1e-12)
    exp = {r["node"]: r["score"] for r in ref.scores_df.collect()}
    got = {r["node"]: r["score"] for r in warm.scores.collect()}
    for n_, s in exp.items():
        assert got[n_] == pytest.approx(s, abs=1e-5)
    # warm start from the previous fixed point converges faster than cold
    assert warm.iterations < cold.iterations
