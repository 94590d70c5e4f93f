"""ApproxBetweenness (eps-delta path sampling) + diameter estimators.

Mirrors ``networkit/test/test_centrality.py:32-35`` (deterministic sample
count 63026 on looptest1 at eps=.01 delta=.1) and the reference's
approx-vs-exact quality checks.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.approx_betweenness import (
    approx_betweenness,
    num_samples,
    vertex_diameter_pedantic,
)

INPUT = "/root/reference/input"

PATH5 = [(0, 1), (1, 2), (2, 3), (3, 4)]


@pytest.mark.skipif(not os.path.isdir(INPUT), reason="fixtures absent")
def test_sample_count_anchor_looptest1(spark):
    """test_centrality.py:32-35: eps=.01, delta=.1 on looptest1 -> 63026."""
    from networkit_spark.sources.edgelist import read_gml

    _, edges, _ = read_gml(spark, f"{INPUT}/looptest1.gml")
    vd = vertex_diameter_pedantic(edges)
    assert vd == 10
    assert num_samples(vd, 0.01, 0.1) == 63026


def test_num_samples_formula():
    # ApproxBetweenness.cpp:45 spot values
    assert num_samples(2, 0.1, 0.1) == 0
    assert num_samples(10, 0.1, 0.1) == 631


def test_approx_matches_exact_on_path(spark):
    from networkit_spark.operators.betweenness import betweenness

    e = symmetrize(edges_df(spark, PATH5))
    nodes = nodes_range(spark, 5)
    scores, r = approx_betweenness(e, nodes, eps=0.1, delta=0.1, seed=7)
    assert r > 0
    approx = {row["node"]: row["score"] for row in scores.collect()}
    exact_raw = {row["node"]: row["score"] for row in betweenness(e, nodes).collect()}
    n = 5
    for v in range(5):
        expected = exact_raw[v] / (n * (n - 1))  # RK estimates bc/(n(n-1))
        assert abs(approx[v] - expected) < 3 * 0.1, (v, approx[v], expected)


def test_vertex_diameter_pedantic_path(spark):
    e = symmetrize(edges_df(spark, PATH5))
    # BFS from node 0 on P5: d1=4, d2=3 -> vd = 8
    assert vertex_diameter_pedantic(e) == 8


def test_vertex_diameter_two_components(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (2, 3), (3, 4)]))
    # comp {0,1}: d1=1,d2=0(?) -> from 0: dists {0,1} -> 1+0... two largest
    # with multiplicity: [1, 0] -> 1; comp {2,3,4} from 2: [2,1,0] -> 3
    assert vertex_diameter_pedantic(e) == 4


def test_diameter_ifub(spark):
    from networkit_spark.operators.distance import diameter_double_sweep, diameter_ifub

    p5 = symmetrize(edges_df(spark, PATH5))
    assert diameter_ifub(p5) == 4
    star = symmetrize(edges_df(spark, [(0, i) for i in range(1, 6)]))
    assert diameter_ifub(star) == 2
    c6 = symmetrize(edges_df(spark, [(i, (i + 1) % 6) for i in range(6)]))
    assert diameter_ifub(c6) == 3
    # iFub exact >= double-sweep lower bound always
    assert diameter_ifub(p5) >= diameter_double_sweep(p5)


def test_walks_deterministic_across_partitioning(spark):
    from networkit_spark.operators.walks import random_walks

    e = symmetrize(edges_df(spark, [(i, (i + 1) % 10) for i in range(10)] + [(0, 5)]))
    w1 = {tuple(r) for r in random_walks(e, length=4).collect()}
    e2 = e.repartition(7)
    w2 = {tuple(r) for r in random_walks(e2, length=4).collect()}
    assert w1 == w2


def test_matching_fixed_equals_converged(spark):
    from networkit_spark.operators.matching import (
        is_valid_matching,
        local_max_matching,
        local_max_matching_fixed,
    )

    pairs = [(i, (i * 3 + 1) % 20) for i in range(20)] + [(i, (i + 1) % 20) for i in range(20)]
    e = symmetrize(edges_df(spark, [(a, b) for a, b in pairs if a != b]))
    conv = {tuple(r) for r in local_max_matching(e).collect()}
    fixed = {tuple(r) for r in local_max_matching_fixed(e, rounds=16).collect()}
    assert conv == fixed
    from networkit_spark.graph import edges_df as _  # noqa: F401

    got = local_max_matching_fixed(e, rounds=16)
    assert is_valid_matching(got)
