"""Luby MIS + Jones-Plassmann coloring property tests.

The reference exposes independent-set / greedy-coloring passes only as
sequential building blocks (greedy orderings in cpp/scd/*, matching in
cpp/matching/*); these tests assert the defining invariants of the parallel
replacements instead of golden values:

- MIS: independence (no edge inside the set) + maximality (every node outside
  the set has a neighbor inside) + convergence.
- Coloring: properness (no edge monochromatic) + completeness + the greedy
  bound (n_colors <= maxDegree + 1).
"""

import random

from pyspark.sql import functions as F

from networkit_spark.operators.mis_coloring import JonesPlassmannColoring, LubyMIS


def _sym_edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(set(both))], "src long, dst long"
    )


def _gnp(n, p, seed):
    rng = random.Random(seed)
    return [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < p]


def test_luby_mis_independent_and_maximal(spark):
    pairs = _gnp(120, 0.05, seed=3)
    e = _sym_edges(spark, pairs)
    nodes = spark.range(120).select(F.col("id"))
    res = LubyMIS(seed=7).run(e, nodes)
    assert res.converged
    mis = {r.node for r in res.mis_df.filter("in_mis").collect()}
    # independence: no edge with both endpoints in the MIS
    assert not any(a in mis and b in mis for a, b in pairs)
    # maximality: every non-member has a MIS neighbor (isolated nodes are in)
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for v in range(120):
        if v not in mis:
            assert nbrs.get(v, set()) & mis, f"node {v} excluded with no MIS neighbor"


def test_luby_mis_isolated_and_clique(spark):
    # triangle + isolated node: MIS has exactly 1 triangle node + the isolate
    pairs = [(0, 1), (1, 2), (0, 2)]
    e = _sym_edges(spark, pairs)
    nodes = spark.range(4).select(F.col("id"))
    res = LubyMIS(seed=1).run(e, nodes)
    mis = {r.node for r in res.mis_df.filter("in_mis").collect()}
    assert 3 in mis
    assert len(mis & {0, 1, 2}) == 1


def test_jones_plassmann_proper_complete_bounded(spark):
    pairs = _gnp(100, 0.08, seed=11)
    e = _sym_edges(spark, pairs)
    nodes = spark.range(100).select(F.col("id"))
    res = JonesPlassmannColoring(seed=7, max_rounds=200).run(e, nodes)
    assert res.converged
    colors = {r.node: r.color for r in res.colors_df.collect()}
    # completeness: every node colored
    assert set(colors) == set(range(100))
    # properness: no monochromatic edge
    assert not any(colors[a] == colors[b] for a, b in pairs)
    # greedy bound: <= maxDegree + 1 colors, colors are 0-based dense-ish
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert res.n_colors <= max(deg.values()) + 1
    assert min(colors.values()) == 0


def test_jones_plassmann_bipartite_two_colors(spark):
    # even cycle is 2-colorable; JP may use more but must stay proper.
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    e = _sym_edges(spark, pairs)
    res = JonesPlassmannColoring(seed=5, max_rounds=100).run(
        e, spark.range(n).select(F.col("id"))
    )
    colors = {r.node: r.color for r in res.colors_df.collect()}
    assert res.converged and len(colors) == n
    assert not any(colors[a] == colors[b] for a, b in pairs)
    assert res.n_colors <= 3  # cycle: JP needs at most 3
