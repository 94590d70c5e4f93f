"""PageRankNibble / ApproximatePageRank seed expansion tests."""

import pytest

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.scd import approximate_pagerank, page_rank_nibble

from tests.fixtures import clique_edges


def test_nibble_recovers_seed_clique(spark):
    # two 6-cliques joined by one bridge: sweeping from inside a clique
    # must return exactly that clique (the bridge is the conductance valley)
    k, size = 2, 6
    e = symmetrize(edges_df(spark, clique_edges(k, size) + [(0, size)]))
    got = sorted(r["node"] for r in page_rank_nibble(e, 2, k * size).collect())
    assert got == list(range(size))
    got = sorted(r["node"] for r in page_rank_nibble(e, size + 1, k * size).collect())
    assert got == list(range(size, 2 * size))


def test_apr_mass_conservation(spark):
    # p + res always sums to 1 (the push moves mass, never creates it)
    e = symmetrize(edges_df(spark, clique_edges(1, 5)))
    for rounds in (1, 3, 8):
        pr = approximate_pagerank(e, [0], alpha=0.2, eps=1e-6, fixed_rounds=rounds)
        total = pr.groupBy().sum("p", "res").first()
        assert total[0] + total[1] == pytest.approx(1.0, abs=1e-9)


def test_apr_converges_support_localized(spark):
    # a long path: with a coarse eps the support stays near the seed
    n = 40
    e = symmetrize(edges_df(spark, [(i, i + 1) for i in range(n - 1)]))
    pr = approximate_pagerank(e, [20], alpha=0.3, eps=0.05)
    support = sorted(r["node"] for r in pr.filter("p > 0 or res > 0").collect())
    assert len(support) < n / 2
    assert 20 in support
