"""PathGrowingMatcher replica (cpp/matching/PathGrowingMatcher.cpp).

Pins: hand-walked path example, matching validity, the Drake-Hougardy
1/2-approximation bound against brute-force maximum weight matchings on
small random graphs, and the driver-side scale guard.
"""
import itertools
import random

import pytest

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.matching import (
    is_valid_matching,
    matching_weight,
    path_growing_matching,
)


def brute_force_max_weight(edges):
    """Max-weight matching by subset enumeration (tiny graphs only)."""
    best = 0.0
    for k in range(1, len(edges) + 1):
        for sub in itertools.combinations(edges, k):
            nodes = [n for u, v, _ in sub for n in (u, v)]
            if len(nodes) == len(set(nodes)):
                best = max(best, sum(w for _, _, w in sub))
    return best


def test_hand_walked_path(spark):
    # a-b-c-d path, weights ab=1 bc=2 cd=1. Max degree tie -> smallest id
    # picks b(=1); heaviest edge bc -> M1; path moves to c, edge cd -> M2;
    # heavier matching is M1 = {(1,2,2.0)}.
    e = symmetrize(
        edges_df(spark, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)], weighted=True)
    )
    m = path_growing_matching(e)
    assert [tuple(r) for r in m.collect()] == [(1, 2, 2.0)]


def test_triangle_alternation(spark):
    # triangle with one heavy edge: path grows along heavy edge first
    e = symmetrize(
        edges_df(spark, [(0, 1, 5.0), (1, 2, 1.0), (0, 2, 1.0)], weighted=True)
    )
    m = path_growing_matching(e)
    assert is_valid_matching(m)
    assert matching_weight(m) == 5.0


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_half_approx_and_validity(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(8))
    pool = list(itertools.combinations(nodes, 2))
    edges = [
        (u, v, round(rng.uniform(0.5, 9.5), 2))
        for u, v in rng.sample(pool, 12)
    ]
    e = symmetrize(edges_df(spark, edges, weighted=True))
    m = path_growing_matching(e)
    assert is_valid_matching(m)
    opt = brute_force_max_weight(edges)
    assert matching_weight(m) >= 0.5 * opt - 1e-9


def test_self_loops_dropped(spark):
    e = symmetrize(
        edges_df(spark, [(0, 0, 9.0), (0, 1, 1.0)], weighted=True)
    )
    m = path_growing_matching(e)
    assert [tuple(r) for r in m.collect()] == [(0, 1, 1.0)]


def test_scale_guard(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2)]))
    with pytest.raises(ValueError, match="local_max_matching"):
        path_growing_matching(e, max_edges=1)
