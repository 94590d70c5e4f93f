"""Hand-computed goldens for the sparsification score family
(SCAN / chance-corrected / multiscale / Simmelian overlap / local
similarity — cpp/sparsification/*.cpp) and algebraic distance
(cpp/distance/AlgebraicDistance.cpp)."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.algebraic import (
    algebraic_distance_edge_scores,
    algebraic_distance_loads,
)
from networkit_spark.operators.sparsification import (
    chance_corrected_triangle_score,
    local_similarity_score,
    multiscale_score,
    scan_edge_score,
    simmelian_overlap_score,
)

# triangle 0-1-2 plus pendant 2-3
TRI_PENDANT = [(0, 1), (0, 2), (1, 2), (2, 3)]


def scores_map(df):
    return {(r["src"], r["dst"]): r["score"] for r in df.collect()}


@pytest.fixture(scope="module")
def tri_pendant(spark):
    return symmetrize(edges_df(spark, TRI_PENDANT)).persist()


def test_scan_edge_score_golden(spark, tri_pendant):
    s = scores_map(scan_edge_score(tri_pendant))
    assert s[(0, 1)] == pytest.approx(2 / 3)
    assert s[(0, 2)] == pytest.approx(2 / math.sqrt(12))
    assert s[(1, 2)] == pytest.approx(2 / math.sqrt(12))
    assert s[(2, 3)] == pytest.approx(1 / math.sqrt(8))


def test_chance_corrected_triangle_golden(spark, tri_pendant):
    s = scores_map(chance_corrected_triangle_score(tri_pendant, n=4))
    assert s[(0, 1)] == pytest.approx(2.0)  # 1 * (4-2) / (1*1)
    assert s[(0, 2)] == pytest.approx(1.0)  # 1 * 2 / (1*2)
    assert s[(2, 3)] == pytest.approx(1.0)  # tri=0 but deg(3)=1


def test_multiscale_golden(spark, tri_pendant):
    s = scores_map(multiscale_score(tri_pendant))
    assert s[(0, 1)] == pytest.approx(0.5)  # 1-(1-1/2)^1 both sides
    assert s[(0, 2)] == pytest.approx(5 / 9)  # max(0.5, 1-(2/3)^2)
    assert s[(2, 3)] == pytest.approx(5 / 9)  # deg-1 side contributes 0


def test_simmelian_overlap_golden(spark, tri_pendant):
    s = scores_map(simmelian_overlap_score(tri_pendant, max_rank=10))
    # each triangle edge shares exactly one top-ranked common neighbor
    assert s[(0, 1)] == 1.0
    assert s[(0, 2)] == 1.0
    assert s[(1, 2)] == 1.0
    assert s[(2, 3)] == 0.0


def test_local_similarity_golden(spark, tri_pendant):
    s = scores_map(local_similarity_score(tri_pendant))
    assert s[(0, 1)] == pytest.approx(1.0)
    assert s[(0, 2)] == pytest.approx(1.0)  # rank 1 at node 2 (tie by id)
    assert s[(1, 2)] == pytest.approx(1.0 - math.log(2) / math.log(3))
    assert s[(2, 3)] == pytest.approx(1.0)  # deg(3)=1 side keeps it


def two_cliques(spark):
    """Two 4-cliques {0..3} and {4..7} joined by one bridge 3-4."""
    edges = [
        (a, b) for a in range(4) for b in range(a + 1, 4)
    ] + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)] + [(3, 4)]
    return symmetrize(edges_df(spark, edges))


def test_algebraic_distance_separates_cliques(spark):
    e = two_cliques(spark)
    nodes = nodes_range(spark, 8)
    d = scores_map(
        algebraic_distance_edge_scores(
            e, nodes, num_systems=6, num_iterations=20, seed=7
        )
    )
    intra = [d[(0, 1)], d[(1, 2)], d[(5, 6)], d[(6, 7)]]
    bridge = d[(3, 4)]
    assert bridge > max(intra)


def test_algebraic_distance_deterministic_and_normalized(spark, tri_pendant):
    nodes = nodes_range(spark, 4)
    l1 = algebraic_distance_loads(
        tri_pendant, nodes, num_systems=3, num_iterations=5, seed=11
    ).collect()
    l2 = algebraic_distance_loads(
        tri_pendant, nodes, num_systems=3, num_iterations=5, seed=11
    ).collect()
    assert sorted(map(tuple, l1)) == sorted(map(tuple, l2))
    vals = [r["load"] for r in l1]
    assert min(vals) == pytest.approx(0.0)
    assert max(vals) == pytest.approx(1.0)
    assert all(-1e-12 <= v <= 1 + 1e-12 for v in vals)


def test_forest_fire_deterministic_and_bounded(spark):
    from networkit_spark.operators.sparsification import forest_fire_score
    from networkit_spark.graph import edges_df, symmetrize
    from tests.fixtures import clique_edges

    e = symmetrize(edges_df(spark, clique_edges(2, 5) + [(0, 5)]))
    a = sorted(map(tuple, forest_fire_score(e, 10, n_fires=8, rounds=3).collect()))
    b = sorted(map(tuple, forest_fire_score(e, 10, n_fires=8, rounds=3).collect()))
    assert a == b  # hash-seeded: bit-identical across runs
    scores = [x[2] for x in a]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert max(scores) == 1.0
    assert len(a) == len(clique_edges(2, 5)) + 1
