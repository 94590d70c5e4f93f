"""Quadrangle (4-cycle) per-edge scores vs brute-force cycle enumeration
(semantics of ChibaNishizekiQuadrangleEdgeScore.cpp)."""

import itertools
import random

from networkit_spark.operators.triangles import quadrangle_edge_score


def _brute_quadrangles(edges):
    """Count per edge the simple 4-cycles containing it."""
    es = set()
    for u, v in edges:
        es.add((min(u, v), max(u, v)))
    nodes = sorted({x for e in es for x in e})
    scores = {e: 0 for e in es}
    # enumerate 4-node subsets x their 3 cycle pairings
    for quad in itertools.combinations(nodes, 4):
        for perm in itertools.permutations(quad):
            a, b, c, d = perm
            if a != min(perm) or b > d:  # canonical: start at min, direction fixed
                continue
            cyc = [(a, b), (b, c), (c, d), (d, a)]
            cyc = [(min(x, y), max(x, y)) for x, y in cyc]
            if all(e in es for e in cyc):
                for e in cyc:
                    scores[e] += 1
    return scores


def _df(spark, es):
    rows = [(u, v, 1.0) for u, v in es] + [(v, u, 1.0) for u, v in es]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_quadrangle_k4(spark):
    es = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in quadrangle_edge_score(_df(spark, es)).collect()
    }
    assert got == {e: 2 for e in es}


def test_quadrangle_c4_plus_chord_and_pendant(spark):
    # square 0-1-2-3 with chord (0,2) and pendant 4 on node 0
    es = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (0, 4)]
    want = _brute_quadrangles(es)
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in quadrangle_edge_score(_df(spark, es)).collect()
    }
    assert got == want
    assert got[(0, 1)] == 1 and got[(0, 4)] == 0


def test_quadrangle_random_vs_brute(spark):
    for seed in (7, 8):
        rng = random.Random(seed)
        es = [
            (u, v)
            for u in range(10)
            for v in range(u + 1, 10)
            if rng.random() < 0.35
        ]
        if not es:
            continue
        want = _brute_quadrangles(es)
        got = {
            (r["src"], r["dst"]): r["score"]
            for r in quadrangle_edge_score(_df(spark, es)).collect()
        }
        assert got == want, seed
