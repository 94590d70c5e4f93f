"""MaxentStress layout tests: known-distance BFS vs networkx, layout
quality (known-distance stress improves over the random start), cluster
separation, determinism, and the scaling step."""

import math
import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.maxent import (
    k_neighborhood_distances,
    ldme,
    maxent_stress,
    scale_layout,
    sphere_coordinates,
)


def _und(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in sym], "src long, dst long, weight double"
    )


def test_k_neighborhood_distances_vs_networkx(spark):
    rng = random.Random(4)
    pairs = [(a, b) for a in range(30) for b in range(a + 1, 30) if rng.random() < 0.12]
    g = nx.Graph(pairs)
    g.add_nodes_from(range(30))
    got = {
        (r["u"], r["v"]): r["d"]
        for r in k_neighborhood_distances(_und(spark, pairs), 3).collect()
    }
    exp = {}
    for u, dists in nx.all_pairs_shortest_path_length(g, cutoff=3):
        for v, d in dists.items():
            if u != v:
                exp[(u, v)] = float(d)
    assert got == exp


def _pair_dist(coords, u, v):
    xu = coords[u]
    xv = coords[v]
    return math.sqrt(sum((a - b) ** 2 for a, b in zip(xu, xv)))


def test_maxent_improves_known_stress_and_is_deterministic(spark):
    # 4x4 grid graph
    def nid(r, c):
        return 4 * r + c

    pairs = []
    for r in range(4):
        for c in range(4):
            if c + 1 < 4:
                pairs.append((nid(r, c), nid(r, c + 1)))
            if r + 1 < 4:
                pairs.append((nid(r, c), nid(r + 1, c)))
    und = _und(spark, pairs)
    known = k_neighborhood_distances(und, 2)
    nodes = spark.range(16).select(F.col("id").alias("node"))
    start = sphere_coordinates(nodes, 2, seed=7)
    base = ldme(scale_layout(start, known, 2), known, 2)
    out = maxent_stress(
        und, dim=2, k=2, seed=7,
        max_solves_per_alpha=4, final_alpha=0.5,
        cg_max_iterations=60, fast_computation=True,
    )
    fitted = ldme(scale_layout(out, known, 2), known, 2)
    assert fitted < base * 0.8  # materially better than the sphere start
    out2 = maxent_stress(
        und, dim=2, k=2, seed=7,
        max_solves_per_alpha=4, final_alpha=0.5,
        cg_max_iterations=60, fast_computation=True,
    )
    a = {r["node"]: list(r["x"]) for r in out.collect()}
    b = {r["node"]: list(r["x"]) for r in out2.collect()}
    for nd in a:
        assert a[nd] == pytest.approx(b[nd], abs=1e-9)


def test_maxent_separates_two_cliques(spark):
    pairs = []
    for base in (0, 6):
        pairs += [(base + a, base + b) for a in range(6) for b in range(a + 1, 6)]
    pairs.append((0, 6))
    und = _und(spark, pairs)
    out = maxent_stress(
        und, dim=2, k=2, seed=3,
        max_solves_per_alpha=4, final_alpha=0.5,
        cg_max_iterations=60, fast_computation=True,
    )
    coords = {r["node"]: list(r["x"]) for r in out.collect()}
    intra = [
        _pair_dist(coords, base + a, base + b)
        for base in (0, 6)
        for a in range(6)
        for b in range(a + 1, 6)
    ]
    inter = [
        _pair_dist(coords, a, b) for a in range(6) for b in range(6, 12)
    ]
    assert sum(inter) / len(inter) > sum(intra) / len(intra)
