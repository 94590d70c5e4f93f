"""SpectralColoring (coloring.py) + ClusteredRandomGraphGenerator
(cpp/generators/ClusteredRandomGraphGenerator.cpp) tests."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.generators import (
    clustered_random_graph,
    crg_cluster_col,
)


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _und(spark, triples):
    sym = triples + [(b, a, w) for a, b, w in triples]
    return _edges_df(spark, sym)


# ---------------------------------------------------------------------------
# SpectralColoring
# ---------------------------------------------------------------------------


def _check_valid_coloring(edge_pairs, rows, n):
    color = {r["node"]: r["color"] for r in rows}
    assert sorted(color) == list(range(n)), "every node colored exactly once"
    for u, v in edge_pairs:
        assert color[u] != color[v], f"edge ({u},{v}) monochromatic"
    return color


def test_spectral_coloring_path(spark):
    from networkit_spark.operators.spectral import spectral_coloring

    triples = [(i, i + 1, 1.0) for i in range(7)]
    und = _und(spark, triples)
    rows = spectral_coloring(und, 8).collect()
    _check_valid_coloring([(a, b) for a, b, _ in triples], rows, 8)
    # deterministic across runs
    assert rows == spectral_coloring(und, 8).collect()


def test_spectral_coloring_two_cliques_bridge(spark):
    triples = []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                triples.append((base + i, base + j, 1.0))
    triples.append((0, 6, 1.0))
    from networkit_spark.operators.spectral import spectral_coloring

    und = _und(spark, triples)
    rows = spectral_coloring(und, 12).collect()
    color = _check_valid_coloring([(a, b) for a, b, _ in triples], rows, 12)
    # a 6-clique forces >= 6 colors
    assert len(set(color.values())) >= 6


def test_spectral_coloring_star_isolated(spark):
    # star K_{1,5} plus an isolated node 6
    triples = [(0, i, 1.0) for i in range(1, 6)]
    from networkit_spark.operators.spectral import spectral_coloring

    und = _und(spark, triples)
    rows = spectral_coloring(und, 7).collect()
    _check_valid_coloring([(a, b) for a, b, _ in triples], rows, 7)


# ---------------------------------------------------------------------------
# ClusteredRandomGraphGenerator
# ---------------------------------------------------------------------------


def test_crg_p1_complete_and_p0_empty(spark):
    n, k = 30, 3
    edges, truth = clustered_random_graph(spark, n, k, 1.0, 1.0, seed=7)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    want = {(u, v) for u in range(n) for v in range(u + 1, n)}
    assert got == want
    assert truth.count() == n

    edges0, _ = clustered_random_graph(spark, n, k, 0.0, 0.0, seed=7)
    assert edges0.count() == 0


def test_crg_intra_only_matches_clusters(spark):
    n, k, seed = 80, 4, 11
    edges, truth = clustered_random_graph(spark, n, k, 1.0, 0.0, seed=seed)
    comm = {r["node"]: r["community"] for r in truth.collect()}
    rows = edges.collect()
    # every edge intra; every intra pair present (p_intra = 1)
    got = {(r["src"], r["dst"]) for r in rows}
    want = {
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if comm[u] == comm[v]
    }
    assert got == want


def test_crg_inter_only_all_cross_cluster(spark):
    n, k, seed = 60, 3, 5
    edges, truth = clustered_random_graph(spark, n, k, 0.0, 0.3, seed=seed)
    comm = {r["node"]: r["community"] for r in truth.collect()}
    rows = edges.collect()
    assert rows, "expect some inter edges at p=0.3"
    for r in rows:
        assert comm[r["src"]] != comm[r["dst"]]
        assert r["src"] < r["dst"]


def test_crg_rates_within_binomial_ci(spark):
    n, k, seed = 200, 4, 13
    p_in, p_out = 0.5, 0.05
    edges, truth = clustered_random_graph(spark, n, k, p_in, p_out, seed=seed)
    comm = {r["node"]: r["community"] for r in truth.collect()}
    intra_pairs = sum(
        1
        for u in range(n)
        for v in range(u + 1, n)
        if comm[u] == comm[v]
    )
    total_pairs = n * (n - 1) // 2
    inter_pairs = total_pairs - intra_pairs
    same = crg_cluster_col(F.col("src"), k, seed) == crg_cluster_col(
        F.col("dst"), k, seed
    )
    n_intra = edges.filter(same).count()
    n_inter = edges.filter(~same).count()
    for got, pairs, p in ((n_intra, intra_pairs, p_in), (n_inter, inter_pairs, p_out)):
        mu = pairs * p
        sd = math.sqrt(pairs * p * (1 - p))
        assert abs(got - mu) < 5 * sd + 1, (got, mu, sd)


def test_crg_cluster_assignment_uniformish(spark):
    n, k = 1000, 5
    _, truth = clustered_random_graph(spark, n, k, 0.0, 0.0, seed=3)
    sizes = [
        r["c"]
        for r in truth.groupBy("community").agg(F.count("*").alias("c")).collect()
    ]
    assert len(sizes) == k
    assert min(sizes) > (n / k) * 0.6 and max(sizes) < (n / k) * 1.5


def test_crg_validation():
    with pytest.raises(ValueError):
        clustered_random_graph(None, 10, 0, 0.5, 0.1)
    with pytest.raises(ValueError):
        clustered_random_graph(None, 10, 2, 1.5, 0.1)
