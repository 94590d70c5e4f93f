"""One-call Sparsifier pipelines (sparsification.pyx:700-1560 wrappers)."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.sparsifiers import (
    AlgebraicDistanceSparsifier,
    ForestFireSparsifier,
    JaccardSimilaritySparsifier,
    LocalDegreeSparsifier,
    LocalSimilaritySparsifier,
    LocalSparsifier,
    MultiscaleSparsifier,
    QuadrilateralSimmelianSparsifier,
    RandomEdgeSparsifier,
    RandomNodeEdgeSparsifier,
    SCANSparsifier,
    SimmelianMultiscaleSparsifier,
    SimmelianSparsifierNonParametric,
    SimmelianSparsifierParametric,
    TriangleSparsifier,
    local_filter_score,
    threshold_for_ratio,
)


def _toy(spark, n=24):
    pairs = sorted(
        {(min(i, (i * 5 + 1) % n), max(i, (i * 5 + 1) % n)) for i in range(n)}
        | {(min(i, (i * 3 + 7) % n), max(i, (i * 3 + 7) % n)) for i in range(n)}
        | {(i, (i + 1) % n) for i in range(0, n, 2)}
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    return symmetrize(edges_df(spark, sorted(set((min(a, b), max(a, b)) for a, b in pairs))))


def _canon_set(df):
    return {(r["src"], r["dst"]) for r in df.filter("src < dst").collect()}


ALL_SPARSIFIERS = [
    TriangleSparsifier(),
    SimmelianSparsifierParametric(max_rank=5),
    SimmelianSparsifierNonParametric(),
    QuadrilateralSimmelianSparsifier(),
    SimmelianMultiscaleSparsifier(),
    JaccardSimilaritySparsifier(),
    LocalSimilaritySparsifier(),
    MultiscaleSparsifier(),
    RandomEdgeSparsifier(seed=5),
    RandomNodeEdgeSparsifier(seed=5),
    ForestFireSparsifier(),
    LocalDegreeSparsifier(),
    SCANSparsifier(),
    AlgebraicDistanceSparsifier(num_systems=4, num_iterations=8),
    LocalSparsifier(TriangleSparsifier()),
]


@pytest.mark.parametrize("sp", ALL_SPARSIFIERS, ids=lambda s: type(s).__name__ + (
    "_inner" if isinstance(s, LocalSparsifier) else ""))
def test_sparsify_to_ratio_contract(spark, sp):
    """Every pipeline: scores cover all canonical edges with non-null
    values; the one-call ratio form returns a subgraph whose size is as
    close to the target as score ties allow."""
    e = _toy(spark)
    base = _canon_set(e)
    m = len(base)
    scores = sp.scores(e).persist()
    rows = scores.collect()
    assert {(r["src"], r["dst"]) for r in rows} == base
    assert all(r["score"] is not None for r in rows)

    target = 0.5
    out = sp.sparsify_to_ratio(e, target, scores=scores)
    kept = _canon_set(out)
    assert kept <= base
    # tie-plateau slack: achieved count must be within the tie group of the
    # threshold (brute-force check against the collected scores)
    vals = sorted((r["score"] for r in rows), reverse=sp.above)
    k = min(max(int(round(target * m)), 1), m)
    t = vals[k - 1]
    expect = sum(1 for x in vals if (x >= t if sp.above else x <= t))
    assert len(kept) == expect, (type(sp).__name__, len(kept), expect, k)
    scores.unpersist()


def test_threshold_for_ratio_matches_bruteforce(spark):
    e = _toy(spark)
    s = TriangleSparsifier().scores(e)
    rows = sorted((r["score"] for r in s.collect()), reverse=True)
    for ratio in (0.25, 0.5, 0.9):
        t = threshold_for_ratio(s, ratio, above=True)
        k = min(max(int(round(ratio * len(rows))), 1), len(rows))
        assert t == rows[k - 1], ratio


def test_local_filter_score_replica(spark):
    """LocalFilterScore.hpp:43-100 brute-force replica: competition rank per
    node by attribute desc; e = 1 - log(rank)/log(deg); max over ends."""
    from collections import defaultdict

    e = _toy(spark)
    tri = TriangleSparsifier().scores(e)
    att = {(r["src"], r["dst"]): r["score"] for r in tri.collect()}
    nbrs = defaultdict(list)
    for (a, b), s in att.items():
        nbrs[a].append((b, s))
        nbrs[b].append((a, s))
    expected = {}
    for u, lst in nbrs.items():
        d = len(lst)
        by_score = sorted(lst, key=lambda x: -x[1])
        for i, (v, s) in enumerate(by_score):
            rank = 1 + sum(1 for _, s2 in by_score if s2 > s)
            ex = 1.0 if d <= 1 else 1.0 - math.log(rank) / math.log(d)
            key = (min(u, v), max(u, v))
            expected[key] = max(expected.get(key, -9e9), ex)
    got = {(r["src"], r["dst"]): r["score"] for r in local_filter_score(e, tri).collect()}
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-12, k


def test_random_node_edge_semantics(spark):
    """Filtering score <= p keeps exactly the edges with a sampled
    endpoint (node hash <= p)."""
    from networkit_spark.operators.sparsifiers import random_node_edge_score

    e = _toy(spark)
    p = 0.4
    s = random_node_edge_score(e, seed=9)
    kept = {(r["src"], r["dst"]) for r in s.filter(F.col("score") <= p).collect()}
    # recompute node hashes with the score's exact expression (seed literal
    # type matters to xxhash64, so build it with F like the implementation)
    h = (F.abs(F.xxhash64(F.col("id"), F.lit(9))) % F.lit(1_000_000_007)) / 1_000_000_007.0
    node_h = {
        r["id"]: r["h"]
        for r in (
            e.selectExpr("src AS id")
            .union(e.selectExpr("dst AS id"))
            .distinct()
            .select("id", h.alias("h"))
            .collect()
        )
    }
    expect = {
        (r["src"], r["dst"])
        for r in s.collect()
        if min(node_h[r["src"]], node_h[r["dst"]]) <= p
    }
    assert kept == expect


def test_degree_multiscale_sparsifier(spark):
    """DegreeMultiscaleSparsifier (pyx:1133): multiscale over a
    degree-derived attribute — brute-force check of the attribute wiring
    (max degree) through the multiscale formula."""
    from collections import defaultdict

    from networkit_spark.operators.sparsifiers import DegreeMultiscaleSparsifier

    e = _toy(spark)
    sp = DegreeMultiscaleSparsifier(lambda du, dv: F.greatest(du, dv).cast("double"))
    got = {(r["src"], r["dst"]): r["score"] for r in sp.scores(e).collect()}
    adjw = defaultdict(dict)
    deg = defaultdict(int)
    for r in e.filter("src < dst").collect():
        a, b = r["src"], r["dst"]
        deg[a] += 1
        deg[b] += 1
    for (a, b) in list(got):
        adjw[a][b] = float(max(deg[a], deg[b]))
        adjw[b][a] = float(max(deg[a], deg[b]))
    for (a, b), s in got.items():
        exp = 0.0
        for u, v in ((a, b), (b, a)):
            wsum = sum(adjw[u].values())
            d = len(adjw[u])
            p = adjw[u][v] / wsum if wsum > 0 else 0.0
            exp = max(exp, 1.0 - (1.0 - p) ** (d - 1))
        assert abs(s - exp) < 1e-12, (a, b)
    # one-call ratio form holds the contract too
    out = sp.sparsify_to_ratio(e, 0.5)
    assert 0 < out.filter("src < dst").count() <= len(got)
