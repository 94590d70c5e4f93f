"""TCE + LocalTightnessExpansion vs independent sequential replicas.

The replicas recompute every quantity FROM SCRATCH at each step (community
state functions — cut/volume/scores for TCE, internal/external similarity
for LTE) with brute-force set intersections for triangle sums, so they are
independent of the engine's incremental bookkeeping and wedge joins.
Reference semantics: ``cpp/scd/TCE.cpp``,
``cpp/scd/LocalTightnessExpansion.cpp``; rejected shell nodes re-enter
consideration only when a later acceptance touches them (the d-ary heap's
``update``), ties pop smallest id (documented determinism divergence).
"""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df
from networkit_spark.operators.scd_expansion import (
    local_tightness_expansion,
    lte_shell_similarity_df,
    tce,
    tce_shell_scores_df,
)


def _wadj(pairs):
    """pairs [(a, b, w)] -> {node: {nbr: w}}"""
    adj = defaultdict(dict)
    for a, b, w in pairs:
        adj[a][b] = w
        adj[b][a] = w
    return adj


def _tce_replica(pairs, seeds, refine=False, jaccard=False):
    adj = _wadj(pairs)
    wd = {v: sum(adj[v].values()) for v in adj}
    deg = {v: len(adj[v]) for v in adj}
    com = set(seeds)

    def sdir(u, v):
        tmin = sum(
            min(adj[u][y], adj[v][y]) for y in set(adj[u]) & set(adj[v])
        )
        nom = adj[u][v] + tmin
        denom = (wd[u] + wd[v] - nom) if jaccard else min(wd[u], wd[v])
        if wd.get(v, 0) <= 0 or denom <= 0:
            return 0.0
        return nom / (denom * deg[v])

    def score(v):
        return sum(sdir(u, v) for u in adj[v] if u in com)

    def cut_vol():
        cut = sum(w for a in com for b, w in adj[a].items() if b not in com)
        vol = sum(wd.get(a, 0.0) for a in com)
        return cut, vol

    active = {v for u in com for v in adj[u]} - com
    while active:
        u = max(active, key=lambda x: (score(x), -x))
        active.discard(u)
        cut, vol = cut_vol()
        cut_u = sum(w for y, w in adj[u].items() if y in com)
        new_cut, new_vol = cut + wd[u] - 2 * cut_u, vol + wd[u]
        if vol <= 0 or new_vol <= 0:
            break
        if new_cut / new_vol < cut / vol:
            com.add(u)
            active |= set(adj[u]) - com
    if refine:
        for u in sorted(com):
            cut, vol = cut_vol()
            u_cut_change = sum(
                (w if y in com else -w) for y, w in adj[u].items()
            )
            new_cut, new_vol = cut + u_cut_change, vol - wd[u]
            if vol > 0 and new_vol > 0 and new_cut / new_vol < cut / vol:
                com.discard(u)
    return com


def _lte_replica(pairs, seeds, alpha=1.0):
    adj = _wadj(pairs)
    wd = {v: math.sqrt(1.0 + sum(w * w for w in adj[v].values())) for v in adj}

    def s(u, v):
        tprod = sum(adj[u][y] * adj[v][y] for y in set(adj[u]) & set(adj[v]))
        return (2.0 * adj[u][v] + tprod) / (wd[u] * wd[v])

    com = set(seeds)

    def isim(x):
        return sum(s(x, y) for y in adj[x] if y in com)

    def esim(x):
        return sum(s(x, y) for y in adj[x] if y not in com)

    active = {v for u in com for v in adj[u]} - com
    while active:
        u = max(active, key=lambda x: (isim(x), -x))
        active.discard(u)
        iu, eu = isim(u), esim(u)
        if iu <= 0:
            continue
        intS = sum(isim(x) for x in com)
        extS = sum(esim(x) for x in com)
        ratio = (extS / intS) if intS > 0 else (
            float("inf") if extS > 0 else float("nan")
        )
        margin = ratio - (alpha * eu - iu) / (2.0 * iu)
        if not margin > 0:
            continue
        com.add(u)
        active |= set(adj[u]) - com
    return com


def _toy(n=20):
    pairs = sorted(
        {(min(i, (i * 3 + 1) % n), max(i, (i * 3 + 1) % n)) for i in range(n)}
        | {(min(i, (i * 7 + 2) % n), max(i, (i * 7 + 2) % n)) for i in range(n)}
    )
    return [(a, b, 1.0) for a, b in pairs if a != b]


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long, weight double")


CLIQUE_TAIL = [(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)] + [
    (0, 6, 1.0), (6, 7, 1.0), (7, 8, 1.0)
]


def test_tce_recovers_clique_and_matches_replica(spark):
    e = _df(spark, CLIQUE_TAIL)
    got = tce(e, {2})
    assert got == _tce_replica(CLIQUE_TAIL, {2})
    assert set(range(6)) <= got


def test_tce_matches_replica_on_toy_all_variants(spark):
    pairs = _toy()
    e = _df(spark, pairs)
    for seed in (0, 5, 13):
        for jac in (False, True):
            assert tce(e, {seed}, jaccard=jac) == _tce_replica(
                pairs, {seed}, jaccard=jac
            ), (seed, jac)
        assert tce(e, {seed}, refine=True) == _tce_replica(
            pairs, {seed}, refine=True
        ), seed


def test_tce_weighted_matches_replica(spark):
    pairs = [(a, b, 1.0 + ((a * 7 + b) % 3)) for a, b, _ in _toy(16)]
    e = _df(spark, pairs)
    for seed in (1, 4):
        assert tce(e, {seed}) == _tce_replica(pairs, {seed}), seed


def test_lte_recovers_clique_and_matches_replica(spark):
    e = _df(spark, CLIQUE_TAIL)
    got = local_tightness_expansion(e, {2})
    assert got == _lte_replica(CLIQUE_TAIL, {2})
    assert set(range(6)) <= got


def test_lte_matches_replica_on_toy(spark):
    pairs = _toy()
    e = _df(spark, pairs)
    for seed in (0, 5, 13):
        assert local_tightness_expansion(e, {seed}) == _lte_replica(
            pairs, {seed}
        ), seed
    # alpha sharpens the acceptance bar
    for seed in (0, 13):
        assert local_tightness_expansion(e, {seed}, alpha=2.0) == _lte_replica(
            pairs, {seed}, alpha=2.0
        ), seed


def test_lte_weighted_matches_replica(spark):
    pairs = [(a, b, 0.5 + ((a + 2 * b) % 4) / 2.0) for a, b, _ in _toy(16)]
    e = _df(spark, pairs)
    for seed in (2, 7):
        assert local_tightness_expansion(e, {seed}) == _lte_replica(
            pairs, {seed}
        ), seed


def test_multi_seed_expansion(spark):
    pairs = _toy()
    e = _df(spark, pairs)
    assert tce(e, {0, 1}) == _tce_replica(pairs, {0, 1})
    assert local_tightness_expansion(e, {0, 1}) == _lte_replica(pairs, {0, 1})


def test_shell_score_dfs_match_replica_formulas(spark):
    """The distributed gate-query tables equal the brute-force formulas."""
    pairs = CLIQUE_TAIL
    adj = _wadj(pairs)
    e = _df(spark, pairs)
    mem = {0, 1, 2}
    got = {r["node"]: r["score"] for r in tce_shell_scores_df(e, mem).collect()}
    wd = {v: sum(adj[v].values()) for v in adj}
    deg = {v: len(adj[v]) for v in adj}
    for v in set(adj) - mem:
        exp = 0.0
        for u in adj[v]:
            if u in mem:
                tmin = sum(min(adj[u][y], adj[v][y]) for y in set(adj[u]) & set(adj[v]))
                exp += (adj[u][v] + tmin) / (min(wd[u], wd[v]) * deg[v])
        if exp > 0:
            assert abs(got[v] - exp) < 1e-12, v
        else:
            assert v not in got
    got2 = {r["node"]: r["int_sim"] for r in lte_shell_similarity_df(e, mem).collect()}
    wd2 = {v: math.sqrt(1.0 + sum(w * w for w in adj[v].values())) for v in adj}
    for v in set(adj) - mem:
        exp = sum(
            (2.0 * adj[u][v] + sum(adj[u][y] * adj[v][y] for y in set(adj[u]) & set(adj[v])))
            / (wd2[u] * wd2[v])
            for u in adj[v]
            if u in mem
        )
        if exp > 0:
            assert abs(got2[v] - exp) < 1e-12, v
        else:
            assert v not in got2
