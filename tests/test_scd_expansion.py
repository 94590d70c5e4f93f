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


def _local_t_replica(pairs, seeds):
    """LocalT.cpp from-scratch replica: triangle classification by live
    membership, score = max(0, Tin*(Tin-Text)); first equal-score candidate
    accepted (bestExt starts at infinity); smallest-id ties."""
    adj = defaultdict(set)
    for a, b, _ in pairs:
        adj[a].add(b)
        adj[b].add(a)

    def tris_of(x):
        out = []
        nb = sorted(adj[x])
        for i, v in enumerate(nb):
            for w in nb[i + 1:]:
                if w in adj[v]:
                    out.append((v, w))
        return out

    com = set(seeds)

    def counts():
        int3 = ext = 0
        for u in com:
            for v, w in tris_of(u):
                if v in com and w in com:
                    int3 += 1
                elif v not in com and w not in com:
                    ext += 1
        return int3 // 3, ext

    def score(ti, te):
        return max(0, ti * (ti - te))

    while True:
        shell = {v for u in com for v in adj[u]} - com
        ti, te = counts()
        best, best_ext, best_score = None, None, score(ti, te)
        for v in sorted(shell):
            iv = sv = ev = 0
            for a, b in tris_of(v):
                ina, inb = a in com, b in com
                if ina and inb:
                    iv += 1
                elif ina or inb:
                    sv += 1
                else:
                    ev += 1
            ni, ne = ti + iv, te + ev - sv
            nsc = score(ni, ne)
            if nsc > best_score or (
                nsc == best_score and (best_ext is None or ne < best_ext)
            ):
                best, best_score, best_ext = v, nsc, ne
        if best is None:
            return com
        com.add(best)


def test_local_t_matches_replica(spark):
    from networkit_spark.operators.scd_expansion import local_t

    e = _df(spark, CLIQUE_TAIL)
    got = local_t(e, {2})
    assert got == _local_t_replica(CLIQUE_TAIL, {2})
    assert set(range(6)) <= got  # clique absorbed

    pairs = _toy()
    e2 = _df(spark, pairs)
    for seed in (0, 5, 13):
        assert local_t(e2, {seed}) == _local_t_replica(pairs, {seed}), seed


def test_clique_detect_matches_bruteforce(spark):
    import networkx as nx

    from networkit_spark.operators.scd_expansion import clique_detect

    pairs = _toy()
    G = nx.Graph()
    G.add_edges_from((a, b) for a, b, _ in pairs)
    for seeds in ({0}, {5}, {0, 1}):
        got = clique_detect(_df(spark, pairs), seeds)
        common = set.intersection(*(set(G[s]) for s in seeds)) - set(seeds)
        if not common:
            assert got == set(seeds)
            continue
        H = G.subgraph(common)
        cliques = [sorted(c) for c in nx.find_cliques(H)] or [[v] for v in common]
        best = min(cliques, key=lambda c: (-len(c), c))
        assert got == set(seeds) | set(best), seeds


def test_clique_detect_single_seed_clique_tail(spark):
    from networkit_spark.operators.scd_expansion import clique_detect

    e = _df(spark, CLIQUE_TAIL)
    # neighbors of 2 = clique {0,1,3,4,5}; their induced graph is K5
    assert clique_detect(e, {2}) == set(range(6))
    # seed 7: neighbors {6, 8} not adjacent -> max clique size 1 -> {7} + {6}
    assert clique_detect(e, {7}) == {6, 7}


def test_random_bfs_and_combined(spark):
    from networkit_spark.operators.scd_expansion import (
        clique_detect,
        combined_scd,
        local_tightness_expansion,
        random_bfs_community,
        tce,
    )

    # path 0-1-2-3-4-5: BFS from 0, size 3 -> {0,1,2} (whole levels)
    path = [(i, i + 1, 1.0) for i in range(5)]
    e = _df(spark, path)
    assert random_bfs_community(e, {0}, com_size=3) == {0, 1, 2}
    # size from a cover: seed 0's community has 4 members
    cover = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(6)], "node long, subset long"
    )
    assert len(random_bfs_community(e, {0}, cover=cover)) == 4
    # partial-level admission stays within the BFS frontier
    star = [(0, i, 1.0) for i in range(1, 6)]
    got = random_bfs_community(_df(spark, star), {0}, com_size=3, seed=1)
    assert 0 in got and len(got) == 3 and got - {0} <= {1, 2, 3, 4, 5}

    # CombinedSCD: first expands, second refines from that seed set
    e2 = _df(spark, CLIQUE_TAIL)
    mid = tce(e2, {2})
    assert combined_scd(e2, {2}, tce, local_tightness_expansion) == \
        local_tightness_expansion(e2, mid)
    assert combined_scd(e2, {2}, clique_detect, tce) == tce(e2, clique_detect(e2, {2}))
