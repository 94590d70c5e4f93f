"""Round-4 batch 2: ClusteringProjector, ParallelAgglomerativeClusterer,
OverlappingNMIDistance, DynWeaklyConnectedComponents, GraphDistance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs, weight=1.0):
    return spark.createDataFrame(
        [(int(u), int(v), float(weight)) for u, v in pairs],
        "src long, dst long, weight double",
    )


def _sym(spark, pairs):
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return _edges(spark, both)


def _labels(spark, d):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in d.items()], "node long, label long"
    )


# ---------------------------------------------------------------------------
# ClusteringProjector
# ---------------------------------------------------------------------------

def test_project_back(spark):
    from networkit_spark.operators.coarsening import project_back

    mapping = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "node long, coarse long"
    )
    coarse = _labels(spark, {0: 7, 1: 9})
    got = {r["node"]: r["label"] for r in project_back(mapping, coarse).collect()}
    assert got == {0: 7, 1: 7, 2: 9, 3: 9}


def test_project_back_to_finest_two_levels(spark):
    from networkit_spark.operators.coarsening import project_back_to_finest

    m1 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2), (5, 2)], "node long, coarse long"
    )
    m2 = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], "node long, coarse long")
    coarse = _labels(spark, {0: 5, 1: 6})
    got = {
        r["node"]: r["label"]
        for r in project_back_to_finest([m1, m2], coarse).collect()
    }
    assert got == {0: 5, 1: 5, 2: 5, 3: 5, 4: 6, 5: 6}
    # empty hierarchy: labels pass through
    same = {
        r["node"]: r["label"]
        for r in project_back_to_finest([], coarse).collect()
    }
    assert same == {0: 5, 1: 6}


# ---------------------------------------------------------------------------
# ParallelAgglomerativeClusterer
# ---------------------------------------------------------------------------

def test_modularity_edge_scores_formula(spark):
    from networkit_spark.operators.agglomerative import modularity_edge_scores

    # path 0-1-2 with weights 2, 1
    canon = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    omega = 3.0
    wdeg = {0: 2.0, 1: 3.0, 2: 1.0}
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in modularity_edge_scores(canon).collect()
    }
    for (u, v), w in {(0, 1): 2.0, (1, 2): 1.0}.items():
        exp = w / omega - (wdeg[u] / (2 * omega)) * (wdeg[v] / (2 * omega))
        assert abs(got[(u, v)] - exp) < 1e-12


def test_parallel_agglomerative_two_cliques(spark):
    from networkit_spark.operators.agglomerative import parallel_agglomerative

    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    canon = _edges(spark, k1 + k2 + [(3, 4)])
    labels = {r["node"]: r["label"] for r in parallel_agglomerative(canon).collect()}
    assert set(labels) == set(range(8))
    # agglomeration must merge at least within-clique pairs and never
    # produce a label outside the node universe
    assert len(set(labels.values())) < 8
    for grp in (range(4), range(4, 8)):
        vals = {labels[x] for x in grp}
        assert len(vals) <= 2  # each clique collapses to <= 2 supernodes


def test_agglomerate_one_level_matches_matching_contract(spark):
    """Level-1 mapping groups exactly the matched pairs."""
    from networkit_spark.operators.agglomerative import (
        agglomerate_one_level,
        modularity_edge_scores,
    )
    from networkit_spark.operators.matching import (
        is_valid_matching,
        local_max_matching_fixed,
    )

    canon = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)])
    scored = modularity_edge_scores(canon)
    cand = scored.select("src", "dst", F.col("score").alias("weight"))
    cand = cand.union(
        cand.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    matched = local_max_matching_fixed(cand, rounds=16)
    assert is_valid_matching(matched)
    _, mapping = agglomerate_one_level(canon, matching_rounds=16)
    m = {r["node"]: r["coarse"] for r in mapping.collect()}
    for r in matched.collect():
        assert m[r["u"]] == m[r["v"]]


# ---------------------------------------------------------------------------
# OverlappingNMIDistance
# ---------------------------------------------------------------------------

def _onmi_replica(cover_x, cover_y, n, normalization="max"):
    """Sequential replica of OverlappingNMIDistance.cpp:205-266."""

    def h(w):
        return -w * math.log2(w / n) if w > 0 else 0.0

    def ent(s):
        return h(s) + h(n - s)

    def sizes(cov):
        out = {}
        for _, lab in cov:
            out[lab] = out.get(lab, 0) + 1
        return out

    sx, sy = sizes(cover_x), sizes(cover_y)
    if (not sx) != (not sy):
        return 1.0
    if not sx and not sy:
        return 0.0
    inter = {}
    bx = {}
    for node, lab in cover_x:
        bx.setdefault(node, []).append(lab)
    for node, lab in cover_y:
        for i in bx.get(node, []):
            inter[(i, lab)] = inter.get((i, lab), 0) + 1

    def cond(szA, szB, swap):
        best = {i: ent(s) for i, s in szA.items()}
        for (i, j), d in inter.items():
            if swap:
                i, j = j, i
            a, b, c = n + d - szA[i] - szB[j], szB[j] - d, szA[i] - d
            if h(a) + h(d) >= h(b) + h(c):
                cand = h(a) + h(b) + h(c) + h(d) - ent(szB[j])
                best[i] = min(best[i], cand)
        return sum(best.values())

    hx = sum(ent(s) for s in sx.values())
    hy = sum(ent(s) for s in sy.values())
    mi = 0.5 * (hx - cond(sx, sy, False) + hy - cond(sy, sx, True))
    if hx == 0.0 and hy == 0.0:
        return 0.0
    if normalization == "max":
        nmi = mi / max(hx, hy)
    else:
        raise NotImplementedError
    return 1.0 - min(1.0, max(0.0, nmi))


def test_overlapping_nmi_identical_zero(spark):
    from networkit_spark.operators.community import overlapping_nmi_distance

    cov = _labels(spark, {i: i % 3 for i in range(12)})
    assert overlapping_nmi_distance(cov, cov, 12) == pytest.approx(0.0, abs=1e-12)


def test_overlapping_nmi_matches_replica(spark):
    from networkit_spark.operators.community import overlapping_nmi_distance

    n = 30
    cov_x = [(i, i % 4) for i in range(n)] + [(i, 4 + i % 3) for i in range(0, n, 2)]
    cov_y = [(i, i % 5) for i in range(n)]
    dfx = spark.createDataFrame(cov_x, "node long, label long")
    dfy = spark.createDataFrame(cov_y, "node long, label long")
    exp = _onmi_replica(cov_x, cov_y, n)
    got = overlapping_nmi_distance(dfx, dfy, n)
    assert got == pytest.approx(exp, abs=1e-12)
    # symmetry
    got_rev = overlapping_nmi_distance(dfy, dfx, n)
    assert got_rev == pytest.approx(exp, abs=1e-12)


def test_overlapping_nmi_normalizations(spark):
    from networkit_spark.operators.community import overlapping_nmi_distance

    a = _labels(spark, {i: i % 2 for i in range(10)})
    b = _labels(spark, {i: i % 5 for i in range(10)})
    vals = {
        norm: overlapping_nmi_distance(a, b, 10, normalization=norm)
        for norm in ("min", "geometric_mean", "arithmetic_mean", "max", "joint_entropy")
    }
    for v in vals.values():
        assert 0.0 <= v <= 1.0
    # MIN divides by the smallest entropy -> largest nmi -> smallest distance
    assert vals["min"] <= vals["geometric_mean"] <= vals["max"]
    assert vals["max"] <= vals["joint_entropy"]


# ---------------------------------------------------------------------------
# DynWeaklyConnectedComponents
# ---------------------------------------------------------------------------

def test_dyn_weakly_components_matches_recompute(spark):
    from networkit_spark.operators.components import ConnectedComponents
    from networkit_spark.streaming.events import (
        EDGE_ADDITION,
        EDGE_REMOVAL,
        apply_events,
        update_weakly_components,
    )

    # directed graph: 0->1->2, 3->4
    edges = _edges(spark, [(0, 1), (1, 2), (3, 4)])
    nodes = spark.range(5).select(F.col("id"))
    labels = ConnectedComponents().run(edges, nodes).labels_df
    events = spark.createDataFrame(
        [(EDGE_ADDITION, 2, 3, 1.0, 1), (EDGE_REMOVAL, 0, 1, 1.0, 2)],
        "etype string, u long, v long, w double, ts long",
    )
    after = apply_events(edges, events)
    got = update_weakly_components(labels, after, events)
    exp = ConnectedComponents().run(after, nodes).labels_df
    # same partition up to relabeling
    def part(df):
        groups = {}
        for r in df.collect():
            groups.setdefault(r["label"], set()).add(r["node"])
        return sorted(frozenset(g) for g in groups.values())

    assert part(got) == part(exp)


# ---------------------------------------------------------------------------
# GraphDistance
# ---------------------------------------------------------------------------

def test_graph_distance_weighted_and_hops(spark):
    from networkit_spark.operators.node_distance import graph_distance

    e = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 1.0), (0, 2, 10.0)],
        "src long, dst long, weight double",
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    assert graph_distance(sym, 0, 2, weighted=True) == pytest.approx(6.0)
    assert graph_distance(sym, 0, 2, weighted=False) == pytest.approx(1.0)
    lonely = _edges(spark, [(0, 1), (2, 3)])
    assert graph_distance(lonely, 0, 3) is None
