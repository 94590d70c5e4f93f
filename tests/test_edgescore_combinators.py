"""Edge-score combinators: EdgeScoreAsWeight / EdgeScoreBlender /
GeometricMeanScore / PrefixJaccardScore vs sequential replicas transcribed
from ``cpp/edgescores/``."""

import math
import random

from pyspark.sql import functions as F

from networkit_spark.operators.sparsification import (
    geometric_mean_score,
    prefix_jaccard_score,
    score_as_weight,
    score_blender,
)


def _prefix_jaccard_replica(adj, att):
    """Direct transcription of PrefixJaccardScore.cpp:20-150.
    adj: {node: set(nbrs)}; att: {(min,max): value}. -> {(u,v): score}"""

    def a(u, v):
        return att[(min(u, v), max(u, v))]

    ranks = {}  # (node, nbr) -> competition rank among node's incident atts
    for u, nbrs in adj.items():
        order = sorted(nbrs, key=lambda w: (-a(u, w), -w))
        cur_val, cur_rank, num_eq = None, 0, 0
        for w in order:
            if cur_val is None or a(u, w) == cur_val:
                num_eq += 1
            else:
                cur_rank += num_eq
                num_eq = 1
            cur_val = a(u, w)
            ranks[(u, w)] = cur_rank
    out = {}
    for (u, v) in att:
        best = 0.0
        un = sorted((w for w in adj[u] if w != v), key=lambda w: ranks[(u, w)])
        vn = sorted((w for w in adj[v] if w != u), key=lambda w: ranks[(v, w)])
        ui = vi = 0
        u_mark, v_mark = set(), set()
        common = u_cnt = v_cnt = 0
        max_rank = max(
            [ranks[(u, w)] for w in un] + [ranks[(v, w)] for w in vn] + [0]
        )
        for r in range(max_rank + 1):
            while ui < len(un) and ranks[(u, un[ui])] == r:
                w = un[ui]
                if w in v_mark:
                    v_mark.discard(w)
                    common += 1
                    v_cnt -= 1
                else:
                    u_mark.add(w)
                    u_cnt += 1
                ui += 1
            while vi < len(vn) and ranks[(v, vn[vi])] == r:
                w = vn[vi]
                if w in u_mark:
                    u_mark.discard(w)
                    common += 1
                    u_cnt -= 1
                else:
                    v_mark.add(w)
                    v_cnt += 1
                vi += 1
            denom = u_cnt + v_cnt + common
            if denom > 0:
                best = max(best, common / denom)
        out[(u, v)] = best
    return out


def _random_graph(n, p, seed):
    rng = random.Random(seed)
    edges = [
        (u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < p
    ]
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    att = {(u, v): float(rng.randint(0, 4)) for u, v in edges}
    return adj, att


def _scored_df(spark, att):
    return spark.createDataFrame(
        [(u, v, s) for (u, v), s in att.items()], "src long, dst long, score double"
    )


def _und(spark, att):
    rows = [(u, v, 1.0) for (u, v) in att] + [(v, u, 1.0) for (u, v) in att]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_prefix_jaccard_vs_replica(spark):
    for seed in (1, 2, 3):
        adj, att = _random_graph(14, 0.3, seed)
        if not att:
            continue
        want = _prefix_jaccard_replica(adj, att)
        got = {
            (r["src"], r["dst"]): r["score"]
            for r in prefix_jaccard_score(_und(spark, att), _scored_df(spark, att)).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12, (seed, k, got[k], want[k])


def test_prefix_jaccard_path_graph(spark):
    # path 0-1-2: no common neighbors anywhere -> all scores 0
    att = {(0, 1): 1.0, (1, 2): 1.0}
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in prefix_jaccard_score(_und(spark, att), _scored_df(spark, att)).collect()
    }
    assert got == {(0, 1): 0.0, (1, 2): 0.0}


def test_prefix_jaccard_triangle(spark):
    # triangle: each edge's endpoints share exactly the third node at rank 0
    att = {(0, 1): 1.0, (0, 2): 1.0, (1, 2): 1.0}
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in prefix_jaccard_score(_und(spark, att), _scored_df(spark, att)).collect()
    }
    assert got == {(0, 1): 1.0, (0, 2): 1.0, (1, 2): 1.0}


def test_score_as_weight(spark):
    s = _scored_df(spark, {(0, 1): 3.0, (1, 2): 0.5})
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in score_as_weight(s, squared=True, offset=1.0, factor=2.0).collect()
    }
    assert got == {(0, 1): 19.0, (1, 2): 1.5}


def test_score_blender(spark):
    s0 = _scored_df(spark, {(0, 1): 1.0, (1, 2): 2.0})
    s1 = _scored_df(spark, {(0, 1): 10.0, (1, 2): 20.0})
    sel = spark.createDataFrame(
        [(0, 1, True), (1, 2, False)], "src long, dst long, sel boolean"
    )
    got = {
        (r["src"], r["dst"]): r["score"] for r in score_blender(s0, s1, sel).collect()
    }
    assert got == {(0, 1): 10.0, (1, 2): 2.0}


def test_geometric_mean_score(spark):
    # star center 0 with leaves 1,2: sums -> node0: 3+1=4, node1: 3, node2: 1
    att = {(0, 1): 3.0, (0, 2): 1.0}
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in geometric_mean_score(_und(spark, att), _scored_df(spark, att)).collect()
    }
    assert abs(got[(0, 1)] - 3.0 / math.sqrt(4.0 * 3.0)) < 1e-12
    assert abs(got[(0, 2)] - 1.0 / math.sqrt(4.0 * 1.0)) < 1e-12
