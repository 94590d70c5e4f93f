"""Greedy group closeness/harmonic vs a pure-Python replica oracle."""

from collections import deque

import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.group_centrality import group_closeness_greedy


def _edges_df(spark, und):
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )


def _bfs(adj, src, n):
    d = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in d:
                d[v] = d[u] + 1
                q.append(v)
    return d


def _greedy_oracle(und, n, k, mode, n_candidates):
    adj = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = sorted(((len(vs), u) for u, vs in adj.items()), key=lambda t: (-t[0], t[1]))
    cands = [u for _, u in deg[:n_candidates]]
    cd = {c: _bfs(adj, c, n) for c in cands}
    cap = float(n)
    sel, ds = [], {}

    def contrib(d):
        return 1.0 / d if d > 0 else 0.0

    for _ in range(k):
        best = None
        for c in cands:
            if c in sel:
                continue
            g = 0.0
            for v, dc in cd[c].items():
                dS = ds.get(v)
                if mode == "harmonic":
                    old = contrib(dS) if dS is not None else 0.0
                    new = contrib(min(dS, dc) if dS is not None else dc)
                    g += new - old
                else:
                    old = min(dS, cap) if dS is not None else cap
                    new = min(dS if dS is not None else cap, dc, cap)
                    g += old - new
            g = round(g, 9)
            if best is None or g > best[0] or (g == best[0] and c < best[1]):
                best = (g, c)
        sel.append(best[1])
        for v, dc in cd[best[1]].items():
            ds[v] = min(ds.get(v, 1 << 62), dc)
    if mode == "harmonic":
        score = sum(contrib(d) for d in ds.values())
    else:
        sd = sum(ds.values())
        score = (n - len(sel)) / sd if sd > 0 else 0.0
    return sel, score


def test_star_center_first(spark):
    und = [(0, i) for i in range(1, 10)]
    e = _edges_df(spark, und)
    nodes = spark.range(10)
    members, score = group_closeness_greedy(e, nodes, k=1, mode="harmonic")
    assert [r["node"] for r in members.orderBy("rank").collect()] == [0]
    assert score == pytest.approx(9.0)


def test_two_clusters_k2(spark):
    # two stars joined by a long path: greedy picks both centers
    left = [(0, i) for i in range(1, 6)]
    right = [(10, i) for i in range(11, 16)]
    bridge = [(0, 20), (20, 21), (21, 10)]
    und = left + right + bridge
    e = _edges_df(spark, und)
    nodes = spark.range(22)
    members, _ = group_closeness_greedy(e, nodes, k=2, mode="harmonic")
    got = {r["node"] for r in members.collect()}
    assert got == {0, 10}


@pytest.mark.parametrize("mode", ["harmonic", "closeness"])
def test_vs_python_replica_random(spark, mode):
    import random

    rng = random.Random(13)
    n = 40
    und = {(rng.randrange(0, i), i) for i in range(1, n)}
    for _ in range(45):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            und.add((min(a, b), max(a, b)))
    und = sorted(und)
    e = _edges_df(spark, und)
    nodes = spark.range(n)
    members, score = group_closeness_greedy(e, nodes, k=3, mode=mode, n_candidates=8)
    exp_sel, exp_score = _greedy_oracle(und, n, 3, mode, 8)
    assert [r["node"] for r in members.orderBy("rank").collect()] == exp_sel
    assert score == pytest.approx(exp_score, abs=1e-9)
