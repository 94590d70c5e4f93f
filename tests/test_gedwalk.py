"""GedWalk greedy vs a pure-Python replica of the reference recursion
(GedWalk.hpp:300-341 hit/miss path counting)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import symmetrize
from networkit_spark.operators.gedwalk import ged_walk_greedy


def _und(spark, pairs):
    df = spark.createDataFrame(list(pairs), "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    return symmetrize(df)


def _score(adj_in, n, S, alpha, levels):
    hit = [1.0 if u in S else 0.0 for u in range(n)]
    miss = [1.0 - h for h in hit]
    total, ap = 0.0, 1.0
    for _ in range(levels):
        ap *= alpha
        nh, nm = [0.0] * n, [0.0] * n
        for u in range(n):
            ih = sum(hit[v] for v in adj_in.get(u, ()))
            im = sum(miss[v] for v in adj_in.get(u, ()))
            if u in S:
                nh[u], nm[u] = ih + im, 0.0
            else:
                nh[u], nm[u] = ih, im
        hit, miss = nh, nm
        total += ap * sum(hit)
    return total


def _greedy_oracle(und, n, k, alpha, levels, n_candidates):
    adj = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = sorted(((len(v), u) for u, v in adj.items()), key=lambda t: (-t[0], t[1]))
    cands = [u for _, u in deg[:n_candidates]]
    sel, base = [], 0.0
    for _ in range(k):
        best = None
        for c in cands:
            if c in sel:
                continue
            s = round(_score(adj, n, set(sel) | {c}, alpha, levels), 9)
            if best is None or (s, -c) > best[:2]:
                best = (s, -c, c)
        if best is None or best[0] <= round(base, 9):
            break
        sel.append(best[2])
        base = best[0]
    return sel, base


def test_gedwalk_star_center_first(spark):
    und = [(0, i) for i in range(1, 8)]
    e = _und(spark, und)
    members, score = ged_walk_greedy(e, spark.range(8), k=1, levels=3)
    assert [r["node"] for r in members.collect()] == [0]
    assert score > 0


def test_gedwalk_vs_python_replica(spark):
    import random

    rng = random.Random(5)
    n = 30
    und = {(rng.randrange(0, i), i) for i in range(1, n)}
    for _ in range(25):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            und.add((min(a, b), max(a, b)))
    und = sorted(und)
    e = _und(spark, und)
    # same alpha as the operator default: 1/(1 + din + dout), symmetric graph
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    alpha = 1.0 / (1.0 + 2 * max(deg.values()))
    members, score = ged_walk_greedy(
        e, spark.range(n), k=3, alpha=alpha, levels=4, n_candidates=6
    )
    exp_sel, exp_score = _greedy_oracle(und, n, 3, alpha, 4, 6)
    assert [r["node"] for r in members.orderBy("rank").collect()] == exp_sel
    assert score == pytest.approx(exp_score, abs=1e-7)
