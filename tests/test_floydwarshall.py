"""floyd_warshall vs a sequential replica of FloydWarshall.cpp.

The replica implements the reference's exact semantics — lexicographic
(dist, hops) relaxation (FloydWarshall.cpp:60-82) and negative-cycle
tagging (:18-36) — so distances, hop counts, -inf pairs, and the tagged
node set are compared EXACTLY on random weighted digraphs with negative
weights (including planted negative cycles). Paths are checked for
validity/optimality (the reference's pathMatrix tie order is
intermediate-enumeration-dependent, so byte-equality is not meaningful).
"""

import math
import random

from networkit_spark.operators.floydwarshall import (
    floyd_warshall,
    nodes_on_shortest_path,
)

INF = float("inf")


def _replica(n, arcs):
    """(dist, hops, tagged) exactly as FloydWarshall::run + tagNegativeCycles."""
    dist = [[INF] * n for _ in range(n)]
    hops = [[None] * n for _ in range(n)]
    for u in range(n):
        dist[u][u] = 0.0
        hops[u][u] = 0
    # FloydWarshall.cpp:51-57 — the neighbor init runs after the diagonal
    # init, so a self-loop weight OVERWRITES dist[u][u] (min across
    # parallel self-arcs, matching the operator's arc merge)
    for u, v, w in arcs:
        if u == v and (hops[u][u] == 0 or w < dist[u][u]):
            dist[u][u] = float(w)
            hops[u][u] = 1
    for u, v, w in arcs:
        if u == v:
            continue
        if w < dist[u][v] or (w == dist[u][v] and (hops[u][v] is None or 1 < hops[u][v])):
            dist[u][v] = float(w)
            hops[u][v] = 1
    for k in range(n):
        for u in range(n):
            if dist[u][k] == INF:
                continue
            for v in range(n):
                if dist[k][v] == INF:
                    continue
                cand = dist[u][k] + dist[k][v]
                ch = hops[u][k] + hops[k][v]
                if cand < dist[u][v]:
                    dist[u][v] = cand
                    hops[u][v] = ch
                elif cand == dist[u][v] and ch < hops[u][v]:
                    hops[u][v] = ch
    tagged = set()
    for w in range(n):
        if dist[w][w] >= 0.0:
            continue
        tagged.add(w)
        for u in range(n):
            if dist[u][w] == INF:
                continue
            for v in range(n):
                if dist[w][v] != INF:
                    tagged.add(u)
                    tagged.add(v)
                    dist[u][v] = -INF
                    hops[u][v] = None
    return dist, hops, tagged


def _run(spark, n, arcs, **kw):
    e = spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in arcs],
        "src long, dst long, weight double",
    )
    nodes = spark.range(n).select("id")
    return floyd_warshall(e, nodes, **kw)


def _assert_match(res, n, arcs):
    dist, hops, tagged = _replica(n, arcs)
    got = {(r.source, r.target): (r.dist, r.hops) for r in
           res.distances.collect()}
    for u in range(n):
        for v in range(n):
            if dist[u][v] == INF:
                assert (u, v) not in got, f"spurious pair {(u, v)}"
            elif dist[u][v] == -INF:
                assert got[(u, v)][0] == -INF and got[(u, v)][1] is None
            else:
                gd, gh = got[(u, v)]
                assert abs(gd - dist[u][v]) < 1e-9, (u, v, gd, dist[u][v])
                assert gh == hops[u][v], (u, v, gh, hops[u][v])
    assert {r.node for r in res.negative_cycle_nodes.collect()} == tagged


def test_fixed_negative_weights_no_cycle(spark):
    arcs = [(0, 1, 4), (0, 2, 1), (2, 1, -2), (1, 3, 2), (2, 3, 5)]
    res = _run(spark, 4, arcs)
    _assert_match(res, 4, arcs)
    got = {(r.source, r.target): r.dist for r in res.distances.collect()}
    assert got[(0, 1)] == -1.0 and got[(0, 3)] == 1.0
    assert res.negative_cycle_nodes.count() == 0


def test_planted_negative_cycle(spark):
    # 1 -> 2 -> 1 with total weight -1; node 0 feeds in, node 3 is fed
    arcs = [(0, 1, 2), (1, 2, 1), (2, 1, -2), (2, 3, 1), (3, 4, 1),
            (5, 0, 1)]
    res = _run(spark, 6, arcs)
    _assert_match(res, 6, arcs)
    tagged = {r.node for r in res.negative_cycle_nodes.collect()}
    assert {0, 1, 2, 3, 4, 5} == tagged  # all reach or are reached
    got = {(r.source, r.target): r.dist for r in res.distances.collect()}
    assert got[(0, 3)] == float("-inf")


def test_hop_tiebreak(spark):
    # two dist-2 routes 0->3: 2 hops direct-ish vs 3 hops; hops must be 2
    arcs = [(0, 1, 1), (1, 3, 1), (0, 2, 0.5), (2, 4, 0.5), (4, 3, 1)]
    res = _run(spark, 5, arcs)
    _assert_match(res, 5, arcs)
    row = [r for r in res.distances.collect()
           if r.source == 0 and r.target == 3][0]
    assert row.dist == 2.0 and row.hops == 2


def test_random_graphs_exact(spark):
    for seed in range(3):
        rng = random.Random(seed)
        n = 8
        arcs = []
        for u in range(n):
            for v in range(n):
                if u != v and rng.random() < 0.3:
                    arcs.append((u, v, rng.randint(-3, 9)))
        res = _run(spark, n, arcs)
        _assert_match(res, n, arcs)


def test_random_with_self_loops_exact(spark):
    rng = random.Random(7)
    n = 7
    arcs = [(1, 1, -2.0), (4, 4, 3.0)]  # negative + positive self-loop
    for u in range(n):
        for v in range(n):
            if u != v and rng.random() < 0.3:
                arcs.append((u, v, rng.randint(-1, 9)))
    res = _run(spark, n, arcs)
    _assert_match(res, n, arcs)


def test_path_reconstruction(spark):
    arcs = [(0, 1, 4), (0, 2, 1), (2, 1, -2), (1, 3, 2), (2, 3, 5)]
    res = _run(spark, 4, arcs)
    path = nodes_on_shortest_path(res, 0, 3)
    aw = {(a, b): w for a, b, w in arcs}
    assert path[0] == 0 and path[-1] == 3
    total = sum(aw[(path[i], path[i + 1])] for i in range(len(path) - 1))
    assert total == 1.0 and len(path) - 1 == 3  # dist 1 via 0-2-1-3, 3 hops
    assert nodes_on_shortest_path(res, 3, 0) == []  # unreachable
    assert nodes_on_shortest_path(res, 2, 2) == [2]  # self


def test_parallel_arcs_keep_min(spark):
    arcs = [(0, 1, 5), (0, 1, 2), (1, 2, 1)]
    res = _run(spark, 3, arcs)
    got = {(r.source, r.target): r.dist for r in res.distances.collect()}
    assert got[(0, 2)] == 3.0
