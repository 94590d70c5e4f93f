"""FloydWarshall golden fixtures transcribed from the reference test suite
(cpp/distance/test/FloydWarshallGTest.cpp) — exact distance matrices,
negative-cycle flags, and shortest-path node sequences (including the
min-hop tie-break case and the negative-self-loop case)."""

from networkit_spark.operators.floydwarshall import (
    floyd_warshall,
    nodes_on_shortest_path,
)

NEG_INF = float("-inf")


def _run(spark, n, arcs, undirected=False):
    if undirected:
        arcs = list(arcs) + [(b, a, w) for a, b, w in arcs if a != b]
    e = spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in arcs],
        "src long, dst long, weight double",
    )
    return floyd_warshall(e, spark.range(n).select("id"))


def _dists(res):
    return {(r.source, r.target): r.dist for r in res.distances.collect()}


def test_complete_k3_undirected(spark):
    # FloydWarshallGTest.cpp:15-21, :151-174
    res = _run(spark, 3, [(0, 1, 1), (1, 2, 2), (0, 2, 4)], undirected=True)
    d = _dists(res)
    exp = {(0, 0): 0, (0, 1): 1, (0, 2): 3,
           (1, 0): 1, (1, 1): 0, (1, 2): 2,
           (2, 0): 3, (2, 1): 2, (2, 2): 0}
    assert {k: v for k, v in d.items()} == {k: float(v) for k, v in exp.items()}
    assert res.negative_cycle_nodes.count() == 0
    assert nodes_on_shortest_path(res, 0, 2) == [0, 1, 2]
    assert nodes_on_shortest_path(res, 2, 0) == [2, 1, 0]
    assert nodes_on_shortest_path(res, 1, 1) == [1]


def test_undirected_negative_edge_all_neg_inf(spark):
    # FloydWarshallGTest.cpp:23-29, :177-209 — an undirected negative edge
    # is a negative 2-cycle; every pair in the component collapses to -inf
    res = _run(spark, 3, [(0, 1, 1), (1, 2, 2), (0, 2, -0.5)],
               undirected=True)
    d = _dists(res)
    assert len(d) == 9 and all(v == NEG_INF for v in d.values())
    assert res.negative_cycle_nodes.count() == 3
    for s in range(3):
        for t in range(3):
            assert nodes_on_shortest_path(res, s, t) == []


def test_directed_negative_edge_no_cycle(spark):
    # FloydWarshallGTest.cpp:31-37, :212-236
    res = _run(spark, 3, [(0, 1, 1), (1, 2, -2), (0, 2, 4)])
    d = _dists(res)
    assert d == {(0, 0): 0.0, (0, 1): 1.0, (0, 2): -1.0,
                 (1, 1): 0.0, (1, 2): -2.0, (2, 2): 0.0}
    assert res.negative_cycle_nodes.count() == 0
    assert nodes_on_shortest_path(res, 0, 2) == [0, 1, 2]
    assert nodes_on_shortest_path(res, 1, 2) == [1, 2]
    assert nodes_on_shortest_path(res, 1, 0) == []


def test_disconnected_undirected(spark):
    # FloydWarshallGTest.cpp:55-60, :239-269
    res = _run(spark, 4, [(0, 1, 3), (1, 2, 2)], undirected=True)
    d = _dists(res)
    assert d == {(0, 0): 0.0, (0, 1): 3.0, (0, 2): 5.0,
                 (1, 0): 3.0, (1, 1): 0.0, (1, 2): 2.0,
                 (2, 0): 5.0, (2, 1): 2.0, (2, 2): 0.0,
                 (3, 3): 0.0}
    assert nodes_on_shortest_path(res, 2, 0) == [2, 1, 0]
    assert nodes_on_shortest_path(res, 0, 3) == []
    assert nodes_on_shortest_path(res, 3, 3) == [3]
    assert res.negative_cycle_nodes.count() == 0


def test_negative_self_loop_ring(spark):
    # FloydWarshallGTest.cpp:64-72, :272-296 — self-loop (1,1,-2) on a
    # directed 5-ring: every pair routes through the cycle node => all -inf
    res = _run(spark, 5, [(0, 1, 3), (1, 1, -2), (1, 2, 2), (2, 3, 1),
                          (3, 4, 4), (4, 0, 1)])
    d = _dists(res)
    assert len(d) == 25 and all(v == NEG_INF for v in d.values())
    assert res.negative_cycle_nodes.count() == 5


def test_multiple_shortest_paths_min_hop_tiebreak(spark):
    # FloydWarshallGTest.cpp:293-317 — three dist-5 routes 0->10 with 5, 4,
    # and 6 nodes; the reference returns the 4-node one {0, 4, 5, 10}
    arcs = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 10, 2),
            (0, 4, 1), (4, 5, 1), (5, 10, 3),
            (0, 6, 1), (6, 7, 1), (7, 8, 1), (8, 9, 1), (9, 10, 1)]
    res = _run(spark, 11, arcs, undirected=True)
    row = [r for r in res.distances.collect()
           if r.source == 0 and r.target == 10][0]
    assert row.dist == 5.0 and row.hops == 3
    assert nodes_on_shortest_path(res, 0, 10) == [0, 4, 5, 10]
