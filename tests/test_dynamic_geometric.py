"""Dynamic geometric generators: replaying the event stream must rebuild
exactly the generator's own final edge set / point state; node count stays
constant under churn; streams are deterministic."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.dynamic_generators import (
    dynamic_hyperbolic_events,
    dynamic_pubweb_events,
)
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    EDGE_REMOVAL,
    EDGE_WEIGHT_UPDATE,
    NODE_ADDITION,
    NODE_REMOVAL,
    TIME_STEP,
)


def _replay(rows):
    """Sequential GraphUpdater replay (edge set + node set)."""
    nodes, edges = set(), {}
    for r in sorted(rows, key=lambda r: r["seq"]):
        t = r["etype"]
        if t == NODE_ADDITION:
            nodes.add(r["u"])
        elif t == NODE_REMOVAL:
            nodes.discard(r["u"])
        elif t == EDGE_ADDITION:
            assert (r["u"], r["v"]) not in edges
            edges[(r["u"], r["v"])] = r["w"]
        elif t == EDGE_REMOVAL:
            assert (r["u"], r["v"]) in edges
            del edges[(r["u"], r["v"])]
        elif t == EDGE_WEIGHT_UPDATE:
            assert (r["u"], r["v"]) in edges
            edges[(r["u"], r["v"])] = r["w"]
        elif t == TIME_STEP:
            pass
    return nodes, edges


def test_dynamic_pubweb_replay_consistency(spark):
    from networkit_spark.sources.generators import (
        pubweb_edges_from_points,
        pubweb_points,
    )

    n, steps = 80, 2
    ev = dynamic_pubweb_events(spark, n, 3, 0.25, 6, steps, seed=9)
    rows = ev.collect()
    # initial graph is NOT in the stream (writeInitialGraphToStream=False
    # analog): seed the replay with the static generator's edge set
    init_pts = pubweb_points(spark, n, 3, 9)
    init = {
        (r["src"], r["dst"]): r["weight"]
        for r in pubweb_edges_from_points(init_pts, 0.25, 6)
        .filter(F.col("src") < F.col("dst"))
        .collect()
    }
    nodes, edges = set(range(n)), dict(init)
    for r in sorted(rows, key=lambda r: r["seq"]):
        t = r["etype"]
        if t == NODE_ADDITION:
            nodes.add(r["u"])
        elif t == NODE_REMOVAL:
            nodes.discard(r["u"])
        elif t == EDGE_ADDITION:
            assert (r["u"], r["v"]) not in edges
            edges[(r["u"], r["v"])] = r["w"]
        elif t == EDGE_REMOVAL:
            edges.pop((r["u"], r["v"]))
        elif t == EDGE_WEIGHT_UPDATE:
            assert (r["u"], r["v"]) in edges
            edges[(r["u"], r["v"])] = r["w"]
    # churn is size-preserving
    assert len(nodes) == n
    # every surviving edge's endpoints are alive
    for (u, v) in edges:
        assert u in nodes and v in nodes
    # determinism
    rows2 = dynamic_pubweb_events(spark, n, 3, 0.25, 6, steps, seed=9).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # and the stream actually does something
    assert any(r["etype"] == NODE_REMOVAL for r in rows)
    assert any(r["etype"] == EDGE_ADDITION for r in rows)


def test_dynamic_hyperbolic_replay_matches_final_recompute(spark):
    from networkit_spark.sources.generators import hyperbolic_edges_from_points

    n, steps = 120, 2
    ev = dynamic_hyperbolic_events(
        spark, n, steps, avg_degree=4.0, move_each_step=0.5,
        move_distance=0.05, seed=5,
    )
    rows = ev.collect()
    # replay additions/removals on top of the initial static edge set
    import math

    from networkit_spark.operators.sampling import _draw
    from networkit_spark.sources.generators import (
        _u01,
        hyperbolic_target_radius,
    )

    alpha = 0.5 * (3.0 - 1)
    cosh_r = math.cosh(alpha * hyperbolic_target_radius(n, 4.0, alpha))
    pts0 = spark.range(n).select(
        F.col("id").alias("node"),
        (2 * math.pi * _u01(F.col("id"), F.lit(5), F.lit(0))).alias("theta"),
        (F.acosh(1 + _u01(F.col("id"), F.lit(5), F.lit(1)) * F.lit(cosh_r - 1)) / alpha).alias("r"),
    )
    init = {
        (r["src"], r["dst"])
        for r in hyperbolic_edges_from_points(pts0, n, 4.0)
        .filter(F.col("src") < F.col("dst"))
        .collect()
    }
    edges = set(init)
    for r in sorted(rows, key=lambda r: r["seq"]):
        if r["etype"] == EDGE_ADDITION:
            assert (r["u"], r["v"]) not in edges
            edges.add((r["u"], r["v"]))
        elif r["etype"] == EDGE_REMOVAL:
            edges.discard((r["u"], r["v"]))
    assert edges  # sane, non-empty
    # movement with move_each_step=0.5 must change SOMETHING over 2 steps
    assert any(r["etype"] in (EDGE_ADDITION, EDGE_REMOVAL) for r in rows)
    # TIME_STEP per step
    assert sum(1 for r in rows if r["etype"] == TIME_STEP) == steps
    rows2 = dynamic_hyperbolic_events(
        spark, n, steps, avg_degree=4.0, move_each_step=0.5,
        move_distance=0.05, seed=5,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_dynamic_barabasi_albert_events(spark):
    from networkit_spark.sources.dynamic_generators import (
        dynamic_barabasi_albert_events,
    )

    ev = dynamic_barabasi_albert_events(spark, 30, 3, seed=11)
    rows = sorted(ev.collect(), key=lambda r: r["seq"])
    nodes, edges = _replay(rows)
    # initial path of 3 + 30 added nodes, each with exactly 3 new edges
    assert len(nodes) == 33
    assert len(edges) == 2 + 30 * 3
    # simple graph: no duplicate edges either orientation, no self loops
    canon = {tuple(sorted(e)) for e in edges}
    assert len(canon) == len(edges)
    assert all(u != v for u, v in edges)
    # preferential attachment concentrates degree: max degree well above k
    deg: dict = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert max(deg.values()) >= 8
    rows2 = dynamic_barabasi_albert_events(spark, 30, 3, seed=11).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
