"""Randomization family: DegreePreservingShuffle (replica-pinned) and
GlobalCurveball (exact invariants + mixing + determinism)."""

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range
from networkit_spark.operators.randomization import (
    degree_preserving_shuffle,
    global_curveball,
    relabel_edges,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toy_digraph(n=30):
    pairs = [(i, (i * 2 + 1) % n) for i in range(n)] + [
        (i, (i * 3 + 7) % n) for i in range(n)
    ]
    return sorted({(a, b) for a, b in pairs if a != b})


def test_dps_matches_python_replica(spark):
    n = 30
    pairs = _toy_digraph(n)
    e = edges_df(spark, pairs)
    got = dict(
        (r.node, r.new_id)
        for r in degree_preserving_shuffle(e, nodes_range(spark, n), seed=42).collect()
    )
    # replica: within each (din, dout) class, i-th node by id -> i-th by hash
    dout = Counter(a for a, _ in pairs)
    din = Counter(b for _, b in pairs)
    classes = {}
    for v in range(n):
        classes.setdefault((din[v], dout[v]), []).append(v)
    want = {}
    for members in classes.values():
        by_id = sorted(members)
        by_rand = sorted(members, key=lambda v: (_h60(f"dps42|{v}"), v))
        for a, b in zip(by_id, by_rand):
            want[a] = b
    assert got == want
    # bijection over all nodes
    assert sorted(got.values()) == list(range(n))


def test_dps_preserves_degree_sequence(spark):
    n = 40
    pairs = _toy_digraph(n)
    e = edges_df(spark, pairs)
    nodes = nodes_range(spark, n)
    perm = degree_preserving_shuffle(e, nodes, seed=7)
    e2 = relabel_edges(e, perm)
    def degs(df):
        out = df.groupBy("src").count().collect()
        inn = df.groupBy("dst").count().collect()
        return (
            sorted(r["count"] for r in out),
            sorted(r["count"] for r in inn),
        )
    assert degs(e) == degs(e2)
    # per-node signature preserved: node v's new id has v's exact (din, dout)
    sig = {}
    dout = Counter(a for a, _ in pairs)
    din = Counter(b for _, b in pairs)
    for r in perm.collect():
        assert (din[r.node], dout[r.node]) == (din[r.new_id], dout[r.new_id])


def _canon_undirected(n=24):
    pairs = {(min(i, (i * 5 + 3) % n), max(i, (i * 5 + 3) % n)) for i in range(n)}
    pairs |= {(min(i, (i * 7 + 1) % n), max(i, (i * 7 + 1) % n)) for i in range(n)}
    return sorted((a, b) for a, b in pairs if a != b)


def test_global_curveball_invariants(spark):
    n = 24
    pairs = _canon_undirected(n)
    e = edges_df(spark, pairs).withColumn("weight", F.lit(1.0))
    out = global_curveball(e, nodes_range(spark, n), rounds=4, seed=42)
    rows = [(r.src, r.dst) for r in out.collect()]
    # simplicity: canonical, no self loops, no duplicates
    assert all(a < b for a, b in rows)
    assert len(rows) == len(set(rows)) == len(pairs)
    # exact degree sequence preservation (undirected degrees)
    def udeg(pp):
        c = Counter()
        for a, b in pp:
            c[a] += 1
            c[b] += 1
        return sorted(c.values()), sorted(c.keys())
    assert udeg(rows) == udeg(pairs)
    # per-node degree preserved, not just the multiset
    c0, c1 = Counter(), Counter()
    for a, b in pairs:
        c0[a] += 1
        c0[b] += 1
    for a, b in rows:
        c1[a] += 1
        c1[b] += 1
    assert c0 == c1
    # mixing: at least some edges moved
    assert set(rows) != set(pairs)


def test_global_curveball_deterministic(spark):
    n = 24
    pairs = _canon_undirected(n)
    e = edges_df(spark, pairs).withColumn("weight", F.lit(1.0))
    a = sorted((r.src, r.dst) for r in global_curveball(e, nodes_range(spark, n), 2, seed=5).collect())
    b = sorted((r.src, r.dst) for r in global_curveball(e, nodes_range(spark, n), 2, seed=5).collect())
    c = sorted((r.src, r.dst) for r in global_curveball(e, nodes_range(spark, n), 2, seed=6).collect())
    assert a == b
    assert a != c


def test_uniform_curveball_invariants(spark):
    from networkit_spark.operators.randomization import curveball

    n = 24
    pairs = _canon_undirected(n)
    e = edges_df(spark, pairs).withColumn("weight", F.lit(1.0))
    out = curveball(e, nodes_range(spark, n), trades_per_round=4, rounds=3, seed=9)
    rows = [(r.src, r.dst) for r in out.collect()]
    assert all(a < b for a, b in rows)
    assert len(rows) == len(set(rows)) == len(pairs)
    c0, c1 = Counter(), Counter()
    for a, b in pairs:
        c0[a] += 1
        c0[b] += 1
    for a, b in rows:
        c1[a] += 1
        c1[b] += 1
    assert c0 == c1
