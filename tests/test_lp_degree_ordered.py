"""LPDegreeOrdered analog — degree-staged label propagation.

Reference: LPDegreeOrdered.cpp:18-90 (asynchronous low-degree-first sweeps,
UNWEIGHTED neighbor counts). Pinned here: a sequential python replica of
the exact staged semantics (buckets ascending, in-sweep visibility across
buckets, synchronous within a bucket), plus the reference test's structural
bar (planted-clique recovery, CommunityGTest-style).
"""

import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.plp import (
    LP_DEG_THRESHOLDS,
    LPDegreeOrdered,
    lp_degree_ordered_fixed,
)


def _und(spark, edges):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges] + [(b, a, 1.0) for a, b in edges],
        "src bigint, dst bigint, weight double",
    )


def _replica(n, edges, sweeps, thresholds=LP_DEG_THRESHOLDS):
    adj = {u: [] for u in range(n)}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = {u: len(adj[u]) for u in range(n)}

    def bucket(u):
        for i, t in enumerate(thresholds):
            if deg[u] <= t:
                return i
        return len(thresholds)

    labels = {u: u for u in range(n)}
    for _ in range(sweeps):
        for b in range(len(thresholds) + 1):
            upd = {}
            for u in range(n):
                if bucket(u) != b or deg[u] == 0:
                    continue
                counts = {}
                for v in adj[u]:
                    counts[labels[v]] = counts.get(labels[v], 0) + 1
                best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                upd[u] = best
            labels.update(upd)
    return labels


# two triangles joined by a bridge + pendant + isolated node
EDGES = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (5, 6)]
N = 8


@pytest.mark.parametrize("sweeps", [1, 2, 3])
def test_matches_sequential_replica(spark, sweeps):
    out = lp_degree_ordered_fixed(_und(spark, EDGES), spark.range(N), sweeps)
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got == _replica(N, EDGES, sweeps)


def test_isolated_stays_singleton(spark):
    out = lp_degree_ordered_fixed(_und(spark, EDGES), spark.range(N), 2)
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got[7] == 7


def test_planted_cliques_recovered(spark):
    # two 5-cliques + one bridge edge: each clique collapses to one label
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    edges += [(4, 5)]
    res = LPDegreeOrdered(max_sweeps=10).run(_und(spark, edges), spark.range(10))
    got = {r["node"]: r["label"] for r in res.labels_df.collect()}
    assert len({got[u] for u in range(5)}) == 1
    assert len({got[u] for u in range(5, 10)}) == 1
    assert res.converged
