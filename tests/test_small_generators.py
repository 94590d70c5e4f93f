"""RegularRingLattice + DorogovtsevMendes generators and
MultiTargetDijkstra (structural invariants + exact small goldens)."""

from pyspark.sql import functions as F

from networkit_spark.operators.distance import multi_target_dijkstra
from networkit_spark.sources.generators import dorogovtsev_mendes, regular_ring_lattice


def test_ring_lattice_exact(spark):
    # n=6, k=2 (clamped to min(2, 6/2-1=2)): i -> i+1, i+2 mod 6
    got = {
        (r["src"], r["dst"]) for r in regular_ring_lattice(spark, 6, 2).collect()
    }
    want = {(i, (i + j) % 6) for i in range(6) for j in (1, 2)}
    assert got == want


def test_ring_lattice_clamps_k(spark):
    # n=8 -> k clamped to 3; every node has exactly 3 clockwise edges
    df = regular_ring_lattice(spark, 8, 10)
    assert df.count() == 8 * 3
    degs = df.groupBy("src").count().select("count").distinct().collect()
    assert [r["count"] for r in degs] == [3]


def test_dorogovtsev_mendes_invariants(spark):
    n = 30
    df = dorogovtsev_mendes(spark, n, seed=7)
    rows = df.collect()
    # triangle start + 2 edges per added node
    assert len(rows) == 3 + 2 * (n - 3)
    nodes = {r["src"] for r in rows} | {r["dst"] for r in rows}
    assert nodes == set(range(n))
    # each new node w attaches to both endpoints of an existing edge:
    # w's two neighbors must themselves be adjacent
    adj = {}
    for r in rows:
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    for w in range(3, n):
        nbrs = sorted(x for x in adj[w] if x < w)
        assert len(nbrs) == 2
        assert nbrs[1] in adj[nbrs[0]]
    # deterministic under the seed
    again = {(r["src"], r["dst"]) for r in dorogovtsev_mendes(spark, n, seed=7).collect()}
    assert again == {(r["src"], r["dst"]) for r in rows}


def test_multi_target_dijkstra(spark):
    # weighted path 0 -1.0- 1 -2.0- 2 -4.0- 3, plus shortcut 0 -6.0- 3
    rows = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 4.0), (0, 3, 6.0)]
    rows += [(d, s, w) for s, d, w in rows]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {
        r["node"]: r["dist"]
        for r in multi_target_dijkstra(e, 0, [2, 3]).collect()
    }
    assert got == {2: 3.0, 3: 6.0}
