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


def _grid_edges(spark, w, h):
    # w x h grid, unit weights, node = y*w + x
    rows = []
    for y in range(h):
        for x in range(w):
            u = y * w + x
            if x + 1 < w:
                rows.append((u, u + 1, 1.0))
            if y + 1 < h:
                rows.append((u, u + w, 1.0))
    rows += [(d, s, ww) for s, d, ww in rows]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_astar_grid_exact_and_pruned(spark):
    from networkit_spark.operators.distance import astar_distance, sssp_distances

    w, h = 5, 4
    e = _grid_edges(spark, w, h)
    target = h * w - 1  # corner (w-1, h-1)

    def manhattan(u):
        x, y = u % w, u // w
        return float(abs((w - 1) - x) + abs((h - 1) - y))

    heu = spark.createDataFrame(
        [(u, manhattan(u)) for u in range(w * h)], "node long, h double"
    )
    d, settled = astar_distance(e, heu, 0, target)
    assert d == float((w - 1) + (h - 1))
    # exactness vs plain SSSP on the settled target
    full = {r["node"]: r["dist"] for r in sssp_distances(e, 0).collect()}
    assert d == full[target]
    # admissible heuristic prunes: fewer labels settled than the full wave
    assert settled.count() <= len(full)


def test_astar_zero_heuristic_matches_sssp(spark):
    from networkit_spark.operators.distance import astar_distance

    rows = [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 5.0)]
    rows += [(d, s, w) for s, d, w in rows]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    heu = spark.createDataFrame([(i, 0.0) for i in range(3)], "node long, h double")
    d, _ = astar_distance(e, heu, 0, 2)
    assert d == 4.0
