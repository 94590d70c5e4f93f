from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.matching import (
    is_valid_matching,
    local_max_matching,
    matching_weight,
)
from networkit_spark.operators.walks import random_walks, walk_cooccurrences
from networkit_spark.sources.generators import (
    gnm,
    planted_partition,
    powerlaw_digraph,
    rmat,
    watts_strogatz,
)


def test_gnm_basic(spark):
    e = gnm(spark, 100, 300)
    assert 250 <= e.count() <= 300  # dedupe + self-loop removal shrinks a bit
    assert e.filter("src = dst").count() == 0
    assert e.filter("src >= 100 or dst >= 100 or src < 0").count() == 0
    # deterministic
    assert e.count() == gnm(spark, 100, 300).count()


def test_powerlaw_skew(spark):
    e = powerlaw_digraph(spark, 1000, 5000, gamma=2.2)
    deg = e.groupBy("dst").count()
    top = deg.agg(F.max("count")).first()[0]
    avg = deg.agg(F.avg("count")).first()[0]
    assert top > 5 * avg  # heavy hub skew


def test_rmat_shape(spark):
    e = rmat(spark, scale=8, edge_factor=4)
    assert e.filter("src >= 256 or dst >= 256").count() == 0
    assert e.count() > 500


def test_watts_strogatz(spark):
    e = watts_strogatz(spark, 50, k=4, beta=0.0)
    # no rewiring: each node points to 2 clockwise neighbors
    assert e.count() == 100
    e2 = watts_strogatz(spark, 50, k=4, beta=1.0)
    assert e2.count() <= 100  # rewiring may collide/dedupe


def test_planted_partition_structure(spark):
    e = planted_partition(spark, blocks=4, block_size=25, m_in=80, m_out=10)
    intra = e.filter((F.col("src") / 25).cast("int") == (F.col("dst") / 25).cast("int"))
    assert intra.count() > e.count() * 0.8  # overwhelmingly intra-block


def test_matching_path(spark):
    # P4: 0-1-2-3 -> maximal matching of 2 edges
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    m = local_max_matching(e)
    assert is_valid_matching(m)
    assert m.count() == 2


def test_matching_star_one_edge(spark):
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 6)]))
    m = local_max_matching(e)
    assert is_valid_matching(m)
    assert m.count() == 1


def test_matching_prefers_heavy(spark):
    # triangle with one heavy edge: heavy edge must be matched
    e = symmetrize(edges_df(spark, [(0, 1, 10.0), (1, 2, 1.0), (0, 2, 1.0)], weighted=True))
    m = local_max_matching(e)
    rows = m.collect()
    assert len(rows) == 1 and (rows[0]["u"], rows[0]["v"]) == (0, 1)
    assert matching_weight(m) == 10.0


def test_random_walks_shape_and_determinism(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    w = random_walks(e, walks_per_node=2, length=4)
    assert w.count() == 4 * 2 * 4  # nodes * walks * steps
    # every consecutive step is an actual edge
    a = w.select("walk_id", F.col("step").alias("s"), F.col("node").alias("a"))
    b = w.select("walk_id", (F.col("step") - 1).alias("s"), F.col("node").alias("b"))
    hops = a.join(b, ["walk_id", "s"]).select(F.col("b").alias("src"), F.col("a").alias("dst"))
    bad = hops.join(e.select("src", "dst"), ["src", "dst"], "left_anti").count()
    assert bad == 0
    w2 = random_walks(e, walks_per_node=2, length=4)
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))


def test_walk_cooccurrences(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2)]))
    w = random_walks(e, walks_per_node=1, length=3)
    co = walk_cooccurrences(w, window=1)
    assert co.filter("a = b").count() == 0
    assert co.count() > 0


def test_barabasi_albert_shape(spark):
    from networkit_spark.sources.generators import barabasi_albert

    e = barabasi_albert(spark, 500, k=3, seed=1)
    from pyspark.sql import functions as F

    # every src in [1, 500), dsts earlier than srcs (attachment to the past)
    assert e.filter(F.col("dst") >= F.col("src")).count() == 0
    # preferential attachment -> early nodes are hubs: node 0's in-degree
    # far above the median
    indeg = e.groupBy("dst").count()
    d0 = indeg.filter(F.col("dst") < 5).agg(F.sum("count")).first()[0]
    assert d0 > 50


def test_lfr_like_plp_recovery(spark):
    """PLP on the LFR-ish substrate recovers the planted communities at low
    mixing (the reference's community.dat recovery-style test)."""
    from pyspark.sql import functions as F

    from networkit_spark.graph import nodes_range, symmetrize
    from networkit_spark.operators.plp import PLP
    from networkit_spark.sources.generators import lfr_like

    edges, truth = lfr_like(spark, 300, k_communities=5, mu=0.05, seed=3)
    und = symmetrize(edges)
    res = PLP(max_iterations=20).run(und, nodes_range(spark, 300))
    labels = res.get_partition()
    # same-community pairs should overwhelmingly share a PLP label:
    # measure agreement via the dominant label per planted community
    j = labels.join(truth, "node")
    dom = (
        j.groupBy("community", "label").count()
        .groupBy("community")
        .agg(F.max("count").alias("dom"), F.sum("count").alias("tot"))
    )
    agg = dom.agg(F.sum("dom").alias("d"), F.sum("tot").alias("t")).first()
    assert agg["d"] / agg["t"] > 0.8


def test_biased_walks_shape_and_determinism(spark):
    from pyspark.sql import functions as F

    from networkit_spark.graph import edges_df, symmetrize
    from networkit_spark.operators.node2vec import biased_random_walks

    e = symmetrize(edges_df(spark, [(i, (i + 1) % 8) for i in range(8)] + [(0, 4)]))
    w = biased_random_walks(e, p=0.5, q=2.0, length=4, seed=5)
    rows = w.collect()
    # every walk has steps 0..3 and consecutive nodes are adjacent
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    edges_set = {(r["src"], r["dst"]) for r in e.collect()}
    for wid, steps in by_walk.items():
        assert set(steps) == {0, 1, 2, 3}
        for s in range(3):
            assert (steps[s], steps[s + 1]) in edges_set
    # deterministic under repartitioning
    w2 = biased_random_walks(e.repartition(5), p=0.5, q=2.0, length=4, seed=5)
    assert {tuple(r) for r in rows} == {tuple(r) for r in w2.collect()}


def test_biased_walks_p_controls_backtracking(spark):
    from networkit_spark.graph import edges_df, symmetrize
    from networkit_spark.operators.node2vec import biased_random_walks

    # star graph: from a leaf, the ONLY neighbor is the hub; from the hub,
    # low p -> strong return bias back to the previous leaf
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 9)]))
    back = 0
    total = 0
    rows = biased_random_walks(e, p=0.01, q=1.0, length=4, seed=9).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for steps in by_walk.values():
        if steps[0] != 0 and steps[1] == 0:  # leaf -> hub
            total += 1
            if steps[2] == steps[0]:  # returned to the same leaf
                back += 1
    assert total >= 6
    assert back / total > 0.7  # p=0.01 makes return ~100x likelier


def test_node2vec_embeddings_als(spark):
    from networkit_spark.graph import edges_df, symmetrize
    from networkit_spark.operators.node2vec import (
        biased_random_walks,
        node2vec_embeddings,
    )

    # two cliques joined by one bridge — embeddings should separate them
    import itertools

    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(5, 10), 2))
    e = symmetrize(edges_df(spark, c1 + c2 + [(4, 5)]))
    walks = biased_random_walks(e, p=1.0, q=1.0, walks_per_node=8, length=8, seed=2)
    emb = node2vec_embeddings(walks, dim=8, window=3, iterations=10)
    vecs = {r["node"]: r["embedding"] for r in emb.collect()}
    assert len(vecs) >= 9
    import numpy as np

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    intra = np.mean([cos(vecs[a], vecs[b]) for a, b in c1 if a in vecs and b in vecs])
    inter = np.mean([cos(vecs[a], vecs[b]) for a in range(3) for b in range(7, 10)
                     if a in vecs and b in vecs])
    assert intra > inter


def test_k_path_centrality(spark):
    from networkit_spark.operators.walks import k_path_centrality
    from networkit_spark.graph import edges_df, nodes_range, symmetrize

    # star: the center is on every path between leaves -> top score
    n = 8
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, n)]))
    nodes = nodes_range(spark, n)
    a = {r["node"]: r["score"] for r in k_path_centrality(e, nodes, k=3, t=128).collect()}
    b = {r["node"]: r["score"] for r in k_path_centrality(e, nodes, k=3, t=128).collect()}
    assert a == b  # hash-seeded determinism
    assert all(v >= 0 for v in a.values())
    leaves_mean = sum(a[i] for i in range(1, n)) / (n - 1)
    assert a[0] > leaves_mean  # center dominates


def test_hyperbolic_matches_brute_force(spark):
    """The core/periphery band join must find EXACTLY the pairs the O(n^2)
    distance check finds (HyperbolicSpace::nativeDistance:19-41)."""
    import math

    from networkit_spark.sources.generators import (
        hyperbolic_graph,
        hyperbolic_target_radius,
        _u01,
    )
    from pyspark.sql import functions as F

    n, avg_deg, plexp, seed = 200, 6.0, 3.0, 42
    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(n, avg_deg, alpha)
    pts = spark.range(n).select(
        F.col("id").alias("node"),
        (2 * math.pi * _u01(F.col("id"), F.lit(seed), F.lit(0))).alias("theta"),
        (F.acosh(1 + _u01(F.col("id"), F.lit(seed), F.lit(1)) * F.lit(math.cosh(alpha * R) - 1))
         / F.lit(alpha)).alias("r"),
    ).collect()
    coords = {p["node"]: (p["theta"], p["r"]) for p in pts}
    expected = set()
    for u in range(n):
        for v in range(u + 1, n):
            t1, r1 = coords[u]
            t2, r2 = coords[v]
            dphi = math.pi - abs(math.pi - abs(t1 - t2))
            coshd = math.cosh(r1) * math.cosh(r2) - math.sinh(r1) * math.sinh(r2) * math.cos(dphi)
            if coshd <= math.cosh(R):
                expected.add((u, v))
    e = hyperbolic_graph(spark, n, avg_degree=avg_deg, plexp=plexp, seed=seed)
    got = {(r["src"], r["dst"]) for r in e.filter("src < dst").collect()}
    assert got == expected
    # degree sanity: within 2x of target on this small sample
    m = len(got)
    assert 0.3 * avg_deg < 2 * m / n < 3 * avg_deg
