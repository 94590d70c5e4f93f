from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.anf import (
    effective_diameter_approx,
    effective_diameter_exact,
    neighborhood_function_approx,
)


def path_graph(spark, n):
    return symmetrize(edges_df(spark, [(i, i + 1) for i in range(n - 1)]))


def test_nf_monotone_and_saturates(spark):
    e = path_graph(spark, 10)
    nf = neighborhood_function_approx(e, nodes_range(spark, 10), k=32)
    vals = [v for _, v in nf]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))  # monotone
    # saturates by diameter (9 hops) and stops early
    assert nf[-1][0] <= 11


def test_effective_diameter_exact_path(spark):
    # path of 10: pairs within h hops known in closed form
    e = path_graph(spark, 10)
    d = effective_diameter_exact(e, nodes_range(spark, 10), ratio=1.0)
    assert d == 9.0  # full diameter at ratio 1


def test_effective_diameter_approx_tracks_exact(spark):
    e = path_graph(spark, 16)
    nodes = nodes_range(spark, 16)
    exact = effective_diameter_exact(e, nodes, ratio=0.9)
    approx = effective_diameter_approx(e, nodes, ratio=0.9, k=64)
    # FM estimation error: within ~35% on a 16-node graph with k=64
    assert abs(approx - exact) / exact < 0.35, (approx, exact)


def test_clique_effective_diameter_one(spark):
    e = symmetrize(edges_df(spark, [(a, b) for a in range(8) for b in range(a + 1, 8)]))
    d = effective_diameter_approx(e, nodes_range(spark, 8), ratio=0.9, k=32)
    assert d <= 1.5


def test_hyperball_harmonic_directed_star(spark):
    """Hub of an in-star dominates; estimates track exact in-harmonic."""
    from pyspark.sql import functions as F

    from networkit_spark.operators.anf import hyperball_harmonic
    from networkit_spark.operators.closeness import closeness

    rows = [(i, 0) for i in range(1, 21)] + [(i, (i % 20) + 1) for i in range(1, 21)]
    e = (
        spark.createDataFrame(rows, ["src", "dst"])
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    nodes = spark.range(21).select(F.col("id"))
    hb = {r.node: r.score for r in hyperball_harmonic(e, nodes, k=64).collect()}
    ex = {r.node: r.score for r in closeness(e, nodes, harmonic=True).collect()}
    assert max(hb, key=hb.get) == max(ex, key=ex.get) == 0
    pos = [k for k in ex if ex[k] > 0]
    err = sum(abs(hb[k] - ex[k]) / ex[k] for k in pos) / len(pos)
    assert err < 0.25  # FM-sketch tolerance at k=64

    # deterministic: same input, same scores
    hb2 = {r.node: r.score for r in hyperball_harmonic(e, nodes, k=64).collect()}
    assert hb == hb2


def test_host_harmonic_approx_matches_exact_ranking(spark):
    from networkit_spark.functions.webgraph import (
        host_graph,
        host_harmonic,
        host_harmonic_approx,
    )

    links = spark.createDataFrame(
        [(f"https://a{i}.x/p", "https://hub.x/") for i in range(8)]
        + [("https://hub.x/", "https://a0.x/p"), ("https://a1.x/p", "https://a2.x/p")],
        ["src_url", "dst_url"],
    )
    hg = host_graph(links)
    approx = {r.host: r.score for r in host_harmonic_approx(hg, k=64).collect()}
    assert max(approx, key=approx.get) == "hub.x"
    exact = {r.host: r.score for r in host_harmonic(hg).collect()}
    assert max(exact, key=exact.get) == "hub.x"
