import numpy as np

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.closeness import closeness, top_closeness


def vec(df, n, col="score"):
    rows = {r["node"]: r[col] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


PATH5 = [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_closeness_path_exact(spark):
    e = symmetrize(edges_df(spark, PATH5))
    got = vec(closeness(e, nodes_range(spark, 5)), 5)
    # closeness(u) = r/sum d: node 0: 4/(1+2+3+4)=0.4; node 2: 4/(1+1+2+2)=4/6
    assert np.allclose(got, [0.4, 4 / 7, 4 / 6, 4 / 7, 0.4], atol=1e-12)


def test_harmonic_closeness_path(spark):
    e = symmetrize(edges_df(spark, PATH5))
    got = vec(closeness(e, nodes_range(spark, 5), harmonic=True), 5)
    expect0 = 1 + 1 / 2 + 1 / 3 + 1 / 4
    expect2 = 1 + 1 + 1 / 2 + 1 / 2
    assert abs(got[0] - expect0) < 1e-12
    assert abs(got[2] - expect2) < 1e-12


def test_top_closeness_center_first(spark):
    e = symmetrize(edges_df(spark, PATH5))
    top = top_closeness(e, nodes_range(spark, 5), k=1).first()
    assert top["node"] == 2


def test_closeness_sampled_estimates(spark):
    e = symmetrize(edges_df(spark, PATH5))
    nodes = nodes_range(spark, 5)
    exact = vec(closeness(e, nodes), 5)
    approx = vec(closeness(e, nodes, sources=nodes.filter("id in (0, 2, 4)")), 5)
    # crude estimator: just require same argmax and positive correlation
    assert np.argmax(approx) == np.argmax(exact)


def test_betweenness_path(spark):
    e = symmetrize(edges_df(spark, PATH5))
    got = vec(betweenness(e, nodes_range(spark, 5)), 5)
    # P5 NetworKit ordered-pair convention: [0, 6, 8, 6, 0]
    assert np.allclose(got, [0, 6, 8, 6, 0], atol=1e-9)


def test_betweenness_star(spark):
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 5)]))
    got = vec(betweenness(e, nodes_range(spark, 5)), 5)
    assert np.allclose(got, [12, 0, 0, 0, 0], atol=1e-9)  # 4*3 ordered pairs via hub


def test_betweenness_multiple_shortest_paths(spark):
    # diamond: 0-1-3, 0-2-3 (two equal paths): b(1)=b(2)=1.0 (ordered pairs)
    e = symmetrize(edges_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]))
    got = vec(betweenness(e, nodes_range(spark, 4)), 4)
    assert np.allclose(got, [1.0, 1.0, 1.0, 1.0], atol=1e-9)


def test_betweenness_sampled_scales(spark):
    e = symmetrize(edges_df(spark, PATH5))
    nodes = nodes_range(spark, 5)
    approx = vec(betweenness(e, nodes, sources=nodes.filter("id in (0, 4)")), 5)
    # endpoint sources see every interior node on the single 0-4 path:
    # delta sums = 4 each, scaled by n/k = 2.5 -> 10.0
    assert np.allclose(approx, [0, 10, 10, 10, 0], atol=1e-9)
