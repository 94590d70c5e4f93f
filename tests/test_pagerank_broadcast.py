import numpy as np

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.pagerank import PageRank
from networkit_spark.operators.pagerank_broadcast import PageRankBroadcast

from tests.fixtures import PR8_EDGES, PR8_EXPECTED


def vec(df, n):
    rows = {r["node"]: r["score"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_broadcast_kernel_golden(spark):
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    res = PageRankBroadcast(tol=1e-8, max_iterations=80).run(
        e, nodes_range(spark, 8), directed=False
    )
    got = vec(res.scores_df, 8)
    assert np.allclose(got, PR8_EXPECTED, atol=1e-4)
    assert res.converged


def test_broadcast_matches_shuffle_kernel(spark):
    edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, i % 5) for i in range(40) if i % 5 != i
    ]
    e = edges_df(spark, [p for p in edges if p[0] != p[1]])
    nodes = nodes_range(spark, 40)
    a = vec(PageRank(tol=1e-10).run(e, nodes, directed=True).scores(), 40)
    b = vec(
        PageRankBroadcast(tol=1e-10).run(e, nodes, directed=True).scores_df, 40
    )
    assert np.allclose(a, b, atol=1e-9)
