import numpy as np

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.pagerank import PageRank
from networkit_spark.operators.pagerank_csr import PageRankCSR

from tests.fixtures import PR8_EDGES, PR8_EXPECTED


def vec(df, n):
    rows = {r["node"]: r["score"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_csr_matches_golden(spark):
    e = symmetrize(edges_df(spark, PR8_EDGES, weighted=True))
    res = PageRankCSR(tol=1e-8, blocks=4).run(e, nodes_range(spark, 8), directed=False)
    got = vec(res.scores_df, 8)
    assert np.allclose(got, PR8_EXPECTED, atol=1e-4)
    assert res.converged


def test_csr_matches_dataframe_kernel(spark):
    # deterministic mid-size directed graph
    edges = [(i, (i * 3 + 1) % 50) for i in range(50)] + [(i, i % 7) for i in range(50) if i % 7 != i]
    e = edges_df(spark, [p for p in edges if p[0] != p[1]])
    nodes = nodes_range(spark, 50)
    a = vec(PageRank(tol=1e-10).run(e, nodes, directed=True).scores(), 50)
    b = vec(PageRankCSR(tol=1e-10, blocks=4).run(e, nodes, directed=True).scores_df, 50)
    assert np.allclose(a, b, atol=1e-9)
