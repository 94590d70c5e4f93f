"""ForestCentrality — forest matrix diagonal + closeness scores.

numpy oracle: Omega = inv(I + L) (Chebotarev-Shamis forest matrix; the
quantity ForestCentrality.cpp approximates via augmented-graph USTs),
score(u) = n / (n * Omega_uu + trace(Omega) - 2) (computeScores,
ForestCentrality.cpp:139-147).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.electrical import (
    create_augmented_graph,
    forest_centrality,
    forest_matrix_columns_jacobi,
)

# 7-node graph: triangle + path + pendant, plus an isolated node 6
EDGES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
N = 7


def _numpy_forest(n, edges):
    L = np.zeros((n, n))
    for a, b in edges:
        L[a, a] += 1
        L[b, b] += 1
        L[a, b] -= 1
        L[b, a] -= 1
    omega = np.linalg.inv(np.eye(n) + L)
    diag = np.diag(omega)
    farness = n * diag + omega.trace() - 2.0
    return diag, n / farness


def _edges_df(spark):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in EDGES] + [(b, a, 1.0) for a, b in EDGES],
        "src bigint, dst bigint, weight double",
    )


def test_forest_centrality_exact(spark):
    nodes = spark.range(N)
    out = forest_centrality(_edges_df(spark), nodes, exact_diag=True)
    rows = {r["node"]: r for r in out.collect()}
    diag, scores = _numpy_forest(N, EDGES)
    for u in range(N):
        assert rows[u]["diag"] == pytest.approx(diag[u], abs=1e-6)
        assert rows[u]["score"] == pytest.approx(scores[u], abs=1e-6)


def test_forest_centrality_probe_estimate(spark):
    nodes = spark.range(N)
    out = forest_centrality(_edges_df(spark), nodes, k=256, exact_diag=False)
    rows = {r["node"]: r for r in out.collect()}
    diag, scores = _numpy_forest(N, EDGES)
    # Hutchinson probes: unbiased, k=256 keeps relative error small on a
    # 7-node graph; ranking of the extreme nodes must be preserved
    for u in range(N):
        assert rows[u]["diag"] == pytest.approx(diag[u], rel=0.25, abs=0.05)
    best = max(range(N), key=lambda u: scores[u])
    got_best = max(rows, key=lambda u: rows[u]["score"])
    assert got_best == best


def test_create_augmented_graph(spark):
    nodes = spark.range(N)
    aug, root = create_augmented_graph(_edges_df(spark), nodes)
    assert root == N
    deg = {
        r["src"]: r["c"]
        for r in aug.groupBy("src").agg(F.count("*").alias("c")).collect()
    }
    # reference precondition (ForestCentrality.cpp:31-34): root degree n
    assert deg[root] == N
    # isolated node 6 now has exactly the spoke
    assert deg[6] == 1


def test_forest_jacobi_matches_numpy_replica(spark):
    sources = [0, 3]
    iters, omega_w = 10, 0.5
    out = forest_matrix_columns_jacobi(
        _edges_df(spark), spark.range(N), sources, iterations=iters, omega=omega_w
    )
    got = {(r["u"], r["node"]): r["x"] for r in out.collect()}
    # sequential replica of the same damped-Jacobi recurrence
    A = np.zeros((N, N))
    for a, b in EDGES:
        A[a, b] = A[b, a] = 1.0
    d = A.sum(axis=1)
    for u in sources:
        b_vec = np.zeros(N)
        b_vec[u] = 1.0
        x = np.zeros(N)
        for _ in range(iters):
            x = (1 - omega_w) * x + omega_w * (b_vec + A @ x) / (d + 1.0)
        for v in range(N):
            assert got[(u, v)] == pytest.approx(x[v], abs=1e-9)


def test_forest_jacobi_converges_to_forest_column(spark):
    # many sweeps -> column of (I+L)^{-1}
    out = forest_matrix_columns_jacobi(
        _edges_df(spark), spark.range(N), [0], iterations=120, omega=0.7
    )
    got = {r["node"]: r["x"] for r in out.collect()}
    L = np.zeros((N, N))
    for a, b in EDGES:
        L[a, a] += 1
        L[b, b] += 1
        L[a, b] -= 1
        L[b, a] -= 1
    col = np.linalg.inv(np.eye(N) + L)[:, 0]
    for v in range(N):
        assert got[v] == pytest.approx(col[v], abs=1e-6)
