"""algebraic.py — matrix views + eigen decompositions vs numpy closed forms."""

import numpy as np
import pytest

from networkit_spark.algebraic import (
    MAX_MATRIX_NODES,
    adjacency_eigenvectors,
    adjacency_matrix,
    laplacian_eigenvectors,
    laplacian_matrix,
    pagerank_matrix,
    symmetric_eigenvectors,
)

EDGES = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 1.0), (2, 3, 1.0)]
N = 5  # node 4 isolated


def _df(spark):
    return spark.createDataFrame(EDGES, "src bigint, dst bigint, weight double")


def test_adjacency_and_laplacian(spark):
    A = adjacency_matrix(_df(spark), N)
    assert A[0, 1] == A[1, 0] == 1.0
    assert A[1, 2] == A[2, 1] == 2.0
    assert A[4].sum() == 0.0
    L = laplacian_matrix(_df(spark), N)
    assert np.allclose(L.sum(axis=1), 0.0)
    assert L[2, 2] == 4.0  # weighted degree of node 2


def test_pagerank_matrix_power_iteration(spark):
    M = pagerank_matrix(_df(spark), N, damp=0.85)
    # structure checks (algebraic.py:100-137): damped column-stochastic part
    # + identity-scaled teleport — an isolated node's only inflow is its own
    # diagonal entry, so its mass decays under power iteration
    assert M[4, 4] == pytest.approx((1 - 0.85) / N)
    x = np.ones(N) / N
    for _ in range(200):
        x = M @ x
    assert np.all(x >= 0)
    assert x[4] < 1e-9
    assert x[:4].sum() > 0


def test_symmetric_eigenvectors_orthonormal(spark):
    L = laplacian_matrix(_df(spark), N)
    w, v = symmetric_eigenvectors(L, cutoff=2)
    assert len(w) == 3 and len(v) == 3
    assert w == sorted(w)
    for vec in v:
        assert np.linalg.norm(vec) == pytest.approx(1.0, abs=1e-9)
    # eigen relation
    for lam, vec in zip(w, v):
        assert np.allclose(L @ vec, lam * vec, atol=1e-8)


def test_laplacian_smallest_eigenvalue_zero(spark):
    w, _ = laplacian_eigenvectors(_df(spark), N, cutoff=0, reverse=True)
    assert w[0] == pytest.approx(0.0, abs=1e-9)


def test_adjacency_eigenvectors_largest(spark):
    A = adjacency_matrix(_df(spark), N)
    w, v = adjacency_eigenvectors(_df(spark), N, cutoff=0)
    expect = np.linalg.eigvalsh(A).max()
    assert w[0] == pytest.approx(expect, abs=1e-9)


def test_guard(spark):
    with pytest.raises(ValueError):
        adjacency_matrix(_df(spark), MAX_MATRIX_NODES + 1)
