"""Algebraic module — ``networkit/algebraic.py`` parity (matrix views of a
graph + eigen decompositions).

The reference converts a graph into scipy sparse matrices
(adjacencyMatrix :34, laplacianMatrix :81, PageRankMatrix :100) and wraps
scipy eigensolvers (symmetricEigenvectors :139, eigenvectors :179,
laplacianEigenvectors / adjacencyEigenvectors :219+). This container has no
scipy, so the matrices are dense numpy built from a GUARDED collect (same
contract as ``nxadapter``: an explicit max_nodes bound, because a matrix
view is definitionally single-machine — the distributed analogs of these
matrices are the operators themselves: ``operators/pagerank.py`` is the
PageRank matrix power iteration, ``operators/electrical.py`` applies the
Laplacian as an edge join without ever materializing it).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

MAX_MATRIX_NODES = 20_000


def _collect_edges(edges: DataFrame, n: int):
    if n > MAX_MATRIX_NODES:
        raise ValueError(
            f"dense matrix view over {n} nodes exceeds MAX_MATRIX_NODES="
            f"{MAX_MATRIX_NODES}; use the distributed operators instead"
        )
    return [(r[0], r[1], r[2]) for r in edges.select("src", "dst", "weight").collect()]


def adjacency_matrix(edges: DataFrame, n: int, directed: bool = False) -> np.ndarray:
    """Dense adjacency (algebraic.py:34-78 semantics: weighted entries; an
    undirected edge sets both orientations). ``edges`` may carry one or both
    orientations for the undirected case — entries are assigned, not added,
    matching the reference."""
    A = np.zeros((n, n))
    for u, v, w in _collect_edges(edges, n):
        A[u, v] = w
        if not directed:
            A[v, u] = w
    return A


def laplacian_matrix(edges: DataFrame, n: int, directed: bool = False) -> np.ndarray:
    """L = D - A (algebraic.py:81-97 via scipy.csgraph.laplacian)."""
    A = adjacency_matrix(edges, n, directed)
    return np.diag(A.sum(axis=1)) - A


def pagerank_matrix(edges: DataFrame, n: int, damp: float = 0.85) -> np.ndarray:
    """algebraic.py:100-137: column-stochastic A*D^-1 damped + uniform
    teleport diag ((1-damp)/n * I — the reference adds identity, not the
    dense teleport block; reproduced verbatim)."""
    A = adjacency_matrix(edges, n, directed=False)
    deg = A.sum(axis=1)
    inv = np.divide(1.0, deg, out=np.zeros_like(deg), where=deg > 0)
    stochastic = A @ np.diag(inv)
    return damp * stochastic + ((1.0 - damp) / n) * np.eye(n)


def symmetric_eigenvectors(matrix: np.ndarray, cutoff: int = -1, reverse: bool = False):
    """algebraic.py:139-177: ordered (eigenvalues, eigenvectors) of a
    symmetric matrix; cutoff+1 extreme eigenpairs, ascending order like the
    reference's post-sort."""
    if cutoff == -1:
        cutoff = matrix.shape[0] - 3
    w, v = np.linalg.eigh(matrix)
    idx = np.argsort(w)
    take = idx[: cutoff + 1] if reverse else idx[-(cutoff + 1):]
    take = sorted(take, key=lambda i: w[i])
    return [float(w[i]) for i in take], [v[:, i] for i in take]


def eigenvectors(matrix: np.ndarray, cutoff: int = -1, reverse: bool = False):
    """algebraic.py:179-217 (general matrices, largest/smallest real part)."""
    if cutoff == -1:
        cutoff = matrix.shape[0] - 3
    w, v = np.linalg.eig(matrix)
    idx = np.argsort(w.real)
    take = idx[: cutoff + 1] if reverse else idx[-(cutoff + 1):]
    take = sorted(take, key=lambda i: w[i].real)
    return [w[i] for i in take], [v[:, i] for i in take]


def laplacian_eigenvectors(edges: DataFrame, n: int, cutoff: int = -1, reverse: bool = False):
    """algebraic.py laplacianEigenvectors."""
    return symmetric_eigenvectors(laplacian_matrix(edges, n), cutoff, reverse)


def adjacency_eigenvectors(edges: DataFrame, n: int, cutoff: int = -1, reverse: bool = False):
    """algebraic.py adjacencyEigenvectors."""
    return symmetric_eigenvectors(adjacency_matrix(edges, n), cutoff, reverse)
