"""SpectralPartitioner (reference ``community.pyx:2040-2215``).

Recursive spectral bisection: take the ``ceil(log2(count)) + 1`` smallest
Laplacian eigenpairs, then split each bucket on a quantile (balanced) or
mean (unbalanced) of the next eigenvector, trisecting when an odd factor
calls for it — exactly the reference's ``_bisect`` / ``_trisect``
recursion, including its float-division arithmetic on ``count``.

Scale stance: the eigendecomposition reuses ``algebraic.py``'s guarded
dense path (no scipy/Lanczos in this container); the recursion itself is
O(n log count) numpy. The distributed analogs for partitioning at 100 TB
are the community kernels (PLP/PLM/Leiden) — this class is the spectral
small-graph tool, same stance as ``nxadapter`` / ``algebraic``.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from networkit_spark.algebraic import laplacian_eigenvectors


def _quantiles(eigv: np.ndarray, members: list[int], count: int = 1):
    vals = sorted(float(eigv[i]) for i in members)
    sections = count + 1
    return [vals[math.floor(len(vals) * i / sections)] for i in range(1, sections)]


class _Replica:
    """Driver-side replica of the reference recursion (same state names)."""

    def __init__(self, eigenvectors, n, count, balanced):
        self.eigenvectors = eigenvectors
        self.n = n
        self.count = count
        self.balanced = balanced
        self.next_partition = 0
        self.partitions: dict[int, list[int]] = {}

    def _vertices(self, partition):
        if partition is None:
            return list(range(self.n))
        return self.partitions[partition]

    def _trisect(self, partition=None, iteration=1):
        vertices = self._vertices(partition)
        eigv = self.eigenvectors[iteration]
        q = _quantiles(eigv, vertices, count=2)
        pa, pb, pc = self.next_partition, self.next_partition + 1, self.next_partition + 2
        self.next_partition += 3
        self.partitions[pa], self.partitions[pb], self.partitions[pc] = [], [], []
        for v in vertices:
            if eigv[v] < q[0]:
                self.partitions[pa].append(v)
            elif eigv[v] < q[1]:
                self.partitions[pb].append(v)
            else:
                self.partitions[pc].append(v)
        if partition is not None:
            del self.partitions[partition]

    def _bisect(self, count, partition=None, iteration=1):
        if count == 1:
            return
        if count == 3:
            self._trisect(partition=partition)
            return
        vertices = self._vertices(partition)
        eigv = self.eigenvectors[iteration]
        if self.balanced:
            split = _quantiles(eigv, vertices)[0]
        else:
            split = float(np.mean([eigv[i] for i in vertices]))
        pa, pb = self.next_partition, self.next_partition + 1
        self.next_partition += 2
        self.partitions[pa], self.partitions[pb] = [], []
        for v in vertices:
            (self.partitions[pa] if eigv[v] < split else self.partitions[pb]).append(v)
        if partition is not None:
            del self.partitions[partition]
        if count > 2:
            if count % 2 == 0:
                self._bisect(count / 2, partition=pa, iteration=iteration + 1)
                self._bisect(count / 2, partition=pb, iteration=iteration + 1)
            else:
                next_count = (count - 1) / 2
                if next_count > 2:
                    self._bisect(next_count, partition=pa, iteration=iteration + 1)
                    self._bisect(next_count + 1, partition=pb, iteration=iteration + 1)
                else:
                    self._bisect(next_count, partition=pa, iteration=iteration + 1)
                    self._trisect(partition=pb, iteration=iteration + 1)


def spectral_partition(
    und_edges: DataFrame,
    n: int,
    count: int,
    balanced: bool = True,
    spark: SparkSession | None = None,
) -> DataFrame:
    """SpectralPartitioner.run (community.pyx:2191-2215) -> (node, label),
    labels compacted to 0..k-1 in bucket creation order (the reference's
    ``_generatePartition`` iteration order)."""
    if count < 2:
        raise ValueError("count must be >= 2")
    spark = spark or und_edges.sparkSession
    cutoff = math.ceil(math.log(count, 2)) + 1
    _vals, vecs = laplacian_eigenvectors(und_edges, n, cutoff=cutoff, reverse=True)
    rep = _Replica(vecs, n, count, balanced)
    rep._bisect(count)
    rows = []
    label = 0
    for _idx, members in rep.partitions.items():
        if not members:
            continue
        rows.extend((int(v), label) for v in members)
        label += 1
    return spark.createDataFrame(rows, "node long, label long")


def spectral_coloring(
    und_edges: DataFrame,
    n: int,
    spark: SparkSession | None = None,
) -> DataFrame:
    """SpectralColoring (reference ``networkit/coloring.py:5-120``): start
    with every node in color 0, recursively split a color class by the
    *sign* of the next adjacency eigenvector (depth = recursion level,
    exactly the reference's ``split``), until each class is an independent
    set (the reference's ``valid``).  Returns (node, color) with the
    reference's color-id allocation order (0 keeps the >= 0 side, a fresh
    id takes the < 0 side).

    Scale stance: same guarded dense-eigendecomposition path as
    ``spectral_partition`` / ``algebraic.py`` — the reference itself is a
    driver-side pure-python loop over scipy eigenvectors; the distributed
    coloring for 100 TB graphs is ``mis_coloring.GreedyColoring``.
    """
    from networkit_spark.algebraic import adjacency_eigenvectors

    spark = spark or und_edges.sparkSession
    _vals, vecs = adjacency_eigenvectors(und_edges, n)
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for r in und_edges.select("src", "dst").collect():
        u, v = int(r[0]), int(r[1])
        if u != v:
            adj[u].add(v)
            adj[v].add(u)

    colors: dict[int, set[int]] = {0: set(range(n))}
    next_color = 1

    def valid(c: int) -> bool:
        cls = colors[c]
        return all(not (adj[v] & cls) for v in cls)

    def split(c: int, depth: int = 0) -> None:
        nonlocal next_color
        if depth >= len(vecs):
            raise ValueError(
                f"spectral_coloring: recursion exhausted the {len(vecs)} "
                "computed eigenvectors (reference coloring.py would "
                "IndexError here)"
            )
        other = next_color
        next_color += 1
        vs = colors[c]
        colors[c] = {v for v in vs if vecs[depth][v] >= 0}
        colors[other] = {v for v in vs if vecs[depth][v] < 0}
        if not valid(c):
            split(c, depth=depth + 1)
        if not valid(other):
            split(other, depth=depth + 1)

    split(0)
    rows = sorted(
        (int(v), int(c)) for c, members in colors.items() for v in members
    )
    return spark.createDataFrame(rows, "node long, color long")
