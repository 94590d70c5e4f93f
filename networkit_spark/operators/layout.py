"""Graph layout: PivotMDS.

Reference: ``cpp/viz/PivotMDS.cpp`` (Brandes-Pich pivot MDS): distances
from ``numPivots`` pivot nodes to every node, double-center that n x k
matrix C, power-iterate the top ``dim`` eigenvectors of C^T C (with
deflation), and place node i at ``(C e_1)[i], (C e_2)[i], ...``.

Faithful quirk kept: the reference centers the RAW hop distances (despite
its comment, it never squares them and never applies the classical -1/2) —
we replicate that so coordinates are comparable.

Distributed shape: pivot selection is the portable seeded draw; the n x k
distance matrix is ONE batched multi-source BFS (k pivots ride one wave);
row means are a groupBy, column means an agg; C^T C is a k x k gram matrix
reduced with one self-join + agg and collected (k is small by design —
the whole point of pivot MDS); the eigenproblem is numpy ``eigh`` on the
driver (equivalent to the reference's power method + deflation, but
deterministic), and the final coordinates are one broadcast-join matvec.
Sign of each eigenvector is pinned (first largest-|.| component positive)
so results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_centered_matrix(
    und_edges: DataFrame,
    nodes: DataFrame,
    num_pivots: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, int]:
    """-> (C(node, j, c), k): the double-centered node x pivot hop-distance
    matrix PivotMDS eigensolves (``viz/PivotMDS.cpp:49-71``) — seeded
    portable-hash pivot draw, one multi-source BFS, centering over the full
    grid with unreached entries as zeros. Factored out so the oracle twin
    query can pin everything up to the (driver-side, k x k) eigensolve."""
    from networkit_spark.operators.distance import multi_source_bfs
    from networkit_spark.operators.sampling import _draw

    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst").persist()
    e.count()
    n = nodes.count()
    k = min(num_pivots, n)
    # seeded pivot draw: k smallest portable hashes (without replacement;
    # the reference draws randomNodes — same distribution family)
    pivots = (
        nodes.select(F.col("id"))
        .orderBy(_draw("pmds_pivot", seed, F.col("id")), F.col("id"))
        .limit(k)
    )
    piv = [int(r["id"]) for r in pivots.collect()]
    pidx = {v: j for j, v in enumerate(piv)}
    pmap = spark.createDataFrame(
        [(v, j) for v, j in pidx.items()], "source long, j long"
    )
    d = (
        multi_source_bfs(e, spark.createDataFrame([(v,) for v in piv], "id long"))
        .join(F.broadcast(pmap), "source")
        .select("node", "j", F.col("dist").cast("double").alias("v"))
        .persist()
    )
    d.count()
    e.unpersist()
    # double centering (AffectedNodes-free replica of PivotMDS.cpp:49-71):
    # missing entries (unreached) are zeros, exactly like the CSR triplets
    row_mean = d.groupBy("node").agg((F.sum("v") / k).alias("rm"))
    col_mean = {
        int(r["j"]): float(r["cm"])
        for r in d.groupBy("j").agg((F.sum("v") / n).alias("cm")).collect()
    }
    grand = sum(
        float(r["rm"]) for r in row_mean.select("rm").collect()
    ) / (2.0 * n) + sum(col_mean.values()) / (2.0 * k)
    cm_df = spark.createDataFrame(
        [(j, col_mean.get(j, 0.0)) for j in range(k)], "j long, cm double"
    )
    # centered C over the FULL node x pivot grid (zeros center too)
    grid = nodes.select(F.col("id").alias("node")).crossJoin(F.broadcast(cm_df))
    C = (
        grid.join(d, ["node", "j"], "left")
        .join(row_mean, "node", "left")
        .select(
            "node", "j",
            (
                F.coalesce("v", F.lit(0.0))
                - F.coalesce("rm", F.lit(0.0))
                - F.col("cm")
                + F.lit(grand)
            ).alias("c"),
        )
        .persist()
    )
    C.count()
    d.unpersist()
    return C, k


def pivot_mds(
    und_edges: DataFrame,
    nodes: DataFrame,
    dim: int = 2,
    num_pivots: int = 16,
    seed: int = 42,
) -> DataFrame:
    """-> (node, x0 .. x{dim-1}) coordinates. ``und_edges``: symmetric
    unweighted rows (hop distances, matching the reference's BFS on
    unweighted graphs)."""
    import numpy as np

    spark = und_edges.sparkSession
    C, k = pivot_centered_matrix(und_edges, nodes, num_pivots, seed)
    # gram = C^T C (k x k), one self-join + agg
    gram_rows = (
        C.alias("a")
        .join(C.alias("b"), F.col("a.node") == F.col("b.node"))
        .groupBy(F.col("a.j").alias("j1"), F.col("b.j").alias("j2"))
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("g"))
        .collect()
    )
    G = np.zeros((k, k))
    for r in gram_rows:
        G[int(r["j1"]), int(r["j2"])] = float(r["g"])
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1][:dim]
    E = vecs[:, order]
    for c in range(E.shape[1]):  # pin sign
        lead = int(np.argmax(np.abs(E[:, c])))
        if E[lead, c] < 0:
            E[:, c] = -E[:, c]
    evec = spark.createDataFrame(
        [(j, *[float(E[j, c]) for c in range(dim)]) for j in range(k)],
        "j long, " + ", ".join(f"e{c} double" for c in range(dim)),
    )
    out = (
        C.join(F.broadcast(evec), "j")
        .groupBy("node")
        .agg(*[F.sum(F.col("c") * F.col(f"e{c}")).alias(f"x{c}") for c in range(dim)])
    )
    out = out.localCheckpoint(eager=True)
    C.unpersist()
    return out
