"""Degree / eigenvector / Katz centrality — the PageRank-loop family.

References:
- ``cpp/centrality/DegreeCentrality.cpp:16-56`` — degree (out, or in for
  directed when ``outDeg=false``); ``normalized`` divides by the theoretical
  maximum n-1 (``maximum()``, self-loops ignored by default).
- ``cpp/centrality/EigenvectorCentrality.cpp:18-56`` — power iteration:
  init 1.0; gather ``sum_in ew * score[v]``; L2-normalize every iteration;
  stop when the vector norm stabilizes (``|len - oldLen| <= tol``); sign fix
  (all-positive) at the end.
- ``cpp/centrality/KatzCentrality.cpp:26-77`` — iterate
  ``values[u] = beta + alpha * sum_in ew * (1 + score[v])`` (note the
  **unnormalized** scores carry across iterations; normalization by the L2
  norm happens once after convergence); default
  ``alpha = 1/(1 + maxDegree)`` (``:15-17``), ``beta = 1``.

All three share PageRank's physical plan: one shuffle per superstep
(scores x contrib join on src, agg by dst); the scalar norm is a second
scalar agg on the materialized state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges, transpose


@dataclass
class ScoresResult:
    scores_df: DataFrame
    iterations: int
    converged: bool

    def scores(self) -> DataFrame:
        return self.scores_df

    def ranking(self, k: int | None = None) -> DataFrame:
        out = self.scores_df.orderBy(F.desc("score"), F.asc("node"))
        return out.limit(k) if k else out

    def maximum(self) -> float:
        return self.scores_df.agg(F.max("score")).first()[0]


def degree_centrality(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    normalized: bool = False,
    out_deg: bool = True,
) -> DataFrame:
    """(node, score). Ref: ``DegreeCentrality.cpp:16-56``."""
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    e = edges if out_deg else transpose(edges)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("double").alias("score")
    )
    out = (
        nodes.select(F.col("id").alias("node"))
        .join(deg, "node", "left")
        .fillna({"score": 0.0})
    )
    if normalized:
        n = nodes.count()
        out = out.select("node", (F.col("score") / (n - 1)).alias("score"))
    return out


def _gather(contrib: DataFrame, scores: DataFrame, expr) -> DataFrame:
    """sum over in-edges of expr(weight, score[src]), grouped by dst.
    shuffle_hash on the score side: with ``contrib`` persisted
    pre-partitioned by src (see :func:`_persist_contrib`), only the n-row
    score table shuffles per iteration — never the m-row edge table."""
    return (
        contrib.join(
            scores.select(F.col("node").alias("src"), "score").hint("shuffle_hash"),
            "src",
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(expr.alias("m"))
    )


def _persist_contrib(edges: DataFrame, *cols: str) -> DataFrame:
    """Loop-invariant edge table pre-partitioned on the per-iteration join
    key (the PageRank contrib recipe)."""
    spark = edges.sparkSession
    shuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return edges.select(*cols).repartition(shuf, "src").persist()


def eigenvector_centrality(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    tol: float = 1e-9,
    max_iterations: int = 500,
) -> ScoresResult:
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    e = _persist_contrib(edges, "src", "dst", "weight")
    e.count()
    scores = nodes.select(F.col("id").alias("node"), F.lit(1.0).alias("score"))
    scores = scores.localCheckpoint(eager=True)
    length, old_length = 0.0, float("inf")
    it = 0
    converged = False
    while it < max_iterations:
        old_length = length
        msgs = _gather(e, scores, F.sum(F.col("weight") * F.col("score")))
        raw = (
            nodes.select(F.col("id").alias("node"))
            .join(msgs, "node", "left")
            .select("node", F.coalesce(F.col("m"), F.lit(0.0)).alias("raw"))
            .localCheckpoint(eager=True)
        )
        length = raw.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).first()[0] or 0.0
        scores = raw.select("node", (F.col("raw") / length).alias("score"))
        scores = scores.localCheckpoint(eager=True)
        it += 1
        if abs(length - old_length) <= tol * max(abs(length), abs(old_length), 1.0):
            converged = True
            break
    e.unpersist()
    # sign fix (EigenvectorCentrality.cpp:52-55): node 0's score < 0 -> abs
    s0 = scores.orderBy("node").first()["score"]
    if s0 < 0:
        scores = scores.select("node", F.abs("score").alias("score"))
    return ScoresResult(scores, it, converged)


def katz_centrality(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    alpha: float | None = None,
    beta: float = 1.0,
    tol: float = 1e-8,
    max_iterations: int = 500,
    in_edges: bool = True,
) -> ScoresResult:
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    e = _persist_contrib(edges if in_edges else transpose(edges), "src", "dst", "weight")
    e.count()
    if alpha is None:
        # default alpha = 1/(1 + max out-degree) (KatzCentrality.cpp:15-17)
        maxdeg = (
            e.groupBy("src").count().agg(F.max("count")).first()[0] or 0
        )
        alpha = 1.0 / (1.0 + maxdeg)
    scores = nodes.select(F.col("id").alias("node"), F.lit(1.0).alias("score"))
    scores = scores.localCheckpoint(eager=True)
    length, old_length = 0.0, float("inf")
    it = 0
    converged = False
    while it < max_iterations:
        old_length = length
        msgs = _gather(
            e, scores, F.sum(F.col("weight") * alpha * (1.0 + F.col("score")))
        )
        scores = (
            nodes.select(F.col("id").alias("node"))
            .join(msgs, "node", "left")
            .select(
                "node", (F.coalesce(F.col("m"), F.lit(0.0)) + beta).alias("score")
            )
            .localCheckpoint(eager=True)
        )
        length = (
            scores.agg(F.sqrt(F.sum(F.col("score") * F.col("score")))).first()[0]
            or 0.0
        )
        it += 1
        if abs(length - old_length) <= tol * max(abs(length), abs(old_length), 1.0):
            converged = True
            break
    e.unpersist()
    final = scores.select("node", (F.col("score") / length).alias("score"))
    return ScoresResult(final, it, converged)


def katz_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int,
    alpha: float | None = None,
    beta: float = 1.0,
) -> DataFrame:
    """Fixed-iteration Katz (oracle-expressible); L2-normalized at the end
    only, matching the reference's post-loop normalization."""
    e = edges.select("src", "dst", "weight")
    if alpha is None:
        maxdeg = e.groupBy("src").count().agg(F.max("count")).first()[0] or 0
        alpha = 1.0 / (1.0 + maxdeg)
    scores = nodes.select(F.col("id").alias("node"), F.lit(1.0).alias("score"))
    for _ in range(iterations):
        msgs = _gather(
            e, scores, F.sum(F.col("weight") * alpha * (1.0 + F.col("score")))
        )
        scores = (
            nodes.select(F.col("id").alias("node"))
            .join(msgs, "node", "left")
            .select("node", (F.coalesce(F.col("m"), F.lit(0.0)) + beta).alias("score"))
            .localCheckpoint(eager=True)
        )
    length = scores.agg(F.sqrt(F.sum(F.col("score") * F.col("score")))).first()[0]
    return scores.select("node", (F.col("score") / length).alias("score"))


def eigenvector_fixed(
    edges: DataFrame, nodes: DataFrame, iterations: int
) -> DataFrame:
    """Fixed-iteration power iteration (oracle-expressible)."""
    scores = nodes.select(F.col("id").alias("node"), F.lit(1.0).alias("score"))
    e = edges.select("src", "dst", "weight")
    for _ in range(iterations):
        msgs = _gather(e, scores, F.sum(F.col("weight") * F.col("score")))
        raw = (
            nodes.select(F.col("id").alias("node"))
            .join(msgs, "node", "left")
            .select("node", F.coalesce(F.col("m"), F.lit(0.0)).alias("raw"))
            .localCheckpoint(eager=True)
        )
        length = raw.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).first()[0]
        scores = raw.select("node", (F.col("raw") / length).alias("score"))
    return scores


def sfigality(und_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, score): fraction of a node's neighbors with STRICTLY higher
    degree (``cpp/centrality/Sfigality.cpp``; ``centrality.pyx:2078``).
    Degree-0 nodes score 0. One degree table + one wedge-free join."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.select("src", "dst")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    hi = e.groupBy(F.col("src").alias("node")).agg(
        F.sum((F.col("dd") > F.col("ds")).cast("int")).alias("nhi"),
        F.count("*").alias("d"),
    )
    return (
        nodes.select(F.col("id").alias("node"))
        .join(hi, "node", "left")
        .select(
            "node",
            F.when(F.col("d") > 0, F.col("nhi") / F.col("d")).otherwise(0.0).alias("score"),
        )
    )


def laplacian_centrality_unweighted(und_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, score): unweighted Laplacian centrality — the drop in the
    Laplacian energy when removing the node; closed form
    ``d(u)^2 + d(u) + 2 * sum_{v in N(u)} d(v)``
    (``cpp/centrality/LaplacianCentrality.cpp``, unweighted branch). Pure
    degree-table joins."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    nbrsum = (
        und_edges.select("src", "dst")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("dd").alias("sdd"))
    )
    return (
        nodes.select(F.col("id").alias("node"))
        .join(deg, "node", "left")
        .join(nbrsum, "node", "left")
        .fillna({"d": 0, "sdd": 0})
        .select(
            "node",
            (F.col("d") * F.col("d") + F.col("d") + 2 * F.col("sdd"))
            .cast("long")
            .alias("score"),
        )
    )


def permanence(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(node, permanence) over a community assignment
    (``cpp/centrality/PermanenceCentrality.cpp:138-156``):

        perm(u) = intra(u) / (maxExt(u) * deg(u)) - (1 - intraCC(u))

    where ``intra(u)`` is u's neighbor count inside its own community
    (the reference's strength map counts neighbors, ``:141``),
    ``maxExt(u)`` the largest single foreign community's count (1 when u
    has no external connection, ``:150-153``), and ``intraCC(u)`` the
    clustering coefficient among u's same-community neighbors
    (``getIntraClustering``, ``:109-135``: triangles restricted to the
    intra-community subgraph over C(intraDeg, 2); 0 for intraDeg < 2).

    Plan: neighbor-label strength aggregation (one shuffle) + per-node
    triangle counts on the label-filtered edge table (a triangle whose apex
    and both feet share a community is exactly an intra-subgraph triangle),
    reusing the degree-oriented enumeration — no window sorts, no Python.
    Nodes with degree 0 are omitted (the reference divides by deg(u)).
    """
    from networkit_spark.operators.triangles import triangle_counts

    la = labels.select(F.col("node").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ld"))
    lab = und_edges.join(la, "src").join(lb, "dst")
    # the reference's strength map counts neighbors (++strength[P[y]], :141),
    # it does not sum edge weights — all terms below are counts
    per_node = lab.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg"),
        F.sum(F.when(F.col("ls") == F.col("ld"), 1).otherwise(0)).alias("intra_deg"),
    )
    max_ext = (
        lab.filter(F.col("ls") != F.col("ld"))
        .groupBy(F.col("src").alias("node"), F.col("ld"))
        .agg(F.count("*").alias("w"))
        .groupBy("node").agg(F.max("w").alias("max_ext"))
    )
    intra_edges = lab.filter(F.col("ls") == F.col("ld")).select("src", "dst", "weight")
    tri = triangle_counts(intra_edges).withColumnRenamed("triangles", "tri")
    icc = F.when(
        F.col("intra_deg") >= 2,
        F.coalesce(F.col("tri"), F.lit(0)) * 2.0 / (F.col("intra_deg") * (F.col("intra_deg") - 1)),
    ).otherwise(0.0)
    return (
        per_node.join(max_ext, "node", "left")
        .join(tri, "node", "left")
        .select(
            "node",
            (
                F.col("intra_deg")
                / F.greatest(F.coalesce(F.col("max_ext"), F.lit(0)), F.lit(1)).cast("double")
                / F.col("deg")
                - (1.0 - icc)
            ).alias("permanence"),
        )
    )


def local_partition_coverage(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(node, score): fraction of a node's incident edge weight that stays
    inside its own cluster (``cpp/centrality/LocalPartitionCoverage.cpp:12-30``:
    same-cluster neighbor weight / weightedDegree; isolated nodes score 0).
    One labeled-edge pass + one groupBy(node)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ld"))
    per_node = (
        und_edges.join(la, "src").join(lb, "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(
            (
                F.sum(F.when(F.col("ls") == F.col("ld"), F.col("weight")).otherwise(0.0))
                / F.sum("weight")
            ).alias("score")
        )
    )
    return (
        labels.select("node")
        .join(per_node, "node", "left")
        .fillna({"score": 0.0})
    )


def centralization(scores_df: DataFrame, theoretical_max: float) -> float:
    """Freeman centralization (``Centrality.cpp:56-73``):
    sum(center - c_v) / sum(theoretical_max - c_v) over nodes, where
    center is the observed maximum score. One aggregation pass."""
    row = scores_df.agg(
        F.max("score").alias("mx"),
        F.sum("score").alias("s"),
        F.count("*").alias("n"),
    ).first()
    center, s, n = row["mx"], row["s"], row["n"]
    diff1 = n * center - s
    diff2 = n * theoretical_max - s
    return diff1 / diff2 if diff2 else 0.0


def betweenness_maximum(n: int, directed: bool = False, normalized: bool = False) -> float:
    """Betweenness::maximum (``Betweenness.cpp:104-113``)."""
    if normalized:
        return 1.0
    score = (n - 1) * (n - 2)
    return float(score if directed else score / 2.0)
