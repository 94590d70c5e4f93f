"""Edge scores + sparsification filters.

Reference: ``networkit/sparsification.pyx:26-1387`` + ``cpp/edgescores/`` /
``cpp/sparsification/``. The whole module family reduces to *compute an edge
score column, then filter by (possibly rank-normalized) threshold*:

- ``TriangleEdgeScore`` -> operators.triangles.triangle_edge_score
- ``RandomEdgeScore`` (:432)      -> :func:`random_edge_score` (seeded hash)
- ``LocalDegreeScore`` (:516)     -> :func:`local_degree_score`
- ``PrefixJaccardScore`` (:386) / per-edge Jaccard -> :func:`jaccard_edge_score`
- ``EdgeScoreNormalizer`` (:196)  -> :func:`normalize_scores` (min-max)
- ``EdgeScoreLinearizer`` (:165)  -> :func:`linearize_scores` (rank/percentile)
- ``GlobalThresholdFilter`` (:664)-> :func:`global_threshold_filter`
- ``LocalFilterScore`` (:573, "local adaptive filtering" — keep the top
  ``ceil(deg^alpha)`` edges per node) -> :func:`local_filter_sparsify`

Edge keys are canonical (src < dst) for undirected scores; filters return
the surviving symmetrized edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(und_edges: DataFrame) -> DataFrame:
    return und_edges.filter(F.col("src") < F.col("dst"))


def random_edge_score(und_edges: DataFrame, seed: int = 42) -> DataFrame:
    """(src, dst, score) uniform [0,1) deterministic per edge."""
    e = _canon(und_edges)
    h = F.xxhash64("src", "dst", F.lit(seed))
    return e.select(
        "src", "dst", ((F.abs(h) % 1_000_000_007) / 1_000_000_007.0).alias("score")
    )


def local_degree_score(und_edges: DataFrame) -> DataFrame:
    """LocalDegreeScore.cpp semantics shape: for edge (u, v), rank v among
    u's neighbors by degree (desc); score = 1 - log(rank)/log(deg(u));
    edge keeps the max over both directions. Preserves local hub structure
    ("local degree" backbone)."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.select("src", "dst")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
    )
    w = Window.partitionBy("src").orderBy(F.desc("dd"), F.asc("dst"))
    ranked = e.withColumn("rk", F.row_number().over(w))
    directed_score = ranked.select(
        "src",
        "dst",
        F.when(F.col("ds") > 1, 1.0 - F.log(F.col("rk").cast("double")) / F.log(F.col("ds").cast("double")))
        .otherwise(1.0)
        .alias("s"),
    )
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        directed_score.select(u, v, "s")
        .groupBy("u", "v")
        .agg(F.max("s").alias("score"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "score")
    )


def jaccard_edge_score(und_edges: DataFrame) -> DataFrame:
    """Per-edge Jaccard of endpoint neighborhoods (SimilarityScore family)."""
    from networkit_spark.operators.linkprediction import link_prediction_scores

    pairs = _canon(und_edges).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    scores = link_prediction_scores(und_edges, pairs=pairs)
    return scores.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("jaccard").alias("score")
    )


def normalize_scores(scores: DataFrame, invert: bool = False) -> DataFrame:
    """Min-max to [0,1] (EdgeScoreNormalizer)."""
    row = scores.agg(F.min("score"), F.max("score")).first()
    lo, hi = row[0], row[1]
    span = (hi - lo) or 1.0
    norm = (F.col("score") - lo) / span
    return scores.withColumn("score", (1.0 - norm) if invert else norm)


def linearize_scores(scores: DataFrame) -> DataFrame:
    """Replace scores by their percentile rank (EdgeScoreLinearizer).

    Distributed: rank each distinct score via the range-sort dense-id
    utility (no single-partition window), then join back; percentile of an
    edge = rank(first edge with that score) / (m - 1), matching
    ``percent_rank`` tie semantics.
    """
    from networkit_spark.plans.ids import global_min_rank

    m = scores.count()
    if m <= 1:
        return scores.withColumn("score", F.lit(0.0))
    ranked = global_min_rank(scores, "score", rank_col="_grk")
    return ranked.withColumn(
        "score", (F.col("_grk") - 1) / F.lit(float(m - 1))
    ).drop("_grk")


def global_threshold_filter(
    und_edges: DataFrame, scores: DataFrame, threshold: float, above: bool = True
) -> DataFrame:
    """Keep edges with score >= threshold (or <=). Returns symmetrized table.
    Ref: ``GlobalThresholdFilter`` (sparsification.pyx:664)."""
    cond = F.col("score") >= threshold if above else F.col("score") <= threshold
    keep = scores.filter(cond).select("src", "dst")
    canon = _canon(und_edges).join(keep, ["src", "dst"], "left_semi")
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def local_filter_sparsify(und_edges: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Keep each node's top ``ceil(deg^alpha)`` incident edges by degree of
    the other endpoint (LocalFilterScore / "local sparsification" shape);
    an edge survives if either endpoint keeps it."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.select("src", "dst", "weight")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    w = Window.partitionBy("src").orderBy(F.desc("dd"), F.asc("dst"))
    kept = (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.ceil(F.pow(F.col("ds"), F.lit(alpha))))
        .select("src", "dst", "weight")
    )
    u = F.least("src", "dst").alias("src")
    v = F.greatest("src", "dst").alias("dst")
    canon = kept.select(u, v, "weight").distinct()
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
