"""Graph profiling — ``networkit.profiling.Profile`` parity, Spark-first.

Reference: ``networkit/profiling/profiling.py`` (Profile.create:363-480,
Stat computation in stat.py) — for a graph it assembles a battery of
per-node measures (degree, coreness, local clustering, centralities),
per-measure descriptive statistics (min/max/mean/stddev/quartiles) and a
measure-vs-measure Spearman correlation matrix, rendered as an HTML report.

This module produces the same NUMBERS as DataFrames (the presentation/HTML
layer is out of scope): the measure table is one wide DataFrame assembled by
joining the existing distributed operators on ``node``; stats are exact
built-in aggregates (one pass per measure batch, ``percentile`` not
``percentile_approx`` so the DuckDB oracle matches bit-for-bit); Spearman is
Pearson over average-rank-transformed columns, with ranks computed
distributedly (groupBy value -> per-distinct-value average rank via a
cumulative window over the DISTINCT values only — the window's single task
scales with the number of distinct measure values, not with n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.operators.kcore import coreness
from networkit_spark.operators.pagerank import pagerank_fixed
from networkit_spark.operators.triangles import (
    local_clustering_coefficient,
    triangle_counts,
)


def node_measures(
    und_edges: DataFrame,
    nodes: DataFrame,
    measures: tuple[str, ...] = ("degree", "lcc", "triangles"),
) -> DataFrame:
    """Wide per-node measure table: one column per requested measure.

    ``und_edges`` is a symmetrized undirected edge table (both orientations
    present). Supported measures: degree, lcc, triangles, coreness,
    pagerank. Missing nodes (isolated) get 0 for every measure.
    """
    out = nodes.select(F.col("id").alias("node"))
    deg = und_edges.groupBy("src").agg(F.count("*").alias("degree")).withColumnRenamed("src", "node")
    if "degree" in measures:
        out = out.join(deg, "node", "left").fillna({"degree": 0})
    if "lcc" in measures:
        out = out.join(local_clustering_coefficient(und_edges, nodes), "node", "left").fillna({"lcc": 0.0})
    if "triangles" in measures:
        tri = triangle_counts(und_edges, nodes).withColumnRenamed("triangles", "triangles")
        out = out.join(tri, "node", "left").fillna({"triangles": 0})
    if "coreness" in measures:
        out = out.join(coreness(und_edges, nodes), "node", "left").fillna({"core": 0}).withColumnRenamed("core", "coreness")
    if "pagerank" in measures:
        pr = pagerank_fixed(und_edges, nodes, iterations=10).withColumnRenamed("score", "pagerank")
        out = out.join(pr, "node", "left").fillna({"pagerank": 0.0})
    return out


def measure_stats(mt: DataFrame, measures: tuple[str, ...]) -> DataFrame:
    """Long-format exact descriptive statistics, one row per measure.

    Columns: measure, n, min, max, mean, stddev, median, q1, q3 — the same
    battery Profile's stat.py computes per measure. EXACT percentiles
    (single ordered pass per measure inside one aggregate; DuckDB's
    quantile_cont twin matches bit-for-bit for the linear-interpolation
    definition both engines share).
    """
    pieces = []
    for m in measures:
        c = F.col(m).cast("double")
        agg = (
            mt.agg(
                F.count(c).alias("n"),
                F.round(F.min(c), 7).alias("min"),
                F.round(F.max(c), 7).alias("max"),
                F.round(F.avg(c), 7).alias("mean"),
                F.round(F.stddev_samp(c), 7).alias("stddev"),
                F.round(F.expr(f"percentile(CAST({m} AS DOUBLE), 0.5)"), 7).alias("median"),
                F.round(F.expr(f"percentile(CAST({m} AS DOUBLE), 0.25)"), 7).alias("q1"),
                F.round(F.expr(f"percentile(CAST({m} AS DOUBLE), 0.75)"), 7).alias("q3"),
            )
        )
        pieces.append(agg.select(F.lit(m).alias("measure"), "*"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _avg_rank_col(mt: DataFrame, m: str) -> DataFrame:
    """Average (fractional) rank of each row's ``m`` value — the tie-aware
    rank Spearman needs. Distributed recipe: per-distinct-value counts, then
    a cumulative window over the distinct values ONLY (task size = #distinct
    values), then a broadcast-friendly join back."""
    vc = mt.groupBy(F.col(m).alias("v")).agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranks = vc.select(
        "v",
        (F.coalesce(F.sum("c").over(w), F.lit(0)) + (F.col("c") + 1) / 2.0).alias(f"{m}_rank"),
    )
    return mt.join(ranks.withColumnRenamed("v", m), m, "left")


def measure_correlations(
    mt: DataFrame, measures: tuple[str, ...]
) -> DataFrame:
    """Pairwise Pearson + Spearman correlation rows (m1 < m2 lexicographic).

    Profile renders this as its correlation heatmap; Spearman = Pearson on
    average-ranked values (exact under ties).
    """
    ranked = mt
    for m in measures:
        ranked = _avg_rank_col(ranked, m)
    aggs = []
    pairs = [
        (a, b)
        for i, a in enumerate(measures)
        for b in measures[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(F.round(F.corr(F.col(a).cast("double"), F.col(b).cast("double")), 7).alias(f"p_{a}__{b}"))
        aggs.append(F.round(F.corr(f"{a}_rank", f"{b}_rank"), 7).alias(f"s_{a}__{b}"))
    row = ranked.agg(*aggs)
    # long format: one row per pair
    selects = []
    for a, b in pairs:
        selects.append(
            row.select(
                F.lit(a).alias("m1"),
                F.lit(b).alias("m2"),
                F.col(f"p_{a}__{b}").alias("pearson"),
                F.col(f"s_{a}__{b}").alias("spearman"),
            )
        )
    out = selects[0]
    for s in selects[1:]:
        out = out.unionByName(s)
    return out
