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
from networkit_spark.operators.triangles import triangle_counts


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
    need_tri = "lcc" in measures or "triangles" in measures
    if "degree" in measures or "lcc" in measures:
        out = out.join(deg, "node", "left").fillna({"degree": 0})
    if need_tri:
        # ONE triangle enumeration serves both the count column and lcc —
        # lcc is the closed form 2*tri/(d(d-1)) over columns already here,
        # not a second wedge join (at crawl scale the wedge join dominates
        # the whole profile; never run it twice)
        tri = triangle_counts(und_edges, nodes)
        out = out.join(tri, "node", "left").fillna({"triangles": 0})
    if "lcc" in measures:
        d = F.col("degree")
        out = out.withColumn(
            "lcc",
            F.when(d >= 2, 2.0 * F.col("triangles") / (d * (d - 1))).otherwise(F.lit(0.0)),
        )
        if "degree" not in measures:
            out = out.drop("degree")
        if "triangles" not in measures:
            out = out.drop("triangles")
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
    # ONE aggregate pass computes every measure's battery (a per-measure
    # agg + union would scan the measure table len(measures) times at crawl
    # scale); the single stat row then explodes to long format driver-free
    aggs = []
    for m in measures:
        c = F.col(m).cast("double")
        aggs.extend([
            F.count(c).alias(f"{m}__n"),
            F.round(F.min(c), 7).alias(f"{m}__min"),
            F.round(F.max(c), 7).alias(f"{m}__max"),
            F.round(F.avg(c), 7).alias(f"{m}__mean"),
            F.round(F.stddev_samp(c), 7).alias(f"{m}__stddev"),
            F.round(F.expr(f"percentile(CAST({m} AS DOUBLE), 0.5)"), 7).alias(f"{m}__median"),
            F.round(F.expr(f"percentile(CAST({m} AS DOUBLE), 0.25)"), 7).alias(f"{m}__q1"),
            F.round(F.expr(f"percentile(CAST({m} AS DOUBLE), 0.75)"), 7).alias(f"{m}__q3"),
        ])
    row = mt.agg(*aggs)
    structs = [
        F.struct(
            F.lit(m).alias("measure"),
            F.col(f"{m}__n").alias("n"),
            *[F.col(f"{m}__{s}").alias(s)
              for s in ("min", "max", "mean", "stddev", "median", "q1", "q3")],
        )
        for m in measures
    ]
    return row.select(F.explode(F.array(*structs)).alias("x")).select("x.*")


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
    # long format via explode — per-pair selects + union would re-plan the
    # ranked lineage once per pair
    structs = [
        F.struct(
            F.lit(a).alias("m1"),
            F.lit(b).alias("m2"),
            F.col(f"p_{a}__{b}").alias("pearson"),
            F.col(f"s_{a}__{b}").alias("spearman"),
        )
        for a, b in pairs
    ]
    return row.select(F.explode(F.array(*structs)).alias("x")).select("x.*")


def measure_histogram(mt: DataFrame, measure: str, bins: int = 10) -> DataFrame:
    """Equal-width histogram of one measure (Profile's per-measure histogram
    panel). Two passes: one min/max agg, one binned count; bin edges are
    [min + i*w, min + (i+1)*w), last bin closed. Returns
    (measure, bin, lo, hi, count)."""
    c = F.col(measure).cast("double")
    row = mt.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).first()
    lo, hi = float(row["lo"] or 0.0), float(row["hi"] or 0.0)
    if hi <= lo:
        return mt.agg(F.count(c).alias("count")).select(
            F.lit(measure).alias("measure"), F.lit(0).alias("bin"),
            F.lit(lo).alias("lo"), F.lit(hi).alias("hi"), "count",
        )
    w = (hi - lo) / bins
    b = F.least(F.lit(bins - 1), F.floor((c - F.lit(lo)) / F.lit(w))).cast("int")
    return (
        mt.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("count"))
        .select(
            F.lit(measure).alias("measure"),
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("hi"),
            "count",
        )
    )


def profile(
    und_edges: DataFrame,
    nodes: DataFrame,
    measures: tuple[str, ...] = ("degree", "lcc", "triangles"),
    histogram_bins: int = 10,
) -> dict:
    """One-call Profile.create analog: returns the numbers the reference's
    HTML report renders — {'measures': wide per-node table, 'stats': long
    stat battery, 'correlations': Pearson/Spearman pairs, 'histograms':
    binned counts per measure} — all as DataFrames (mt is persisted; caller
    unpersists)."""
    mt = node_measures(und_edges, nodes, measures).persist()
    mt.count()
    hists = measure_histogram(mt, measures[0], histogram_bins)
    for m in measures[1:]:
        hists = hists.unionByName(measure_histogram(mt, m, histogram_bins))
    return {
        "measures": mt,
        "stats": measure_stats(mt, measures),
        "correlations": measure_correlations(mt, measures),
        "histograms": hists,
    }
