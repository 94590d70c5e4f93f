"""Profiling query registrations — ``networkit.profiling.Profile`` numbers
(per-measure descriptive stats + measure correlation matrix) over the
deterministic documents-derived graph, each with an exact DuckDB oracle.
"""

from __future__ import annotations

from networkit_spark.entry_queries import register
from networkit_spark.entry_queries_graph import TRI_CTE, _n_docs
from networkit_spark.graph import nodes_range
from networkit_spark.profiling import (
    measure_correlations,
    measure_stats,
    node_measures,
)
from networkit_spark.testgraph import doc_edges_undirected

_MEASURES = ("degree", "lcc", "triangles")

# shared oracle CTE: the wide per-node measure table (degree / lcc /
# triangle count, isolated nodes zero-filled) — same semantics as
# profiling.node_measures
_MT_CTE = f"""{TRI_CTE},
corners AS (
    SELECT ta AS node FROM tri UNION ALL SELECT tb FROM tri UNION ALL SELECT tc FROM tri
),
tcnt AS (SELECT node, count(*) AS c FROM corners GROUP BY node),
mt AS (
    SELECT d.doc_id AS node,
           CAST(coalesce(u.d, 0) AS DOUBLE) AS degree,
           CASE WHEN coalesce(u.d, 0) >= 2
                THEN CAST(2.0 AS DOUBLE) * coalesce(t.c, 0) / (u.d * (u.d - 1))
                ELSE CAST(0.0 AS DOUBLE) END AS lcc,
           CAST(coalesce(t.c, 0) AS DOUBLE) AS triangles
    FROM documents d
    LEFT JOIN udeg u ON d.doc_id = u.node
    LEFT JOIN tcnt t ON d.doc_id = t.node
)"""

_STATS_SELECT = " UNION ALL ".join(
    f"""SELECT '{m}' AS measure, count({m}) AS n,
       round(min({m}), 7) AS min, round(max({m}), 7) AS max,
       round(avg({m}), 7) AS mean, round(stddev_samp({m}), 7) AS stddev,
       round(quantile_cont({m}, 0.5), 7) AS median,
       round(quantile_cont({m}, 0.25), 7) AS q1,
       round(quantile_cont({m}, 0.75), 7) AS q3
    FROM mt"""
    for m in _MEASURES
)


@register("profile_stats", f"WITH {_MT_CTE}\n{_STATS_SELECT}")
def q_profile_stats(spark, sf_dir):
    """Profile's per-measure stat battery (profiling/stat.py) — exact
    min/max/mean/sample-stddev/quartiles per measure, long format."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    mt = node_measures(e, nodes_range(spark, n), _MEASURES)
    return measure_stats(mt, _MEASURES)


_PAIRS = [
    (a, b) for i, a in enumerate(_MEASURES) for b in _MEASURES[i + 1:]
]

# Spearman oracle: average (fractional, tie-aware) ranks via
# rank() + (tie_count - 1)/2 — equals the cumulative-preceding + (c+1)/2
# recipe the Spark implementation uses over distinct values
_RANKED_CTE = """,
ranked AS (
    SELECT *,
""" + ",\n".join(
    f"           rank() OVER (ORDER BY {m}) + (count(*) OVER (PARTITION BY {m}) - 1) / 2.0 AS {m}_rank"
    for m in _MEASURES
) + """
    FROM mt
)"""

_CORR_SELECT = " UNION ALL ".join(
    f"""SELECT '{a}' AS m1, '{b}' AS m2,
       round(corr({a}, {b}), 7) AS pearson,
       round(corr({a}_rank, {b}_rank), 7) AS spearman
    FROM ranked"""
    for a, b in _PAIRS
)


@register("profile_corr", f"WITH {_MT_CTE}{_RANKED_CTE}\n{_CORR_SELECT}")
def q_profile_corr(spark, sf_dir):
    """Profile's correlation heatmap numbers — Pearson + Spearman per
    measure pair (Spearman = Pearson over tie-averaged ranks)."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    mt = node_measures(e, nodes_range(spark, n), _MEASURES)
    return measure_correlations(mt, _MEASURES)
