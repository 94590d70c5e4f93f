"""Distribution statistics + ranking helpers (reference ``stats.pyx`` /
``centrality.pyx`` module functions).

- :func:`gini` — reference ``stats.pyx:16`` (``gini(values)``): Gini
  coefficient of a value distribution. The reference's sorted cumulative
  trapezoid form reduces algebraically to
  ``2*sum(j*x_j)/(n*sum(x)) - (n+1)/n`` with ``j`` the 1-based ascending
  rank, which is what we compute distributedly: the rank comes from the
  range-sort + per-partition-offset plan (:func:`plans.ids.dense_ids`),
  never a single-partition global window. Ties may receive ranks in any
  order — the sum is invariant because tied values are equal.
- :func:`rank_per_node` — reference ``centrality.pyx:2691``
  (``rankPerNode``): 0-based position in the score-descending ranking,
  ties sharing the rank of the first equal-score entry == SQL
  ``RANK() OVER (ORDER BY score DESC) - 1``, computed via
  :func:`plans.ids.global_min_rank` on the negated score.
- :func:`relative_rank_errors` — reference ``centrality.pyx:2720``:
  per-node ``(rank_x+1)/(rank_y+1)``; returns an empty frame when the two
  rankings cover different node sets (the reference returns ``[]`` on
  length mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.ids import dense_ids, global_min_rank


def gini(values: DataFrame, value_col: str) -> float:
    """Gini coefficient of ``values[value_col]`` (non-negative values)."""
    ranked = dense_ids(values.select(value_col), value_col, id_col="_j", distinct=False)
    row = ranked.agg(
        F.sum((F.col("_j") + 1) * F.col(value_col)).alias("jx"),
        F.sum(value_col).alias("s"),
        F.count("*").alias("n"),
    ).first()
    n, s = int(row["n"]), float(row["s"] or 0.0)
    if n == 0 or s == 0.0:
        return 0.0
    return 2.0 * float(row["jx"]) / (n * s) - (n + 1.0) / n


def rank_per_node(
    ranking: DataFrame, node_col: str = "node", score_col: str = "score"
) -> DataFrame:
    """(node, rank) — 0-based min-rank in the score-descending order."""
    neg = ranking.select(
        F.col(node_col).alias("node"), (-F.col(score_col)).alias("_negscore")
    )
    return global_min_rank(neg, "_negscore", rank_col="_rk").select(
        "node", (F.col("_rk") - 1).cast("long").alias("rank")
    )


def relative_rank_errors(
    rx: DataFrame,
    ry: DataFrame,
    node_col: str = "node",
    score_col: str = "score",
) -> DataFrame:
    """(node, error) with error = (rank_x(u)+1)/(rank_y(u)+1)."""
    kx = rank_per_node(rx, node_col, score_col).withColumnRenamed("rank", "_rx")
    ky = rank_per_node(ry, node_col, score_col).withColumnRenamed("rank", "_ry")
    if rx.count() != ry.count():
        return rx.sparkSession.createDataFrame([], "node long, error double")
    return kx.join(ky, "node").select(
        "node",
        ((F.col("_rx") + 1) / (F.col("_ry") + 1)).cast("double").alias("error"),
    )


def rank_attribute(
    df: DataFrame,
    id_col: str,
    value_col: str,
    reverse: bool = False,
) -> DataFrame:
    """``getRankAttribute`` (sparsification.pyx:972): (id, rank) with
    rank = 0-based position under value-ascending order (descending when
    ``reverse``); ties broken by id — the distributed analog of the
    reference's stable sort by original index. Uses the range-sort rank,
    no global window."""
    v = F.col(value_col)
    key = F.struct(
        (-v if reverse else v).alias("v"), F.col(id_col).alias("i")
    )
    rows = df.select(F.col(id_col).alias("_id"), key.alias("_key"))
    ranked = global_min_rank(rows, "_key", rank_col="_rk")
    return ranked.select(
        F.col("_id").alias(id_col), (F.col("_rk") - 1).cast("long").alias("rank")
    )


def fractional_ranks(
    df: DataFrame, id_col: str, value_col: str
) -> DataFrame:
    """``helpers.ranked`` (helpers.pyx:19): fractional (average-tie)
    1-based ranks — (id, frank) with frank = min_rank + (ties - 1)/2.

    Distributed as min-rank via the range-sort plan (no global window) plus
    one tie-count aggregation joined back on the value."""
    rows = df.select(F.col(id_col).alias("_id"), F.col(value_col).alias("_v"))
    mr = global_min_rank(rows, "_v", rank_col="_rk")
    ties = rows.groupBy("_v").agg(F.count("*").alias("_ties"))
    return mr.join(ties, "_v").select(
        F.col("_id").alias(id_col),
        (F.col("_rk") + (F.col("_ties") - 1) / 2.0).cast("double").alias("frank"),
    )
