"""Maximal (weighted) matching — distributed handshake / local-max.

Reference: ``cpp/matching/`` (``SuitorMatcher``, ``LocalMaxMatcher``,
``PathGrowingMatcher``, ``BMatcher``). The local-max / Suitor idea has a
clean distributed dual (Manne-Bisseling handshake; Preis local-max —
published, public algorithms):

repeat:
  1. every unmatched node points to its heaviest unmatched neighbor
     (ties -> smallest id) — one agg over the live edge table;
  2. mutual pointers (u -> v and v -> u) become matched pairs;
  3. drop all edges incident to matched nodes;
until no edges remain or no new matches.

Produces a maximal matching whose weight is a 1/2-approximation of the
maximum — the same guarantee as the reference's LocalMaxMatcher. Expected
O(log m) rounds; every round is two shuffles (argmax agg + self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import truncate_lineage


def local_max_matching(und_edges: DataFrame, max_rounds: int = 100) -> DataFrame:
    """(u, v, weight) matched pairs with u < v. Input symmetrized."""
    spark = und_edges.sparkSession
    live = truncate_lineage(und_edges.select("src", "dst", "weight"))
    matched = spark.createDataFrame([], "u long, v long, weight double")
    for _ in range(max_rounds):
        if live.isEmpty():
            break
        # heaviest neighbor per node (tie -> smallest partner id)
        pref = (
            live.groupBy("src")
            .agg(
                F.max(
                    F.struct(F.col("weight"), (-F.col("dst")).alias("nd"))
                ).alias("top")
            )
            .select(
                F.col("src").alias("node"),
                (-F.col("top.nd")).alias("partner"),
                F.col("top.weight").alias("w"),
            )
        )
        # mutual handshake: node.partner == partner.node (emit once, u < v)
        other = pref.select(
            F.col("node").alias("partner"), F.col("partner").alias("node")
        )
        pairs = (
            pref.join(other, ["node", "partner"], "left_semi")
            .filter(F.col("node") < F.col("partner"))
            .select(F.col("node").alias("u"), F.col("partner").alias("v"), F.col("w").alias("weight"))
        )
        pairs = truncate_lineage(pairs)
        if pairs.isEmpty():
            break
        matched = truncate_lineage(matched.unionByName(pairs))
        hit = pairs.select(F.col("u").alias("node")).union(pairs.select("v"))
        live = truncate_lineage(
            live.join(hit.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(hit.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
        )
    return matched


def local_max_matching_fixed(und_edges: DataFrame, rounds: int = 6) -> DataFrame:
    """Fixed-round variant of :func:`local_max_matching` — deterministic and
    ANSI-SQL-expressible (the handshake recurrence unrolls to a CTE chain,
    like the fixed-iteration CC/PLP gate variants). Same per-round rule:
    heaviest neighbor, ties -> smallest partner id, mutual pointers match.
    With ``rounds`` >= the convergence round count the result equals the
    converged matching (pytest asserts that on the gate graph)."""
    live = truncate_lineage(und_edges.select("src", "dst", "weight"))
    matched = und_edges.sparkSession.createDataFrame([], "u long, v long, weight double")
    for _ in range(rounds):
        if live.isEmpty():
            break
        pref = (
            live.groupBy("src")
            .agg(F.max(F.struct(F.col("weight"), (-F.col("dst")).alias("nd"))).alias("top"))
            .select(
                F.col("src").alias("node"),
                (-F.col("top.nd")).alias("partner"),
                F.col("top.weight").alias("w"),
            )
        )
        other = pref.select(F.col("node").alias("partner"), F.col("partner").alias("node"))
        pairs = (
            pref.join(other, ["node", "partner"], "left_semi")
            .filter(F.col("node") < F.col("partner"))
            .select(F.col("node").alias("u"), F.col("partner").alias("v"), F.col("w").alias("weight"))
        )
        pairs = truncate_lineage(pairs)
        matched = truncate_lineage(matched.unionByName(pairs))
        hit = pairs.select(F.col("u").alias("node")).union(pairs.select("v"))
        live = truncate_lineage(
            live.join(hit.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(hit.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
        )
    return matched


def matching_weight(matched: DataFrame) -> float:
    row = matched.agg(F.sum("weight")).first()
    return float(row[0] or 0.0)


def is_valid_matching(matched: DataFrame) -> bool:
    """No node appears twice (Matching::isProper analog)."""
    nodes = matched.select(F.col("u").alias("n")).union(matched.select("v"))
    return nodes.count() == nodes.distinct().count()
