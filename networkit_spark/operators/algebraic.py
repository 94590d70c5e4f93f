"""Algebraic distance (``cpp/distance/AlgebraicDistance.cpp:16-146``).

K independent "systems" of per-node loads are initialized uniformly at
random, smoothed ``num_iterations`` times by Jacobi over-relaxation

    load_u <- (1 - omega) * load_u + omega * (sum_{v in N(u)} w(u,v) * load_v)
                                              / wdeg(u)

then min-max normalized per system; the algebraic distance of a node pair is
the p-norm (or max-norm) over systems of the load difference. Structurally
similar nodes (many short connecting paths) end up close.

Spark-first physical design:

- loads live in LONG format ``(node, sys, load)`` — n*K rows with K a small
  constant (reference default 10). Each smoothing superstep is ONE shuffle:
  ``edges ⋈ loads`` on the neighbor id, then ``groupBy(node, sys)`` with
  map-side partial aggregation (the same gather shape as the PageRank
  superstep, so hub skew is collapsed map-side).
- the deterministic init replaces ``Aux::Random::real()`` with the portable
  md5 recipe (``conv(substr(md5(key),1,13),16,10) / 2^52`` — 52 bits, exact
  in a double on both Spark and the DuckDB oracle side), so fixed-iteration
  runs are bit-reproducible and SQL-oracle-checkable.
- normalization is one tiny per-system agg (K rows) broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_NORM = 0  # reference's AlgebraicDistance.hpp MAX_NORM sentinel


def _uniform(col_expr, sys_col, seed: int):
    """Deterministic uniform [0, 1) from (node, sys, seed) — 52-bit md5."""
    key = F.concat_ws("|", F.lit(f"ad{seed}"), col_expr.cast("string"), sys_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )


def uniform_sql(node_expr: str, sys_expr: str, seed: int) -> str:
    """DuckDB-side twin of :func:`_uniform` (for oracle SQL)."""
    key = f"'ad{seed}' || '|' || CAST({node_expr} AS VARCHAR) || '|' || CAST({sys_expr} AS VARCHAR)"
    return f"(('0x' || substr(md5({key}), 1, 13))::BIGINT / {float(1 << 52)!r})"


def algebraic_distance_loads(
    und_edges: DataFrame,
    nodes: DataFrame,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    seed: int = 42,
    normalize: bool = True,
) -> DataFrame:
    """Smoothed (and optionally per-system min-max normalized) loads:
    ``(node, sys, load)``. ``nodes`` must carry column ``id``."""
    if not (0.0 <= omega <= 1.0):
        raise ValueError("omega must be in [0,1]")
    spark = und_edges.sparkSession
    wdeg = und_edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("wdeg")
    )
    sys_df = spark.range(num_systems).select(F.col("id").cast("int").alias("sys"))
    loads = nodes.select(F.col("id").alias("node")).crossJoin(sys_df).select(
        "node", "sys", _uniform(F.col("node"), F.col("sys"), seed).alias("load")
    )
    edges = und_edges.select("src", "dst", "weight")
    for _ in range(num_iterations):
        msgs = (
            edges.join(
                loads.select(F.col("node").alias("dst"), "sys", "load"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "sys")
            .agg(F.sum(F.col("weight") * F.col("load")).alias("acc"))
        )
        loads = (
            loads.join(msgs, ["node", "sys"], "left")
            .join(wdeg, "node", "left")
            .select(
                "node",
                "sys",
                F.when(
                    F.col("acc").isNotNull(),
                    (1.0 - omega) * F.col("load")
                    + omega * F.col("acc") / F.col("wdeg"),
                )
                .otherwise(F.col("load"))  # isolated node: no neighbors
                .alias("load"),
            )
        )
        loads = loads.localCheckpoint(eager=True)
    if normalize:
        # per-system min/max: K rows, broadcast back
        mm = loads.groupBy("sys").agg(
            F.min("load").alias("lo"), F.max("load").alias("hi")
        )
        loads = loads.join(F.broadcast(mm), "sys").select(
            "node",
            "sys",
            ((F.col("load") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("load"),
        )
    return loads


def algebraic_distance_edge_scores(
    und_edges: DataFrame,
    nodes: DataFrame,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    seed: int = 42,
    norm: int = 2,
) -> DataFrame:
    """(src, dst, score) — algebraic distance per (canonical) undirected
    edge: p-norm over systems of |load_u - load_v| (``norm=MAX_NORM`` (0) ->
    max-norm), matching ``AlgebraicDistance::distance`` (:121-143)."""
    loads = algebraic_distance_loads(
        und_edges, nodes, num_systems, num_iterations, omega, seed
    )
    e = und_edges.filter(F.col("src") < F.col("dst")).select("src", "dst")
    joined = (
        e.join(loads.select(F.col("node").alias("src"), "sys", F.col("load").alias("lu")), "src")
        .join(
            loads.select(F.col("node").alias("dst"), "sys", F.col("load").alias("lv")),
            ["dst", "sys"],
        )
        .withColumn("ad", F.abs(F.col("lu") - F.col("lv")))
    )
    if norm == MAX_NORM:
        agg = F.max("ad").alias("score")
    else:
        agg = F.pow(F.sum(F.pow("ad", float(norm))), 1.0 / norm).alias("score")
    out = joined.groupBy("src", "dst").agg(agg)
    return out.select("src", "dst", F.nanvl(F.col("score"), F.lit(0.0)).alias("score"))


def algebraic_distance_pairs(
    und_edges: DataFrame,
    nodes: DataFrame,
    pairs: DataFrame,
    num_systems: int = 10,
    num_iterations: int = 30,
    omega: float = 0.5,
    seed: int = 42,
    norm: int = 2,
) -> DataFrame:
    """AlgebraicDistanceIndex (``linkprediction/AlgebraicDistanceIndex.cpp``):
    the link-prediction form — algebraic distance between ARBITRARY node
    pairs (u, v), raw (un-normalized) loads, p-norm over systems
    (``norm=0`` -> max norm), NaN -> 0 (``:51-73``).

    ``pairs``: (u, v) rows.  One loads table feeds every queried pair —
    two joins, no per-pair work.
    """
    loads = algebraic_distance_loads(
        und_edges, nodes, num_systems, num_iterations, omega, seed,
        normalize=False,
    )
    j = (
        pairs.select("u", "v")
        .join(loads.select(F.col("node").alias("u"), "sys", F.col("load").alias("lu")), "u")
        .join(loads.select(F.col("node").alias("v"), "sys", F.col("load").alias("lv")), ["v", "sys"])
        .withColumn("ad", F.abs(F.col("lu") - F.col("lv")))
    )
    if norm == 0:
        out = j.groupBy("u", "v").agg(F.max("ad").alias("score"))
    else:
        out = j.groupBy("u", "v").agg(
            F.pow(F.sum(F.pow("ad", float(norm))), 1.0 / norm).alias("score")
        )
    return out.select(
        "u", "v", F.when(F.isnan("score"), 0.0).otherwise(F.col("score")).alias("score")
    )
