"""Core decomposition (k-core / coreness).

Reference: ``cpp/centrality/CoreDecomposition.cpp`` (bucket-queue peeling /
ParK algorithm — sequential peeling by current degree; coreness(u) = the
highest k such that u survives in the k-core). Python
``networkit/centrality.pyx:2202``.

Sequential peeling doesn't distribute; the distributed equivalents:

- :func:`k_core` — the k-core *subgraph* by iterated filtering: repeatedly
  drop nodes with degree < k until stable (each round = one degree agg +
  one semi-join; O(peel-depth) rounds).
- :func:`coreness` — all core numbers at once via **h-index iteration**
  (Lü et al., "The H-index of a network node", Nature Comm. 2016 — public
  result): init c(u) = deg(u); iterate
  ``c(u) <- H({c(v) : v in N(u)})`` (the h-index of the neighbor values);
  the fixed point is exactly the coreness. Each round is one shuffle join +
  windowed rank — fully relational and skew-tolerant (rank per dst
  partition). Converges in a few rounds on web-ish graphs; pytest asserts
  the fixed point matches iterated-peeling core numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges


def k_core(und_edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Edges of the k-core of a symmetrized simple graph."""
    e = und_edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select(F.col("node"))
        before = e.count()
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if e.count() == before:
            break
    return e


def _h_index_step(und_edges: DataFrame, core: DataFrame) -> DataFrame:
    """c'(u) = h-index of neighbor core values: the largest h such that at
    least h neighbors have value >= h."""
    # shuffle_hash on the core side: with the edge table persisted
    # pre-partitioned by src (coreness), only the n-row core vector
    # shuffles per h-index round
    nb = und_edges.join(
        core.select(F.col("node").alias("src"), F.col("c").alias("cv")).hint(
            "shuffle_hash"
        ),
        "src",
    ).select(F.col("dst").alias("node"), "cv")
    w = Window.partitionBy("node").orderBy(F.desc("cv"))
    ranked = nb.withColumn("rk", F.row_number().over(w))
    return (
        ranked.filter(F.col("cv") >= F.col("rk"))
        .groupBy("node")
        .agg(F.max("rk").alias("c"))
    )


def coreness(
    und_edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 100,
) -> DataFrame:
    """(node, core) for every node; isolated nodes get core 0."""
    nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
    shuf = int(und_edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    e = und_edges.select("src", "dst").repartition(shuf, "src").persist()
    e.count()
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("c"))
    core = (
        nodes.select(F.col("id").alias("node"))
        .join(deg, "node", "left")
        .fillna({"c": 0})
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        upd = _h_index_step(e, core)
        new = (
            core.join(upd.withColumnRenamed("c", "nc"), "node", "left")
            .select(
                "node",
                F.coalesce(F.col("nc"), F.lit(0)).alias("c"),
                F.col("c").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("c") != F.col("prev")).count()
        core = new.select("node", "c")
        if changed == 0:
            break
    e.unpersist()
    return core.select("node", F.col("c").cast("long").alias("core"))


def coreness_fixed(und_edges: DataFrame, nodes: DataFrame, iterations: int) -> DataFrame:
    """Fixed-iteration h-index propagation (oracle-expressible)."""
    e = und_edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("c"))
    core = (
        nodes.select(F.col("id").alias("node"))
        .join(deg, "node", "left")
        .fillna({"c": 0})
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        upd = _h_index_step(e, core)
        core = (
            core.select("node")
            .join(upd, "node", "left")
            .select("node", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
            .localCheckpoint(eager=True)
        )
    return core.select("node", F.col("c").cast("long").alias("core"))
