"""b-matching — distributed b-suitor / local-dominance rounds.

Reference: ``cpp/matching/BSuitorMatcher.cpp`` (Khan et al. b-suitor:
every node proposes to its b heaviest eligible neighbors; mutual proposals
match). The sequential suitor loop has a synchronous distributed dual that
keeps the same fixpoint: per round every node *wants* its top-``cap``
remaining neighbors by weight (ties -> smaller partner id), an edge locks
when both endpoints want it, locked edges decrement the endpoints' remaining
capacities, and saturated nodes drop out. Under distinct weights the result
equals the sequential greedy b-matching (the locally-dominant edge argument
of Preis / Manne-Bisseling, generalized per-capacity) — the same
1/2-approximation guarantee as the reference.

Scale notes: the only per-node construct is the top-``cap`` rank, a
``Window.partitionBy(node)`` whose partition is one node's live neighbor
list — the reference walks the same list per proposal. Everything else is
joins/aggs on the live edge table, which shrinks monotonically; expected
O(log m) rounds like the 1-matching handshake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import truncate_lineage


def b_suitor_matching(
    und_edges: DataFrame,
    b,
    nodes: DataFrame | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """-> matched edges (u, v, weight), u < v, each node in at most ``b``.

    ``und_edges``: canonical undirected rows (src < dst, weight). ``b`` is a
    uniform int or a (node, b) DataFrame (BSuitorMatcher's vector form).
    """
    spark = und_edges.sparkSession
    live = truncate_lineage(und_edges.select("src", "dst", "weight"))
    if isinstance(b, int):
        ends = live.select(F.col("src").alias("node")).union(
            live.select(F.col("dst").alias("node"))
        ).distinct()
        base = nodes.select(F.col("id").alias("node")) if nodes is not None else ends
        caps = base.select("node", F.lit(b).cast("long").alias("cap"))
    else:
        caps = b.select("node", F.col("b").cast("long").alias("cap"))
    caps = truncate_lineage(caps)
    matched = spark.createDataFrame([], "u long, v long, weight double")

    for _ in range(max_rounds):
        if live.isEmpty():
            break
        sym = live.select(
            F.col("src").alias("node"), F.col("dst").alias("partner"), "weight"
        ).union(
            live.select(
                F.col("dst").alias("node"), F.col("src").alias("partner"), "weight"
            )
        )
        w = Window.partitionBy("node").orderBy(F.desc("weight"), F.asc("partner"))
        wanted = (
            sym.join(caps, "node")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("cap"))
            .select("node", "partner", "weight")
        )
        locked = (
            wanted.filter(F.col("node") < F.col("partner"))
            .join(
                wanted.filter(F.col("node") > F.col("partner")).select(
                    F.col("partner").alias("node"), F.col("node").alias("partner")
                ),
                ["node", "partner"],
                "left_semi",
            )
            .select(F.col("node").alias("u"), F.col("partner").alias("v"), "weight")
        )
        locked = truncate_lineage(locked)
        if locked.isEmpty():
            break
        matched = truncate_lineage(matched.unionByName(locked))
        dec = (
            locked.select(F.col("u").alias("node"))
            .union(locked.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        caps = truncate_lineage(
            caps.join(dec, "node", "left")
            .select("node", (F.col("cap") - F.coalesce("d", F.lit(0))).alias("cap"))
        )
        dead = caps.filter(F.col("cap") <= 0).select("node")
        live = truncate_lineage(
            live.join(
                locked.select(F.col("u").alias("src"), F.col("v").alias("dst")),
                ["src", "dst"],
                "left_anti",
            )
            .join(dead.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(dead.withColumnRenamed("node", "dst"), "dst", "left_anti")
        )
    return matched


def b_suitor_oracle_sql(uedges_cte: str, b: int, rounds: int) -> str:
    """Unrolled ANSI-SQL replay of :func:`b_suitor_matching` with uniform
    ``b`` over the canonical doc graph (``rounds`` >= convergence round
    count — extra rounds lock nothing and are no-ops)."""
    parts = [
        f"WITH {uedges_cte}",
        ", live0 AS (SELECT src, dst, weight FROM uedges WHERE src < dst)",
        f", caps0 AS (SELECT doc_id AS node, CAST({b} AS BIGINT) AS cap FROM documents)",
        ", m0 AS (SELECT CAST(NULL AS BIGINT) AS u, CAST(NULL AS BIGINT) AS v,"
        " CAST(NULL AS DOUBLE) AS weight WHERE 1=0)",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f""", sym{k} AS (
  SELECT src AS node, dst AS partner, weight FROM live{p}
  UNION ALL SELECT dst, src, weight FROM live{p}
), want{k} AS (
  SELECT node, partner, weight FROM (
    SELECT s.node, s.partner, s.weight, c.cap,
           row_number() OVER (PARTITION BY s.node ORDER BY s.weight DESC, s.partner ASC) AS rn
    FROM sym{k} s JOIN caps{p} c ON s.node = c.node)
  WHERE rn <= cap
), lock{k} AS MATERIALIZED (
  SELECT a.node AS u, a.partner AS v, a.weight
  FROM want{k} a JOIN want{k} b2 ON a.node = b2.partner AND a.partner = b2.node
  WHERE a.node < a.partner
), m{k} AS MATERIALIZED (SELECT * FROM m{p} UNION ALL SELECT * FROM lock{k}
), caps{k} AS MATERIALIZED (
  SELECT c.node, c.cap - coalesce(d.d, 0) AS cap
  FROM caps{p} c LEFT JOIN (
    SELECT node, count(*) AS d FROM (
      SELECT u AS node FROM lock{k} UNION ALL SELECT v FROM lock{k}) GROUP BY node) d
  ON c.node = d.node
), live{k} AS MATERIALIZED (
  SELECT l.src, l.dst, l.weight FROM live{p} l
  LEFT JOIN lock{k} x ON l.src = x.u AND l.dst = x.v
  JOIN caps{k} cs ON l.src = cs.node
  JOIN caps{k} cd ON l.dst = cd.node
  WHERE x.u IS NULL AND cs.cap > 0 AND cd.cap > 0
)"""
        )
    parts.append(f" SELECT u, v, weight FROM m{rounds}")
    return "\n".join(parts)


def dyn_b_suitor_update(
    matched: DataFrame,
    post_edges: DataFrame,
    b: int,
    w_event: float,
    nodes: DataFrame | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """One edge insertion/removal on a maintained b-matching
    (``matching/DynamicBSuitorMatcher.cpp`` — the reference repairs the
    suitor fixpoint by walking augmenting chains per event).

    Distributed exactness argument instead of pointer chasing: under
    distinct weights the b-suitor fixpoint equals the weight-descending
    greedy, and the greedy's decisions on edges HEAVIER than the event
    weight cannot see the event — so every matched edge with
    ``weight > w_event`` is kept verbatim, remaining capacities are reduced
    accordingly, and the suitor rounds re-run only on the light suffix
    (``weight <= w_event``) of the post-event graph.  Work scales with the
    light suffix: cheap for heavy events, full recompute in the worst case
    (the reference's chains have the same worst case, sequentially).

    ``matched``: (u, v, weight) current matching; ``post_edges``: canonical
    post-event rows.  Distinct weights assumed (as for the static equality
    guarantee).  Returns the new (u, v, weight) matching.
    """
    heavy = matched.filter(F.col("weight") > w_event)
    used = (
        heavy.select(F.col("u").alias("node"))
        .union(heavy.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("used"))
    )
    ends = post_edges.select(F.col("src").alias("node")).union(
        post_edges.select(F.col("dst").alias("node"))
    ).distinct()
    base = nodes.select(F.col("id").alias("node")) if nodes is not None else ends
    caps = (
        base.join(used, "node", "left")
        .select(
            "node",
            F.greatest(
                F.lit(0), F.lit(b) - F.coalesce("used", F.lit(0))
            ).cast("long").alias("b"),
        )
    )
    light = post_edges.filter(F.col("weight") <= w_event)
    redo = b_suitor_matching(light, caps, max_rounds=max_rounds)
    return heavy.unionByName(redo)
