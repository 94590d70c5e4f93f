"""ComplexPathAlgorithm (complex-contagion spread and path lengths).

Reference: ``cpp/centrality/ComplexPaths.cpp`` (Guilbeault & Centola,
Nat Commun 12, 4430 (2021)). Semantics:

- single-node mode: seed + (threshold-1) helper seeds activate; the
  "complex graph" starts with the seeds' full neighborhoods; then
  synchronous rounds — influence(x) = degree of x in the complex graph
  (snapshot at round start, ``ComplexPaths.cpp:146-168``: influences are
  recomputed only after a full pass); any node with influence >= threshold
  activates and contributes its full-graph edges; repeat until no new
  activation.
- all-nodes mode (PLci): for every node u, build its complex graph and
  score u with ``sum(BFS distances from u inside the complex graph) / n``
  (unreachable -> 0), optionally min-max normalized.

Distributed shape: the reference runs n INDEPENDENT sequential builds
(parallelForNodes). Here every build is one instance of a (sid,
node)-keyed synchronous loop, so ALL seeds advance together — per round
one join against the full edge table + one degree aggregation, exactly
the multi-source-BFS batching pattern; the per-sid complex graphs live in
one (sid, src, dst) DataFrame.

Determinism divergence (documented, like gce's tie rule): helper seeds
are the (threshold-1) smallest-id neighbors (distance-2 smallest ids when
neighbors run short) instead of the reference's ``std::sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage


def _pick_seeds(sym: DataFrame, seed_df: DataFrame, threshold: int) -> DataFrame:
    """(sid, node) helper-seed table: per sid the (threshold-1) smallest-id
    neighbors, topped up with smallest-id distance-2 nodes when short
    (``generateSeeds``, ComplexPaths.cpp:89-123)."""
    need = threshold - 1
    base = seed_df.select(F.col("sid"), F.col("sid").alias("node"))
    if need <= 0:
        return base
    nb = (
        seed_df.join(sym.withColumnRenamed("src", "sid"), "sid")
        .select("sid", F.col("dst").alias("node"))
        .withColumn("rk", F.row_number().over(Window.partitionBy("sid").orderBy("node")))
        .filter(F.col("rk") <= need)
        .drop("rk")
    )
    have = nb.groupBy("sid").agg(F.count("*").alias("c"))
    short = have.filter(F.col("c") < need).select("sid", (F.lit(need) - F.col("c")).alias("more"))
    if short.isEmpty():
        return base.unionByName(nb)
    ind = (
        short.join(sym.withColumnRenamed("src", "sid"), "sid")
        .select("sid", "more", F.col("dst").alias("mid"))
        .join(sym.select(F.col("src").alias("mid"), F.col("dst").alias("node")), "mid")
        .filter(F.col("node") != F.col("sid"))
        .join(nb, ["sid", "node"], "left_anti")
        .select("sid", "more", "node")
        .distinct()
        .withColumn("rk", F.row_number().over(Window.partitionBy("sid").orderBy("node")))
        .filter(F.col("rk") <= F.col("more"))
        .select("sid", "node")
    )
    return base.unionByName(nb).unionByName(ind)


def complex_path_graphs(
    edges: DataFrame,
    seeds: DataFrame,
    threshold: int = 3,
    max_rounds: int = 100,
) -> tuple[DataFrame, DataFrame]:
    """Batched complex-contagion builds, one per seed in ``seeds`` (id).

    Returns (complex_edges(sid, src, dst) canonical src < dst,
    adopters(sid, node, round) — round 0 = seeds). ``max_rounds`` caps the
    synchronous spread loop (set small for fixed-round oracle twins)."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        sym = (
            edges.select("src", "dst")
            .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        sym.count()
        seed_df = seeds.select(F.col("id").alias("sid"))
        activated = truncate_lineage(
            _pick_seeds(sym, seed_df, threshold)
            .distinct()
            .withColumn("round", F.lit(0))
        )
        # complex graph: edges of every activated node (canonical, dedup)
        def edges_of(nodes_df):
            raw = nodes_df.select("sid", F.col("node").alias("src")).join(sym, "src")
            return raw.select(
                "sid",
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ).distinct()

        cg = truncate_lineage(edges_of(activated))
        for rnd in range(1, max_rounds + 1):
            infl = (
                cg.select("sid", F.col("src").alias("node"))
                .union(cg.select("sid", F.col("dst").alias("node")))
                .groupBy("sid", "node")
                .agg(F.count("*").alias("deg"))
                .filter(F.col("deg") >= threshold)
                .select("sid", "node")
            )
            fresh = infl.join(activated.select("sid", "node"), ["sid", "node"], "left_anti")
            fresh = truncate_lineage(fresh)
            if fresh.isEmpty():
                break
            activated = truncate_lineage(
                activated.unionByName(fresh.withColumn("round", F.lit(rnd)))
            )
            cg = truncate_lineage(cg.unionByName(edges_of(fresh)).distinct())
        sym.unpersist()
        return cg, activated


def complex_path_lengths(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    threshold: int = 3,
    normalize: bool = False,
    max_rounds: int = 100,
) -> DataFrame:
    """All-nodes PLci (``complexPathLength``): one batched build for every
    node as seed, then one batched multi-source BFS inside the per-sid
    complex graphs; PLci(u) = sum(dist)/n (unreachable = 0). Returns
    (node, plci)."""
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    n = nodes.count()
    cg, _ = complex_path_graphs(edges, nodes.select("id"), threshold, max_rounds)
    cg = cg.persist()
    cg.count()
    sym = cg.select("sid", "src", "dst").union(
        cg.select("sid", F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # per-sid BFS from sid inside its own complex graph, all sids together
    dist = truncate_lineage(
        nodes.select(F.col("id").alias("sid"), F.col("id").alias("node"))
        .withColumn("dist", F.lit(0))
    )
    frontier = dist
    while True:
        nxt = (
            sym.join(frontier.withColumnRenamed("node", "src"), ["sid", "src"])
            .select("sid", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .join(dist.select("sid", "node"), ["sid", "node"], "left_anti")
            .groupBy("sid", "node")
            .agg(F.min("dist").alias("dist"))
        )
        nxt = truncate_lineage(nxt)
        if nxt.isEmpty():
            break
        dist = truncate_lineage(dist.unionByName(nxt))
        frontier = nxt
    plci = (
        dist.groupBy(F.col("sid").alias("node"))
        .agg((F.sum("dist") / F.lit(float(n))).alias("plci"))
    )
    out = (
        nodes.select(F.col("id").alias("node"))
        .join(plci, "node", "left")
        .select("node", F.coalesce("plci", F.lit(0.0)).alias("plci"))
    )
    cg.unpersist()
    if normalize:
        row = out.agg(F.min("plci"), F.max("plci")).first()
        lo, hi = row[0], row[1]
        span = (hi - lo) or 1.0
        out = out.select("node", ((F.col("plci") - lo) / span).alias("plci"))
    return out
