"""Random-walk corpus generation (the Node2Vec front half).

Reference: ``cpp/embedding/Node2Vec.cpp`` + ``BiasedRandomWalk.cpp`` —
walk corpus -> word2vec. The corpus generation is the graph-native part;
we generate **uniform** random walks deterministically (hash-seeded choice
per (walk, step)); the p/q-biased second-order variant and the embedding
training are out of scope (they need the previous step's neighborhood —
doable with one more join — and an SGD loop respectively).

Design: adjacency arrays per node, capped to the ``max_neighbors`` smallest
neighbor ids BEFORE aggregation (a per-src ``row_number`` filter — a hub's
array never exceeds the cap in the agg buffer) and sorted ascending, so the
hash-chosen index maps to the same neighbor under ANY partitioning. Then
``length`` joins: state (walk_id, step, cur) x adjacency -> pick index
``h(walk_id, step) % degree``. ``h`` is a portable LCG mix
(``((walk_id % M) * 1103515245 + step*12345 + seed) % M``, M = 2^31-1):
pure integer arithmetic that an ANSI-SQL oracle replicates exactly (and
never overflows int64 in either engine). Output long format
(walk_id, step, node) — one row per visited node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import truncate_lineage

_M31 = 2147483647


def walk_hash(walk_id_col, step: int, seed: int):
    """Portable per-(walk, step) pseudo-random int in [0, 2^31-1)."""
    wm = F.pmod(walk_id_col, F.lit(_M31))
    return F.pmod(
        wm * F.lit(1103515245) + F.lit(step * 12345 + seed), F.lit(_M31)
    )


def capped_sorted_adjacency(und_edges: DataFrame, max_neighbors: int) -> DataFrame:
    """(src, nbrs array<long> sorted asc, capped to the max_neighbors
    smallest dst ids). Deterministic under any partitioning; the cap runs
    BEFORE collect_list so a 10^7-degree hub never builds a 10^7-element
    aggregation buffer (round-1 verdict fix)."""
    w = Window.partitionBy("src").orderBy("dst")
    return (
        und_edges.select("src", "dst")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_neighbors)
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )


def random_walks(
    und_edges: DataFrame,
    walks_per_node: int = 1,
    length: int = 5,
    seed: int = 42,
    max_neighbors: int = 10_000,
) -> DataFrame:
    """(walk_id, step, node); walk_id = start_node * walks_per_node + r."""
    adj = capped_sorted_adjacency(und_edges, max_neighbors)
    adj = truncate_lineage(adj)
    starts = (
        adj.select(F.col("src").alias("node"))
        .crossJoin(
            und_edges.sparkSession.range(walks_per_node).select(
                F.col("id").alias("r")
            )
        )
        .select(
            (F.col("node") * walks_per_node + F.col("r")).alias("walk_id"),
            F.lit(0).alias("step"),
            F.col("node").alias("cur"),
        )
    )
    out = starts.select("walk_id", "step", F.col("cur").alias("node"))
    frontier = truncate_lineage(starts)
    for step in range(1, length):
        nxt = (
            frontier.join(adj.withColumnRenamed("src", "cur"), "cur")
            .select(
                "walk_id",
                F.lit(step).alias("step"),
                F.element_at(
                    "nbrs",
                    (F.pmod(walk_hash(F.col("walk_id"), step, seed), F.size("nbrs")) + 1).cast("int"),
                ).alias("cur"),
            )
        )
        nxt = truncate_lineage(nxt)
        out = out.unionByName(nxt.select("walk_id", "step", F.col("cur").alias("node")))
        frontier = nxt
    return out


def capped_sorted_adjacency_weighted(
    und_edges: DataFrame, max_neighbors: int
) -> DataFrame:
    """(src, nbrs array<struct<dst, weight>> sorted by dst asc, capped to the
    max_neighbors smallest dst ids before aggregation — same hot-key guard
    as :func:`capped_sorted_adjacency`)."""
    w = Window.partitionBy("src").orderBy("dst")
    return (
        und_edges.select("src", "dst", "weight")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_neighbors)
        .groupBy("src")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dst"), F.col("weight")))
            ).alias("nbrs")
        )
    )


def node2vec_walks(
    und_edges: DataFrame,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    length: int = 5,
    seed: int = 42,
    max_neighbors: int = 100_000,
) -> DataFrame:
    """p/q-biased second-order node2vec walks (the back half of
    ``cpp/embedding/BiasedRandomWalk.cpp:65-99``): from state (t -> v), the
    unnormalized probability of stepping to x is

        w(v,x)/p  if x == t   (return)
        w(v,x)    if x in N(t) (BFS-ish)
        w(v,x)/q  otherwise    (DFS-ish)

    The reference preprocesses one alias table per directed edge (t, v) —
    O(sum_v deg(v)^2) memory, infeasible at web scale. We instead evaluate
    the bias inline per superstep: join the frontier with the adjacency of
    ``cur`` AND ``prev``, build the weight array with JVM higher-order
    functions, and inverse-CDF sample with the portable per-(walk, step)
    hash. Two folds over the (dst-sorted) candidate array — total mass,
    then first index whose inclusive cumsum reaches u*total — make the
    arithmetic order identical to a SQL window cumsum, so fixed-length runs
    are exactly reproducible by the DuckDB oracle.

    First step (no prev yet) is uniform, like the uniform-walk corpus.
    Walks stop early at out-degree-0 nodes (reference shortens the walk).
    Output: (walk_id, step, node).
    """
    adj = capped_sorted_adjacency_weighted(und_edges, max_neighbors)
    adj = truncate_lineage(adj)
    spark = und_edges.sparkSession
    starts = (
        adj.select(F.col("src").alias("node"))
        .crossJoin(spark.range(walks_per_node).select(F.col("id").alias("r")))
        .select(
            (F.col("node") * walks_per_node + F.col("r")).alias("walk_id"),
            F.col("node").alias("cur"),
        )
    )
    out = starts.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))
    if length == 1:
        return out

    # step 1: uniform over nbrs (no previous node yet)
    f1 = starts.join(adj.withColumnRenamed("src", "cur"), "cur").select(
        "walk_id",
        F.col("cur").alias("prev"),
        F.element_at(
            "nbrs",
            (F.pmod(walk_hash(F.col("walk_id"), 1, seed), F.size("nbrs")) + 1).cast(
                "int"
            ),
        )["dst"].alias("cur"),
    )
    frontier = truncate_lineage(f1)
    out = out.unionByName(
        frontier.select("walk_id", F.lit(1).alias("step"), F.col("cur").alias("node"))
    )

    for step in range(2, length):
        j = (
            frontier.join(adj.withColumnRenamed("src", "cur"), "cur")
            .join(
                adj.select(
                    F.col("src").alias("prev"), F.col("nbrs").alias("pnbrs")
                ),
                "prev",
            )
        )
        prev_col = F.col("prev")
        pnbr_ids = F.transform("pnbrs", lambda s: s["dst"])
        weights = F.transform(
            "nbrs",
            lambda s: s["weight"]
            * F.when(s["dst"] == prev_col, F.lit(1.0 / p))
            .when(F.array_contains(pnbr_ids, s["dst"]), F.lit(1.0))
            .otherwise(F.lit(1.0 / q)),
        )
        j = j.withColumn("w_arr", weights)
        total = F.aggregate("w_arr", F.lit(0.0), lambda acc, x: acc + x)
        u = walk_hash(F.col("walk_id"), step, seed).cast("double") / F.lit(
            float(_M31)
        )
        j = j.withColumn("r", u * total)
        zipped = F.zip_with(
            "w_arr",
            F.sequence(F.lit(1), F.size("w_arr")),
            lambda w, i: F.struct(w.alias("w"), i.alias("i")),
        )
        chosen = F.aggregate(
            zipped,
            F.struct(F.lit(0.0).alias("cum"), F.lit(-1).alias("chosen")),
            lambda acc, x: F.struct(
                (acc["cum"] + x["w"]).alias("cum"),
                F.when(acc["chosen"] >= 0, acc["chosen"])
                .when(acc["cum"] + x["w"] >= F.col("r"), x["i"])
                .otherwise(F.lit(-1))
                .alias("chosen"),
            ),
            lambda acc: F.when(acc["chosen"] >= 0, acc["chosen"]).otherwise(
                F.size("w_arr")
            ),
        )
        nxt = j.select(
            "walk_id",
            F.col("cur").alias("prev"),
            F.element_at("nbrs", chosen.cast("int"))["dst"].alias("cur"),
        )
        frontier = truncate_lineage(nxt)
        out = out.unionByName(
            frontier.select(
                "walk_id", F.lit(step).alias("step"), F.col("cur").alias("node")
            )
        )
    return out


def walk_cooccurrences(walks: DataFrame, window: int = 2) -> DataFrame:
    """(a, b, cnt) skip-gram pair counts within +-window on each walk —
    the word2vec training-pair extraction, as one self-join."""
    x = walks.select("walk_id", F.col("step").alias("sa"), F.col("node").alias("a"))
    y = walks.select("walk_id", F.col("step").alias("sb"), F.col("node").alias("b"))
    return (
        x.join(y, "walk_id")
        .filter(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )


def k_path_centrality(
    und_edges: DataFrame,
    nodes: DataFrame,
    k: int = 4,
    t: int = 256,
    seed: int = 7,
    max_neighbors: int = 10_000,
) -> DataFrame:
    """(node, score) — k-path centrality (``KPathCentrality.cpp:33-99``):
    t self-avoiding random walks, each from a random start with random
    length l in [1, k]; score(v) = k * n * visits(v) / t (start nodes are
    marked explored but not counted, matching the reference).

    Deterministic variant: the reference draws its start / length / step
    choices from a global RNG (t = 2k^2 n^{1-2a} ln n trials); here every
    choice is the portable LCG hash of (walk_id, step), so runs are
    reproducible and the whole process unrolls to an ANSI-SQL oracle.
    Self-avoidance carries the visited prefix as an array column filtered
    JVM-side (walk length k is small by construction). Node ids must be
    continuous [0, n)."""
    n = nodes.count()
    adj = capped_sorted_adjacency(und_edges, max_neighbors)
    adj = truncate_lineage(adj)
    spark = und_edges.sparkSession
    walks = spark.range(t).select(F.col("id").alias("walk_id"))
    start = walks.select(
        "walk_id",
        F.pmod(walk_hash(F.col("walk_id"), 0, seed), F.lit(n)).alias("cur"),
        (1 + F.pmod(walk_hash(F.col("walk_id"), 777_777, seed), F.lit(k))).alias("l"),
    ).select("walk_id", "cur", "l", F.array(F.col("cur")).alias("visited"))
    frontier = truncate_lineage(start)
    visit_batches = []
    for j in range(1, k + 1):
        active = frontier.filter(F.lit(j) <= F.col("l"))
        stepped = (
            active.join(adj.withColumnRenamed("src", "cur"), "cur")
            .withColumn(
                "unexplored",
                F.filter(
                    F.col("nbrs"), lambda y: ~F.array_contains(F.col("visited"), y)
                ),
            )
            .filter(F.size("unexplored") > 0)
            .select(
                "walk_id",
                "l",
                "visited",
                F.element_at(
                    "unexplored",
                    (
                        F.pmod(walk_hash(F.col("walk_id"), j, seed), F.size("unexplored"))
                        + 1
                    ).cast("int"),
                ).alias("cur"),
            )
        )
        stepped = truncate_lineage(
            stepped.select(
                "walk_id", "cur", "l", F.concat("visited", F.array("cur")).alias("visited")
            )
        )
        visit_batches.append(stepped.select(F.col("cur").alias("node")))
        frontier = stepped
    if visit_batches:
        visits = visit_batches[0]
        for v in visit_batches[1:]:
            visits = visits.unionByName(v)
    else:
        visits = spark.createDataFrame([], "node long")
    counts = visits.groupBy("node").agg(F.count("*").alias("c"))
    return (
        nodes.select(F.col("id").alias("node"))
        .join(counts, "node", "left")
        .fillna({"c": 0})
        .select(
            "node",
            (F.lit(float(k) * float(n)) * F.col("c") / F.lit(float(t))).alias("score"),
        )
    )
