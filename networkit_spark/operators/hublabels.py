"""Pruned landmark labeling (2-hop hub labels) — exact distance oracle.

Reference: ``cpp/distance/PrunedLandmarkLabeling.cpp`` (Akiba-Iwata-Yoshida):
BFS from every node in degree order, pruning any visit (h, x, d) for which
hubs processed earlier already certify ``query(h, x) <= d``; the surviving
entries form 2-hop labels answering every distance query exactly as
``min over common hubs h of d(h,u) + d(h,v)``.

Distributed variant (batched): landmarks are processed in degree-order
*batches*; every batch runs ONE shared multi-source BFS wave, and pruning
tests against the labels of all *earlier* batches (not batch-mates). The
label set is therefore a superset of the sequential algorithm's — pruning
only ever removes entries that an earlier hub already covers, so the 2-hop
cover property (and exact queries) is preserved while the driver loop
shrinks from n sequential BFS runs to n/batch waves of cluster-wide work.
``batch=1`` reproduces sequential PLL exactly.

Scale notes: the per-round prune is two joins against the accumulated label
table, partitioned by hub/node — proportional to the frontier, not the
graph. Labels grow as the intrinsic output (the whole point of PLL is that
this is far below n² on real web graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.ids import dense_ids


def pll_order(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, rank) — the degree-descending hub processing order (ties by
    node id), shared by the static builder and the dynamic updater (the
    reference keeps ``nodesSortedByDegreeDesc`` from construction)."""
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    ranked = nodes.select(F.col("id").alias("node")).join(deg, "node", "left").fillna(
        {"d": 0}
    )
    return dense_ids(
        ranked.select(F.struct((-F.col("d")).alias("nd"), "node").alias("_k")),
        "_k",
        id_col="rank",
        distinct=False,
    ).select(F.col("_k.node").alias("node"), "rank")


def pruned_landmark_labels(
    edges: DataFrame,
    nodes: DataFrame,
    batch: int = 64,
    max_rounds: int = 10_000,
) -> DataFrame:
    """-> labels (hub, node, dist) over an undirected graph given as
    symmetrized or canonical rows (symmetrized internally)."""
    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    e.count()
    order = pll_order(e, nodes)
    n = order.count()
    labels = spark.createDataFrame([], "hub long, node long, dist long")

    for lo in range(0, n, batch):
        hubs = order.filter(
            (F.col("rank") >= lo) & (F.col("rank") < lo + batch)
        ).select(F.col("node").alias("hub"))
        settled = hubs.select(
            "hub", F.col("hub").alias("node"), F.lit(0).cast("long").alias("dist")
        ).localCheckpoint(eager=True)
        frontier = settled
        for _ in range(max_rounds):
            nxt = (
                e.join(frontier.withColumnRenamed("node", "src"), "src")
                .select("hub", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
                .groupBy("hub", "node")
                .agg(F.min("dist").alias("dist"))
                .join(settled.select("hub", "node"), ["hub", "node"], "left_anti")
            )
            # prune (h, x, d) when earlier hubs already certify query <= d:
            # bound = min over hp of labels(hp, h) + labels(hp, x)
            l_h = labels.select(
                F.col("hub").alias("hp"), F.col("node").alias("hub"), F.col("dist").alias("d1")
            )
            l_x = labels.select(
                F.col("hub").alias("hp"), "node", F.col("dist").alias("d2")
            )
            bound = (
                nxt.join(l_h, "hub")
                .join(l_x, ["hp", "node"])
                .groupBy("hub", "node")
                .agg(F.min(F.col("d1") + F.col("d2")).alias("b"))
            )
            nxt = (
                nxt.join(bound, ["hub", "node"], "left")
                .filter(F.col("b").isNull() | (F.col("b") > F.col("dist")))
                .select("hub", "node", "dist")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            settled = settled.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
        labels = labels.union(settled).localCheckpoint(eager=True)
    e.unpersist()
    return labels


def hub_distances(labels: DataFrame, pairs: DataFrame) -> DataFrame:
    """-> (u, v, dist) for each requested pair — exact when ``labels`` came
    from :func:`pruned_landmark_labels` over the whole node set; pairs with
    no common hub (disconnected) are absent."""
    lu = labels.select(F.col("hub").alias("h"), F.col("node").alias("u"), F.col("dist").alias("du"))
    lv = labels.select(F.col("hub").alias("h"), F.col("node").alias("v"), F.col("dist").alias("dv"))
    return (
        pairs.join(lu, "u")
        .join(lv, ["h", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("dist"))
    )


def dyn_pll_insert(
    labels: DataFrame,
    order: DataFrame,
    post_edges: DataFrame,
    u: int,
    v: int,
    max_rounds: int = 10_000,
) -> DataFrame:
    """One undirected edge insertion on an existing PLL index
    (``distance/DynPrunedLandmarkLabeling.cpp:94-138``).

    The reference resumes, for every hub h in labels(u) (resp. labels(v)),
    a pruned BFS from v (resp. u) at level d(h, ·)+1, pruning any visit
    (h, x, level) that the current index already answers at <= level and
    appending/overwriting labels otherwise.  Here all candidate hubs run in
    ONE batched wave (same batching argument as the static builder: batch
    mates do not prune each other, so the result is a superset of the
    sequential label set and queries stay exact); the prune bound is
    rank-restricted to hubs ordered before h, matching ``queryImpl(.,.,k)``.

    ``order`` must be the construction-time :func:`pll_order`.  Returns the
    updated (hub, node, dist) label table.
    """
    spark = labels.sparkSession
    e = (
        post_edges.select("src", "dst")
        .union(post_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    e.count()
    lu = labels.filter(F.col("node") == u).select("hub", F.col("dist").alias("du"))
    lv = labels.filter(F.col("node") == v).select("hub", F.col("dist").alias("dv"))
    cand = lu.join(lv, "hub", "full").select(
        "hub",
        F.when(
            F.col("dv").isNull() | (F.col("du") + 1 < F.col("dv")), F.lit(v)
        ).otherwise(F.lit(u)).cast("long").alias("node"),
        F.when(
            F.col("dv").isNull() | (F.col("du") + 1 < F.col("dv")),
            F.col("du") + 1,
        ).otherwise(F.col("dv") + 1).cast("long").alias("dist"),
    )
    ranks = order.select(F.col("node").alias("hub"), F.col("rank").alias("hrank"))
    pre = labels.persist()
    pre.count()

    def prune(frontier):
        # bound(h, x) = min over hubs hp (rank <= rank(h)) of d(hp,h)+d(hp,x)
        l_h = pre.select(
            F.col("hub").alias("hp"), F.col("node").alias("hub"), F.col("dist").alias("d1")
        )
        l_x = pre.select(F.col("hub").alias("hp"), "node", F.col("dist").alias("d2"))
        hp_rank = order.select(F.col("node").alias("hp"), F.col("rank").alias("prank"))
        bound = (
            frontier.join(l_h, "hub")
            .join(l_x, ["hp", "node"])
            .join(F.broadcast(ranks), "hub")
            .join(hp_rank, "hp")
            .filter(F.col("prank") <= F.col("hrank"))
            .groupBy("hub", "node")
            .agg(F.min(F.col("d1") + F.col("d2")).alias("b"))
        )
        return (
            frontier.join(bound, ["hub", "node"], "left")
            .filter(F.col("b").isNull() | (F.col("b") > F.col("dist")))
            .select("hub", "node", "dist")
        )

    frontier = prune(cand).localCheckpoint(eager=True)
    added = frontier
    for _ in range(max_rounds):
        if frontier.isEmpty():
            break
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select("hub", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("hub", "node")
            .agg(F.min("dist").alias("dist"))
            .join(added.select("hub", "node"), ["hub", "node"], "left_anti")
        )
        frontier = prune(nxt).localCheckpoint(eager=True)
        added = added.union(frontier).localCheckpoint(eager=True)
    e.unpersist()
    pre.unpersist()
    # merge: new labels override an existing worse (hub, node) entry
    return (
        labels.unionByName(added)
        .groupBy("hub", "node")
        .agg(F.min("dist").alias("dist"))
    )
