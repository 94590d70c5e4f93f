"""PLM — parallel Louvain method (modularity-gain local moves + coarsening).

Reference: ``cpp/community/PLM.cpp:30-115+`` (move phase :84+, coarsening via
``ParallelPartitionCoarsening``, recursion, optional refinement; Python
``networkit/community.pyx:608``). The reference moves nodes concurrently
over shared state (nondeterministic under OpenMP); its own tests check
modularity quality, not exact partitions — same bar here
(``CommunityGTest.cpp:59-72``).

Distributed synchronous design:

- **Local move sweep** (one superstep, all relational):
  ``w_uc`` = weight from node u to community c (edges x labels join + agg);
  community volumes ``vol(c)`` (labels x degree join + agg, broadcastable);
  gain ranking ``score(u, c) = w_uc - wdeg_u * vol'_c / (2m)`` with
  ``vol'`` excluding u from its own community — the standard Louvain gain
  up to the constant 1/m scale. Node moves to the argmax community iff
  strictly better than staying (tie -> smallest community id).
- **Oscillation guard**: synchronous all-node moves can swap two nodes
  forever; only nodes with ``pmod(node, 2) == sweep % 2`` move in a sweep
  (even/odd staging — deterministic, no shared state).
- **Coarsening** (``ParallelPartitionCoarsening`` analog): when a level
  converges, contract communities: ``groupBy(comm_src, comm_dst) sum w``
  (self-rows carry 2x intra weight so contracted degrees equal community
  volumes), recurse, compose mappings on the way out.
- Labels normalized to min member node id (deterministic output).

Scale: each sweep is the PLP shuffle (edges x labels by src, agg by dst-comm)
plus one broadcast-sized vols table; coarsening shrinks the edge table
geometrically, so total work ~ a few sweeps over |E|.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import truncate_lineage


@dataclass
class PLMResult:
    labels_df: DataFrame  # (node, label) — label = min member node id
    levels: int
    sweeps: int

    def get_partition(self) -> DataFrame:
        return self.labels_df

    def number_of_communities(self) -> int:
        return self.labels_df.select("label").distinct().count()


def _local_move_sweeps(
    edges: DataFrame,
    nodes: DataFrame,
    max_sweeps: int,
    init_labels: DataFrame | None = None,
):
    """Converged (node, comm) labels for one level. Edges symmetrized;
    self-loop rows (src==dst) are excluded from gains (they move with the
    node and cancel in the argmax). ``init_labels(node, comm)`` seeds the
    sweep (Leiden passes the previous level's partition; default
    singletons)."""
    spark = edges.sparkSession
    m2 = edges.agg(F.sum("weight")).first()[0] or 0.0  # == 2m
    if m2 == 0:
        return nodes.select(F.col("id").alias("node"), F.col("id").alias("comm")), 0
    wdeg = edges.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    wdeg = (
        nodes.select(F.col("id").alias("node"))
        .join(wdeg, "node", "left")
        .fillna({"wdeg": 0.0})
        .persist()
    )
    wdeg.count()
    # loop-invariant edge table pre-partitioned on the per-sweep join key
    # (the PageRank contrib recipe): only the label table shuffles per sweep
    shuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .repartition(shuf, "src")
        .persist()
    )
    e.count()

    labels = truncate_lineage(
        init_labels
        if init_labels is not None
        else nodes.select(F.col("id").alias("node"), F.col("id").alias("comm"))
    )
    sweeps = 0
    stable_parities = 0
    non_improving = 0
    best_moved = float("inf")
    while sweeps < max_sweeps and stable_parities < 2 and non_improving < 4:
        parity = sweeps % 2
        vols = (
            labels.join(wdeg, "node")
            .groupBy("comm")
            .agg(F.sum("wdeg").alias("vol"))
        )
        # w_uc for every (node u, neighbor community c)
        wuc = (
            e.join(
                labels.select(
                    F.col("node").alias("src"), F.col("comm").alias("c")
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "c")
            .agg(F.sum("weight").alias("wuc"))
        )
        cur = labels.select("node", F.col("comm").alias("cur"))
        cand = (
            wuc.join(cur, "node")
            .join(wdeg, "node")
            .join(vols.withColumnRenamed("comm", "c"), "c")
            .select(
                "node",
                "c",
                "cur",
                (
                    F.col("wuc")
                    - F.col("wdeg")
                    * (
                        F.col("vol")
                        - F.when(F.col("c") == F.col("cur"), F.col("wdeg")).otherwise(0.0)
                    )
                    / F.lit(m2)
                ).alias("score"),
            )
        )
        # staying score: candidate row for own community exists iff u has a
        # neighbor there; add the explicit stay option with wuc = 0 fallback
        # tiny stay bias: a move must beat staying by > 1e-9 — kills float-
        # noise flip-flopping between parity sweeps on near-tie communities
        stay = (
            cur.join(wdeg, "node")
            .join(vols.withColumnRenamed("comm", "cur"), "cur")
            .select(
                "node",
                F.col("cur").alias("c"),
                "cur",
                (
                    F.lit(1e-9)
                    - F.col("wdeg") * (F.col("vol") - F.col("wdeg")) / F.lit(m2)
                ).alias("score"),
            )
        )
        allc = cand.unionByName(stay)
        # argmax: (score desc, stay-preferred, comm asc); stay-preferred is
        # encoded by a tiny epsilon bonus impossible to matter numerically?
        # -> no: deterministic tie-break = prefer current comm on ties, then
        # smallest id: sort key (score, is_cur, -c)
        best = (
            allc.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("score"),
                        (F.col("c") == F.col("cur")).cast("int").alias("is_cur"),
                        (-F.col("c")).alias("negc"),
                    )
                ).alias("top")
            )
            .select("node", (-F.col("top.negc")).alias("newc"))
        )
        new_labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.when(
                    (F.pmod(F.abs(F.xxhash64(F.col("node"), F.lit(sweeps // 2))), F.lit(2)) == parity)
                    & F.col("newc").isNotNull(),
                    F.col("newc"),
                )
                .otherwise(F.col("comm"))
                .alias("comm"),
                F.col("comm").alias("prev"),
            )
        )
        new_labels = truncate_lineage(new_labels)
        moved = new_labels.filter(F.col("comm") != F.col("prev")).count()
        labels = new_labels.select("node", "comm")
        sweeps += 1
        stable_parities = stable_parities + 1 if moved == 0 else 0
        # oscillation breaker: stop the level if moves stop shrinking
        if moved < best_moved:
            best_moved, non_improving = moved, 0
        else:
            non_improving += 1
    e.unpersist()
    wdeg.unpersist()
    return labels, sweeps


def plm_fixed_sweeps(
    edges: DataFrame, nodes: DataFrame | None = None, iterations: int = 2
) -> DataFrame:
    """Oracle-portable PLM move phase (driver-query / DuckDB-oracle twin of
    :class:`PLM`, same pattern as ``map_equation_fixed``): fixed sweep count,
    ``node % 2`` parity staging (instead of the hash staging of the
    convergence engine), Louvain gain scores rounded to 9 decimals so the
    move decisions reproduce across engines, no coarsening.

    Gain formula identical to :func:`_local_move_sweeps`
    (``cpp/community/PLM.cpp:84+`` move phase):
    ``score(u, c) = w_uc - wdeg_u * (vol_c - [c == cur] * wdeg_u) / 2m``;
    stay option scored with ``w_uc = 0``; argmax tie-break = (score desc,
    prefer current, smallest community id). Returns (node, label) with
    label = min member node id."""
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    m2 = edges.agg(F.sum("weight")).first()[0] or 0.0
    if m2 == 0:
        return nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    wdeg = (
        nodes.select(F.col("id").alias("node"))
        .join(
            edges.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg")),
            "node",
            "left",
        )
        .fillna({"wdeg": 0.0})
    )
    e = edges.filter(F.col("src") != F.col("dst"))
    labels = nodes.select(F.col("id").alias("node"), F.col("id").alias("comm"))
    for k in range(iterations):
        parity = k % 2
        vols = labels.join(wdeg, "node").groupBy("comm").agg(F.sum("wdeg").alias("vol"))
        wuc = (
            e.join(
                labels.select(F.col("node").alias("src"), F.col("comm").alias("c")),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "c")
            .agg(F.sum("weight").alias("wuc"))
        )
        cur = labels.select("node", F.col("comm").alias("cur"))
        cand = (
            wuc.join(cur, "node")
            .join(wdeg, "node")
            .join(vols.withColumnRenamed("comm", "c"), "c")
            .select(
                "node",
                "c",
                "cur",
                F.round(
                    F.col("wuc")
                    - F.col("wdeg")
                    * (
                        F.col("vol")
                        - F.when(F.col("c") == F.col("cur"), F.col("wdeg")).otherwise(0.0)
                    )
                    / F.lit(m2),
                    9,
                ).alias("score"),
            )
        )
        stay = (
            cur.join(wdeg, "node")
            .join(vols.withColumnRenamed("comm", "cur"), "cur")
            .select(
                "node",
                F.col("cur").alias("c"),
                "cur",
                F.round(
                    -F.col("wdeg") * (F.col("vol") - F.col("wdeg")) / F.lit(m2), 9
                ).alias("score"),
            )
        )
        best = (
            cand.unionByName(stay)
            .groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("score"),
                        (F.col("c") == F.col("cur")).cast("int").alias("is_cur"),
                        (-F.col("c")).alias("negc"),
                    )
                ).alias("top")
            )
            .select("node", (-F.col("top.negc")).alias("newc"))
        )
        labels = truncate_lineage(
            labels.join(best, "node", "left").select(
                "node",
                F.when(
                    (F.pmod(F.col("node"), 2) == parity) & F.col("newc").isNotNull(),
                    F.col("newc"),
                )
                .otherwise(F.col("comm"))
                .alias("comm"),
            )
        )
    norm = labels.groupBy("comm").agg(F.min("node").alias("label"))
    return labels.join(norm, "comm").select("node", "label")


def _contract(edges: DataFrame, labels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(contracted_nodes, contracted_edges): communities become nodes;
    symmetrized row sums preserve volumes (self rows carry 2x intra)."""
    la = labels.select(F.col("node").alias("src"), F.col("comm").alias("cs"))
    lb = labels.select(F.col("node").alias("dst"), F.col("comm").alias("cd"))
    ce = (
        edges.join(la, "src")
        .join(lb, "dst")
        .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    cn = labels.select(F.col("comm").alias("id")).distinct()
    return cn, ce


class PLM:
    def __init__(self, max_sweeps_per_level: int = 16, max_levels: int = 6):
        self.max_sweeps_per_level = max_sweeps_per_level
        self.max_levels = max_levels

    def run(self, edges: DataFrame, nodes: DataFrame | None = None) -> PLMResult:
        """``edges`` symmetrized undirected.

        NOTE: PLM deliberately runs WITH AQE (unlike the PageRank/CC loops):
        each sweep joins several *small* derived tables (vols, labels, gains)
        against the edge table, and AQE's runtime broadcast conversion of
        those is worth far more than the re-planning overhead — measured
        ~30x per-sweep difference on a 3k-edge graph. The aqe_disabled rule
        applies to loops dominated by one big persisted table."""
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        cur_edges = edges.select("src", "dst", "weight")
        cur_nodes = nodes
        # mapping(node -> comm) composed across levels
        mapping = nodes.select(F.col("id").alias("node"), F.col("id").alias("comm"))
        total_sweeps = 0
        levels = 0
        for _level in range(self.max_levels):
            labels, sweeps = _local_move_sweeps(
                cur_edges, cur_nodes, self.max_sweeps_per_level
            )
            total_sweeps += sweeps
            levels += 1
            n_before = cur_nodes.count()
            n_after = labels.select("comm").distinct().count()
            # compose: node -> old comm -> new comm
            level_map = labels.select(
                F.col("node").alias("comm"), F.col("comm").alias("newc")
            )
            mapping = truncate_lineage(
                mapping.join(level_map, "comm")
                .select("node", F.col("newc").alias("comm"))
            )
            if n_after == n_before:
                break
            cur_nodes, cur_edges = _contract(cur_edges, labels)
            cur_edges = truncate_lineage(cur_edges)
            cur_nodes = truncate_lineage(cur_nodes)
        # normalize labels to min member node id
        norm = mapping.groupBy("comm").agg(F.min("node").alias("label"))
        final = mapping.join(norm, "comm").select("node", "label")
        return PLMResult(labels_df=final, levels=levels, sweeps=total_sweeps)


def _refine_connected(edges: DataFrame, nodes: DataFrame, labels: DataFrame) -> DataFrame:
    """Leiden refinement core: split every community into its CONNECTED
    parts (CC over intra-community edges). Louvain's known defect is
    internally-disconnected communities; the Leiden paper's refinement
    guarantees connectivity — this is its distributed essence (the
    gain-weighted singleton merging is subsumed by the next level's local
    moves). Returns (node, comm) with comm = min node id of the part."""
    from networkit_spark.operators.components import ConnectedComponents

    la = labels.select(F.col("node").alias("src"), F.col("comm").alias("cs"))
    lb = labels.select(F.col("node").alias("dst"), F.col("comm").alias("cd"))
    intra = (
        edges.join(la, "src").join(lb, "dst")
        .filter(F.col("cs") == F.col("cd"))
        .select("src", "dst", "weight")
    )
    sub = ConnectedComponents().run(intra, nodes).labels_df
    return sub.select("node", F.col("label").alias("comm"))


class ParallelLeiden(PLM):
    """Leiden (``cpp/community/ParallelLeiden.cpp`` /
    ``community.pyx:708``): Louvain local moves + a refinement phase before
    each contraction, aggregating on the REFINED partition while seeding the
    next level's moves with the coarser move-phase partition (the Leiden
    aggregation rule). Guarantees internally-connected communities —
    asserted by pytest."""

    def run(self, edges: DataFrame, nodes: DataFrame | None = None) -> PLMResult:
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        cur_edges = edges.select("src", "dst", "weight")
        cur_nodes = nodes
        mapping = nodes.select(F.col("id").alias("node"), F.col("id").alias("comm"))
        init = None
        total_sweeps = 0
        levels = 0
        for _level in range(self.max_levels):
            moved_labels, sweeps = _local_move_sweeps(
                cur_edges, cur_nodes, self.max_sweeps_per_level, init_labels=init
            )
            total_sweeps += sweeps
            levels += 1
            refined = truncate_lineage(
                _refine_connected(cur_edges, cur_nodes, moved_labels)
            )
            n_before = cur_nodes.count()
            n_after = refined.select("comm").distinct().count()
            level_map = refined.select(
                F.col("node").alias("comm"), F.col("comm").alias("newc")
            )
            mapping = truncate_lineage(
                mapping.join(level_map, "comm").select("node", F.col("newc").alias("comm"))
            )
            if n_after == n_before:
                break
            # aggregate on the refined partition; seed next level's moves
            # with the move-phase (coarser) partition: contracted node id =
            # refined part id -> its member's move-phase community
            cur_nodes, cur_edges = _contract(cur_edges, refined)
            cur_edges = truncate_lineage(cur_edges)
            cur_nodes = truncate_lineage(cur_nodes)
            init = truncate_lineage(
                refined.join(moved_labels.withColumnRenamed("comm", "mc"), "node")
                .groupBy(F.col("comm").alias("node"))
                .agg(F.min("mc").alias("comm"))
            )
        norm = mapping.groupBy("comm").agg(F.min("node").alias("label"))
        final = mapping.join(norm, "comm").select("node", "label")
        return PLMResult(labels_df=final, levels=levels, sweeps=total_sweeps)

