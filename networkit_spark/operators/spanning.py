"""Distributed spanning forests (Boruvka) — reference parity for
``cpp/graph/SpanningForest.cpp`` (any spanning forest, BFS-built),
``cpp/graph/RandomMaximumSpanningForest.cpp:11-71`` (Kruskal on weight-desc
order, random tie-break) and ``cpp/graph/UnionMaximumSpanningForest.cpp``
(edges contained in AT LEAST ONE maximum spanning forest).

The reference's Kruskal is inherently sequential (one global union-find
sweep). Boruvka is the parallel classic: every round each component hooks
its best incident edge, components contract, rounds are O(log n). With a
*total order* on edges (weight desc, then (min id, max id) asc — our
deterministic stand-in for the reference's shuffled tie-break) the maximum
spanning forest is unique, so Boruvka and the reference's Kruskal produce
the exact same edge set.

Spark shape per round (all JVM column exprs):
  1. drop intra-component edges (labels join ×2, then filter),
  2. per-component argmax-by-struct best edge (one hash agg — the PLP
     argmax pattern, no window sort),
  3. hooking: component -> component pointer graph; 2-cycles (mutual best
     pairs — the only cycles Boruvka can make under a total order) broken
     toward the smaller label, then pointer-jump to the root (<= log2 n
     self-joins of the n_components-row pointer table),
  4. relabel nodes through the contracted pointer map.

Nothing ever collects to the driver; state is (node, label) + the forest
edge accumulator. ``max_spanning_forest_fixed`` is the fixed-round /
fixed-jump twin whose plan unrolls 1:1 to the ANSI-SQL oracle
(entry_queries_graph._msf_oracle_sql).

``union_maximum_spanning_forest`` uses the cut characterization: an edge
(u,v,w) is in some MSF iff u,v lie in different components of the subgraph
of STRICTLY heavier edges (UnionMaximumSpanningForest.cpp processes weight
levels in descending batches for exactly this reason). We replay the same
level sweep with DataFrame labels; per-level contraction reuses the
pointer-jump hook. Weight-level count drives the round count — suitable for
score-like weights with moderate distinct levels (the sparsification use
case); for all-distinct weights UMSF == the unique MSF, asserted in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize keeping weight; (u,v,w) and (v,u,w) both present."""
    e = edges.select("src", "dst", "weight").filter(F.col("src") != F.col("dst"))
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).dropDuplicates(["src", "dst"])


def _best_edge_struct(maximum: bool):
    """Argmax struct: weight (negated for max so F.min works uniformly),
    then canonical (lo, hi) edge id asc — the deterministic total order."""
    w = F.col("weight")
    lo = F.least("src", "dst")
    hi = F.greatest("src", "dst")
    return F.struct(
        (-w if maximum else w).alias("k"),
        lo.alias("lo"),
        hi.alias("hi"),
    )


def _contract(hooks: DataFrame, jumps: int, broadcast: bool = False) -> DataFrame:
    """Resolve the hooking pointer graph to roots.

    ``hooks``: (label, target) — each component's chosen neighbor component.
    2-cycles broken toward min label, then ``jumps`` pointer-jump rounds
    (parent = parent(parent)); jumps >= ceil(log2 n_components) reaches
    every root. Returns (label, root).

    ``broadcast``: hash-join the (tiny, geometrically shrinking) pointer
    table map-side so the whole jump chain is ONE codegen stage instead of
    ``jumps`` shuffles. Opt-in: round-0 hooks are O(n) rows, so the caller
    decides when the component count is broadcast-sized (the gate-graph
    oracle twin always is; a 10^12-node round 0 is not)."""
    bc = F.broadcast if broadcast else (lambda df: df)
    # break mutual pairs: if target(target(l)) == l keep the smaller as root
    t2 = hooks.select(F.col("label").alias("target"), F.col("target").alias("tt"))
    p = (
        hooks.join(bc(t2), "target", "left")
        .select(
            "label",
            F.when(
                (F.col("tt") == F.col("label")) & (F.col("label") < F.col("target")),
                F.col("label"),
            ).otherwise(F.col("target")).alias("parent"),
        )
    )
    for _ in range(jumps):
        # lazy localCheckpoint: truncates the LOGICAL plan immediately (the
        # join below references p twice — without this, j jumps build a
        # 2^j-node plan) while deferring compute; the underlying RDD DAG is
        # shared by reference, so the whole chain still runs as one job.
        p = p.localCheckpoint(eager=False)
        p = (
            p.join(
                bc(p.select(F.col("label").alias("parent"), F.col("parent").alias("gp"))),
                "parent",
                "left",
            )
            .select("label", F.coalesce("gp", "parent").alias("parent"))
        )
    return p.select("label", F.col("parent").alias("root"))


@dataclass
class ForestResult:
    forest_df: DataFrame   # (src, dst, weight) with src < dst, one row/edge
    labels_df: DataFrame   # (node, label) final component labels
    iterations: int
    converged: bool


def max_spanning_forest(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    maximum: bool = True,
    max_rounds: int = 30,
    jumps: int = 16,
    broadcast_contract: bool = False,
) -> ForestResult:
    """Boruvka maximum (or minimum) spanning forest; unique under the
    deterministic edge total order (see module docstring).

    ``broadcast_contract``: map-side pointer-resolution joins — enable when
    the component count fits the broadcast threshold (always after a few
    rounds; NOT for a 10^12-node round 0, hence opt-in)."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        return _boruvka(edges, nodes, maximum, max_rounds, jumps, check=True,
                        broadcast=broadcast_contract)


def max_spanning_forest_fixed(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    rounds: int = 10,
    jumps: int = 10,
    maximum: bool = True,
) -> DataFrame:
    """Fixed-round / fixed-jump oracle twin; returns the forest edge table.
    ``rounds`` >= ceil(log2 n) guarantees convergence (tests assert the
    convergence-driven engine returns the identical set). Early-exits once
    no inter-component edge remains — post-convergence rounds contribute no
    forest edges, so the output is identical to the full unroll (which is
    what the SQL oracle runs); contraction joins are broadcast (component
    pointer tables shrink geometrically; gate-scale always fits)."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        res = _boruvka(edges, nodes, maximum, rounds, jumps, check=True,
                       broadcast=True)
    return res.forest_df


def _boruvka(
    edges: DataFrame,
    nodes: DataFrame | None,
    maximum: bool,
    max_rounds: int,
    jumps: int,
    check: bool,
    broadcast: bool = False,
) -> ForestResult:
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    e = _sym(edges).persist()
    e.count()
    labels = truncate_lineage(
        nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    )
    forest = None
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        le = (
            e.join(labels.withColumnRenamed("node", "src")
                   .withColumnRenamed("label", "slbl"), "src")
            .join(labels.withColumnRenamed("node", "dst")
                  .withColumnRenamed("label", "dlbl"), "dst")
            .filter(F.col("slbl") != F.col("dlbl"))
        )
        best = (
            le.groupBy("slbl")
            .agg(F.min(F.struct(
                _best_edge_struct(maximum).alias("k"),
                F.col("dlbl").alias("target"),
            )).alias("b"))
            .select(
                F.col("slbl").alias("label"),
                F.col("b.k.lo").alias("lo"),
                F.col("b.k.hi").alias("hi"),
                (-F.col("b.k.k") if maximum else F.col("b.k.k")).alias("weight"),
                F.col("b.target").alias("target"),
            )
        )
        best = truncate_lineage(best)
        if check and best.limit(1).count() == 0:
            converged = True
            break
        # each chosen (lo, hi) appears once per side that picked it; dedup
        new_edges = best.select(
            F.col("lo").alias("src"), F.col("hi").alias("dst"), "weight"
        ).dropDuplicates(["src", "dst"])
        forest = new_edges if forest is None else truncate_lineage(
            forest.union(new_edges).dropDuplicates(["src", "dst"])
        )
        roots = _contract(best.select("label", "target"), jumps, broadcast=broadcast)
        labels = truncate_lineage(
            labels.join(roots, "label", "left")
            .select("node", F.coalesce("root", "label").alias("label"))
        )
        if not check and forest is not None:
            forest = truncate_lineage(forest)
    if forest is None:
        forest = edges.sparkSession.createDataFrame(
            [], "src long, dst long, weight double"
        )
    e.unpersist()
    return ForestResult(
        forest_df=forest, labels_df=labels, iterations=rounds, converged=converged
    )


def spanning_forest(edges: DataFrame, nodes: DataFrame | None = None) -> ForestResult:
    """Unweighted spanning forest (SpanningForest.cpp semantics: any forest,
    one tree per component). Implemented as the unit-weight Boruvka — the
    deterministic edge order replaces the reference's BFS arrival order."""
    uw = edges.select("src", "dst").withColumn("weight", F.lit(1.0))
    return max_spanning_forest(uw, nodes)


def union_maximum_spanning_forest(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    jumps: int = 16,
    max_level_rounds: int = 30,
    broadcast_contract: bool = True,
) -> DataFrame:
    """Edges contained in >= 1 maximum spanning forest
    (UnionMaximumSpanningForest.cpp:40-78 descending weight-batch sweep).

    Returns (src, dst, weight, in_umsf). Distinct weight levels are processed
    heaviest-first; at each level an edge qualifies iff its endpoints are in
    different components under strictly heavier edges; then the whole level
    merges (intra-level hash-min to convergence — levels are small cuts in
    practice)."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        e = _sym(edges).persist()
        e.count()
        levels = [
            r.weight
            for r in e.select("weight").distinct().orderBy(F.desc("weight")).collect()
        ]
        labels = truncate_lineage(
            nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
        )
        marked = None
        for w in levels:
            lvl = e.filter(F.col("weight") == w)
            le = (
                lvl.join(labels.withColumnRenamed("node", "src")
                         .withColumnRenamed("label", "slbl"), "src")
                .join(labels.withColumnRenamed("node", "dst")
                      .withColumnRenamed("label", "dlbl"), "dst")
            )
            hit = (
                le.filter(F.col("slbl") != F.col("dlbl"))
                .filter(F.col("src") < F.col("dst"))
                .select("src", "dst", "weight")
            )
            marked = hit if marked is None else marked.union(hit)
            marked = truncate_lineage(marked)
            # merge the level: hash-min over contracted level edges until
            # stable (each pass at least halves label count on the level)
            for _ in range(max_level_rounds):
                le2 = (
                    lvl.join(labels.withColumnRenamed("node", "src")
                             .withColumnRenamed("label", "slbl"), "src")
                    .join(labels.withColumnRenamed("node", "dst")
                          .withColumnRenamed("label", "dlbl"), "dst")
                    .filter(F.col("slbl") != F.col("dlbl"))
                )
                hooks = le2.groupBy(F.col("slbl").alias("label")).agg(
                    F.min("dlbl").alias("target")
                )
                hooks = truncate_lineage(hooks)
                if hooks.limit(1).count() == 0:
                    break
                roots = _contract(hooks, jumps, broadcast=broadcast_contract)
                labels = truncate_lineage(
                    labels.join(roots, "label", "left")
                    .select("node", F.coalesce("root", "label").alias("label"))
                )
        e.unpersist()
        canon = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        if marked is None:
            return canon.withColumn("in_umsf", F.lit(False))
        return canon.join(
            marked.select("src", "dst").withColumn("in_umsf", F.lit(True)),
            ["src", "dst"],
            "left",
        ).select(
            "src", "dst", "weight", F.coalesce("in_umsf", F.lit(False)).alias("in_umsf")
        )
