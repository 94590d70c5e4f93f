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
levels in descending batches for exactly this reason). Instead of the
reference's sequential level sweep (O(#distinct weights) rounds — the
round-2 scale defect), we run a batched segment tree over weight ranks:
every active rank segment splits at its midpoint in ONE DataFrame pass per
depth, so the whole sweep is O(log #levels) depths x O(log n) contraction
rounds, with no weight values ever collected to the driver. For
all-distinct weights UMSF == the unique MSF, asserted in tests.
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
    # loop-invariant pre-partition on the first label join's key: only the
    # label table and the already-joined stream shuffle per round
    shuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    e = _sym(edges).repartition(shuf, "src").persist()
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
                   .withColumnRenamed("label", "slbl").hint("shuffle_hash"), "src")
            .join(labels.withColumnRenamed("node", "dst")
                  .withColumnRenamed("label", "dlbl").hint("shuffle_hash"), "dst")
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


def _contract_seg(hooks: DataFrame, jumps: int, broadcast: bool = True) -> DataFrame:
    """Segment-keyed :func:`_contract`: ``hooks`` = (lo, label, target),
    every join carries the segment key ``lo`` so all segments at one depth
    contract in a single batched pass. Returns (lo, label, root)."""
    bc = F.broadcast if broadcast else (lambda df: df)
    t2 = hooks.select("lo", F.col("label").alias("target"), F.col("target").alias("tt"))
    p = (
        hooks.join(bc(t2), ["lo", "target"], "left")
        .select(
            "lo",
            "label",
            F.when(
                (F.col("tt") == F.col("label")) & (F.col("label") < F.col("target")),
                F.col("label"),
            ).otherwise(F.col("target")).alias("parent"),
        )
    )
    for _ in range(jumps):
        p = p.localCheckpoint(eager=False)
        p = (
            p.join(
                bc(p.select("lo", F.col("label").alias("parent"), F.col("parent").alias("gp"))),
                ["lo", "parent"],
                "left",
            )
            .select("lo", "label", F.coalesce("gp", "parent").alias("parent"))
        )
    return p.select("lo", "label", F.col("parent").alias("root"))


def _cc_over_label_graph(adj: DataFrame, jumps: int, max_rounds: int,
                         broadcast: bool, stats: dict | None = None) -> DataFrame:
    """Batched per-segment connected components over a (lo, ls, ld) label
    graph (``adj`` must be symmetric). Boruvka-style hook-to-min-neighbor +
    pointer-jump contraction: component count at least halves per round, so
    rounds = O(log n_labels). Returns (lo, l, root)."""
    lab2root = (
        adj.select("lo", F.col("ls").alias("l"))
        .union(adj.select("lo", F.col("ld").alias("l")))
        .distinct()
        .withColumn("root", F.col("l"))
    )
    lab2root = truncate_lineage(lab2root)
    for _ in range(max_rounds):
        cur = (
            adj.join(lab2root.select("lo", F.col("l").alias("ls"), F.col("root").alias("rs")),
                     ["lo", "ls"])
            .join(lab2root.select("lo", F.col("l").alias("ld"), F.col("root").alias("rd")),
                  ["lo", "ld"])
            .filter(F.col("rs") != F.col("rd"))
        )
        hooks = cur.groupBy("lo", F.col("rs").alias("label")).agg(
            F.min("rd").alias("target")
        )
        hooks = truncate_lineage(hooks)
        if hooks.limit(1).count() == 0:
            break
        if stats is not None:
            stats["cc_rounds"] += 1
        roots = _contract_seg(hooks, jumps, broadcast=broadcast)
        lab2root = truncate_lineage(
            lab2root.join(
                roots.select("lo", F.col("label").alias("root"), F.col("root").alias("nr")),
                ["lo", "root"],
                "left",
            ).select("lo", "l", F.coalesce("nr", "root").alias("root"))
        )
    return lab2root


def union_maximum_spanning_forest(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    jumps: int = 16,
    max_level_rounds: int = 30,
    broadcast_contract: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Edges contained in >= 1 maximum spanning forest
    (``UnionMaximumSpanningForest.cpp:40-78`` descending weight-batch sweep:
    an edge qualifies iff its endpoints lie in different components of the
    strictly-heavier subgraph). Returns (src, dst, weight, in_umsf).

    Batched segment-tree sweep over weight RANKS (replaces the round-2
    per-distinct-weight driver loop — O(L) sequential Spark jobs on L
    distinct weights): distinct weights get dense descending ranks (the
    distributed range-sort encode, no single-task stage); a segment [lo, hi)
    of ranks carries one invariant — its node labels are the components
    under all edges of rank < lo (strictly heavier than every edge inside).
    Each depth splits EVERY active segment at its midpoint in one batched
    DataFrame pass: the heavy child inherits the labels, the light child's
    labels are the parent labels merged across the heavy half's edges (one
    per-segment-batched Boruvka CC over the contracted label graph). A
    segment of size 1 resolves all its edges (same weight -> same labels):
    in_umsf = endpoints differ. Depths = ceil(log2 L); per depth one batched
    CC of O(log n) hook+contract rounds; labels state is O(m) rows per depth
    (restricted to nodes incident to each segment's edges). Nothing about
    the weight set ever reaches the driver.

    ``stats`` (optional dict) receives {"distinct_weights", "depths",
    "cc_rounds"} for scale tests."""
    from networkit_spark.plans.ids import dense_ids

    spark = edges.sparkSession
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    with aqe_disabled(spark):
        ranks = dense_ids(
            canon.select((-F.col("weight")).alias("negw")), "negw", id_col="r"
        )
        e = (
            canon.withColumn("negw", -F.col("weight"))
            .join(ranks, "negw")
            .select("src", "dst", "weight", "r")
            .persist()
        )
        n_levels = e.select("r").distinct().count()
        if stats is not None:
            stats["distinct_weights"] = n_levels
            stats["depths"] = 0
            stats["cc_rounds"] = 0
        if n_levels == 0:
            e.unpersist()
            return canon.withColumn("in_umsf", F.lit(False))
        # segment state: edges carry their segment (lo, hi); labels(lo, hi,
        # node, label) = components under edges of rank < lo
        seg_e = e.withColumn("lo", F.lit(0).cast("long")).withColumn(
            "hi", F.lit(n_levels).cast("long")
        )
        incident = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        labels = truncate_lineage(
            incident.select(
                F.lit(0).cast("long").alias("lo"),
                F.lit(n_levels).cast("long").alias("hi"),
                "node",
                F.col("node").alias("label"),
            )
        )
        resolved = []
        while True:
            # resolve size-1 segments: all edges share one weight, labels ==
            # components of the strictly-heavier subgraph
            e1 = seg_e.filter(F.col("hi") - F.col("lo") == 1)
            res = (
                e1.join(
                    labels.select("lo", F.col("node").alias("src"), F.col("label").alias("ls")),
                    ["lo", "src"],
                )
                .join(
                    labels.select("lo", F.col("node").alias("dst"), F.col("label").alias("ld")),
                    ["lo", "dst"],
                )
                .select("src", "dst", "weight", (F.col("ls") != F.col("ld")).alias("in_umsf"))
            )
            resolved.append(truncate_lineage(res))
            seg_e = seg_e.filter(F.col("hi") - F.col("lo") > 1)
            if seg_e.limit(1).count() == 0:
                break
            if stats is not None:
                stats["depths"] += 1
            mid = ((F.col("lo") + F.col("hi")) / 2).cast("long")
            heavy = seg_e.filter(F.col("r") < mid)
            light = seg_e.filter(F.col("r") >= mid)
            # per-segment CC over the heavy half's contracted label graph
            adj0 = (
                heavy.join(
                    labels.select("lo", F.col("node").alias("src"), F.col("label").alias("ls")),
                    ["lo", "src"],
                )
                .join(
                    labels.select("lo", F.col("node").alias("dst"), F.col("label").alias("ld")),
                    ["lo", "dst"],
                )
                .filter(F.col("ls") != F.col("ld"))
                .select("lo", "ls", "ld")
            )
            adj = truncate_lineage(
                adj0.union(adj0.select("lo", F.col("ld").alias("ls"), F.col("ls").alias("ld"))).distinct()
            )
            roots = _cc_over_label_graph(
                adj, jumps, max_level_rounds, broadcast_contract, stats=stats
            )
            # children: heavy keeps labels, light composes through roots;
            # each restricted to nodes incident to its own edges
            h_nodes = (
                heavy.select("lo", F.col("src").alias("node"))
                .union(heavy.select("lo", F.col("dst").alias("node")))
                .distinct()
            )
            l_nodes = (
                light.select("lo", F.col("src").alias("node"))
                .union(light.select("lo", F.col("dst").alias("node")))
                .distinct()
            )
            seg_mid = ((F.col("lo") + F.col("hi")) / 2).cast("long")
            h_child = (
                labels.join(h_nodes, ["lo", "node"], "left_semi")
                .select("lo", seg_mid.alias("hi"), "node", "label")
            )
            l_child = (
                labels.join(l_nodes, ["lo", "node"], "left_semi")
                .join(roots.select("lo", F.col("l").alias("label"), F.col("root").alias("nr")),
                      ["lo", "label"], "left")
                .select(
                    seg_mid.alias("lo"),
                    "hi",
                    "node",
                    F.coalesce("nr", "label").alias("label"),
                )
            )
            labels = truncate_lineage(h_child.unionByName(l_child))
            seg_e = truncate_lineage(
                seg_e.select(
                    "src", "dst", "weight", "r",
                    F.when(F.col("r") < mid, F.col("lo")).otherwise(mid).alias("lo"),
                    F.when(F.col("r") < mid, mid).otherwise(F.col("hi")).alias("hi"),
                )
            )
        e.unpersist()
        out = resolved[0]
        for r in resolved[1:]:
            out = out.unionByName(r)
        return out.select("src", "dst", "weight", "in_umsf")


def random_spanning_forest(
    und_edges: DataFrame, seed: int = 42
) -> DataFrame:
    """Uniform random spanning forest (``RandomSpanningForest.cpp:18-50``):
    per connected component, an Aldous-Broder walk — simple random walk
    from a random root; the first-entry edge of every node is a tree edge,
    which samples a spanning tree uniformly.

    The walk is inherently sequential (the reference's own shape), so it
    runs driver-side on the collected adjacency, guarded at
    ``DRIVER_GEN_MAX_N`` nodes with a portable seeded RNG (any engine
    replays the same forest). The distributed twin at scale is
    :func:`max_spanning_forest` over hash-random edge priorities — a
    random (not uniform) spanning forest in O(log n) Boruvka rounds.

    ``und_edges``: symmetric rows. Returns (src, dst) tree edges, src < dst.
    """
    import random

    from networkit_spark.sources.generators import _guard_driver_n

    rows = und_edges.select("src", "dst").collect()
    adj: dict[int, list[int]] = {}
    for r in rows:
        adj.setdefault(r["src"], []).append(r["dst"])
    nodes = sorted(adj)
    _guard_driver_n(len(nodes), "random_spanning_forest", "max_spanning_forest")
    for k in adj:
        adj[k].sort()
    rng = random.Random(seed)
    seen: set[int] = set()
    forest: list[tuple[int, int]] = []
    for start in nodes:
        if start in seen:
            continue
        # component via BFS
        comp = [start]
        comp_set = {start}
        qi = 0
        while qi < len(comp):
            for y in adj[comp[qi]]:
                if y not in comp_set:
                    comp_set.add(y)
                    comp.append(y)
            qi += 1
        seen |= comp_set
        curr = comp[rng.randrange(len(comp))]
        visited = {curr}
        while len(visited) < len(comp):
            nbrs = adj[curr]
            neigh = nbrs[rng.randrange(len(nbrs))]
            if neigh not in visited:
                forest.append((min(curr, neigh), max(curr, neigh)))
                visited.add(neigh)
            curr = neigh
    spark = und_edges.sparkSession
    if not forest:
        return spark.createDataFrame([], "src long, dst long")
    return spark.createDataFrame(sorted(forest), "src long, dst long")


def kruskal_msf(edges: DataFrame, nodes: DataFrame | None = None,
                **kwargs) -> ForestResult:
    """KruskalMSF (``graph/KruskalMSF.cpp``): MINIMUM spanning forest. The
    reference sorts edges weight-ascending and union-finds sequentially;
    under the repo's deterministic total order (weight asc, then (lo,hi)
    asc) the min forest is unique, so Boruvka with ``maximum=False``
    returns the exact same edge set in O(log n) distributed rounds (same
    argument as the max forest, module docstring)."""
    return max_spanning_forest(edges, nodes, maximum=False, **kwargs)


def prim_msf(edges: DataFrame, nodes: DataFrame | None = None,
             **kwargs) -> ForestResult:
    """PrimMSF (``graph/PrimMSF.cpp``): same unique minimum spanning forest
    as Kruskal under distinct effective weights — one implementation, two
    reference entry points."""
    return kruskal_msf(edges, nodes, **kwargs)
