"""Triangle counting, local/global clustering coefficients, edge triangle scores.

Reference: ``cpp/centrality/LocalClusteringCoefficient.cpp:16-88`` (node
iterator; ``turbo`` mode pre-builds a degree-ordered orientation, ``:24-43``),
``cpp/global/ClusteringCoefficient.cpp:19-270`` (exact/avg/global + wedge
sampling), ``cpp/edgescores/TriangleEdgeScore.cpp:18-110`` (per-edge counts).
Inputs must be simple undirected graphs (the reference rejects directed /
self-loops, ``LocalClusteringCoefficient.cpp:8-13``): pass the symmetrized,
deduplicated, loop-free edge table.

Algorithm — the reference's ``turbo`` orientation IS the scalable plan:

1. orient each undirected edge from the (degree, id)-smaller endpoint to the
   larger (``isOutEdge = deg(u)>deg(v) or (==, u<v)``,
   ``LocalClusteringCoefficient.cpp:25-27``, reversed sign, same effect):
   every triangle is enumerated exactly once, and out-degrees in the
   oriented graph are bounded by O(sqrt(m)) (arboricity bound) — this is
   the skew-killer: hub vertices never fan out their full neighborhood;
2. wedges: self-join of oriented edges on the common *source*
   (pairs of out-neighbors); closing check: join wedge (x, y) against
   oriented edges — two shuffle joins total;
3. per-node counts: each triangle (s, x, y) increments all three corners —
   ``explode`` + hash agg;
4. ``lcc(u) = 2*tri(u) / (d(u) (d(u)-1))`` (``:82``); global CC =
   ``3*triangles / wedges`` with ``wedges = sum d(d-1)/2``
   (``ClusteringCoefficient.cpp:195-206``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges


def orient_edges(und_edges: DataFrame) -> DataFrame:
    """Degree-ordered orientation of a symmetrized simple graph.

    Input: both (u,v) and (v,u) rows. Output: one row per undirected edge,
    pointing (deg, id)-upward, with the degree of src and dst attached.
    """
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.select("src", "dst")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("sd")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    return e.filter(
        (F.col("sd") < F.col("dd"))
        | ((F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", "sd", "dd")


def enumerate_triangles(und_edges: DataFrame) -> DataFrame:
    """(a, b, c) one row per triangle, a/b/c in orientation order."""
    eo = orient_edges(und_edges)
    e1 = eo.select(F.col("src").alias("s"), F.col("dst").alias("x"),
                   F.col("dd").alias("xd"))
    e2 = eo.select(F.col("src").alias("s"), F.col("dst").alias("y"),
                   F.col("dd").alias("yd"))
    wedges = e1.join(e2, "s").filter(
        (F.col("xd") < F.col("yd"))
        | ((F.col("xd") == F.col("yd")) & (F.col("x") < F.col("y")))
    )
    closing = eo.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    return wedges.join(closing, ["x", "y"], "left_semi").select(
        F.col("s").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )


def triangle_counts(und_edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """(node, triangles) — per-node triangle participation counts."""
    tri = enumerate_triangles(und_edges)
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    counts = corners.groupBy("node").agg(F.count("*").alias("triangles"))
    nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
    return (
        nodes.select(F.col("id").alias("node"))
        .join(counts, "node", "left")
        .fillna({"triangles": 0})
    )


def total_triangles(und_edges: DataFrame) -> int:
    return enumerate_triangles(und_edges).count()


def local_clustering_coefficient(
    und_edges: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """(node, lcc). Ref: ``LocalClusteringCoefficient.cpp:82`` —
    ``c(u) = 2*tri / (d(d-1))``, 0 for degree < 2."""
    nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
    tri = triangle_counts(und_edges, nodes)
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    return (
        tri.join(deg, "node", "left")
        .fillna({"d": 0})
        .select(
            "node",
            F.when(
                F.col("d") >= 2,
                2.0 * F.col("triangles") / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(0.0)
            .alias("lcc"),
        )
    )


def global_clustering_coefficient(und_edges: DataFrame) -> float:
    """Transitivity: 3*triangles / wedges. Ref:
    ``ClusteringCoefficient::exactGlobal`` (``ClusteringCoefficient.cpp:195-206``)."""
    deg = und_edges.groupBy("src").agg(F.count("*").alias("d"))
    wedges = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2)).first()[0] or 0
    if wedges == 0:
        return 0.0
    return 3.0 * total_triangles(und_edges) / float(wedges)


def avg_local_clustering_coefficient(und_edges: DataFrame, nodes: DataFrame | None = None) -> float:
    """Ref: ``ClusteringCoefficient::avgLocal`` — mean of per-node LCC."""
    return (
        local_clustering_coefficient(und_edges, nodes).agg(F.avg("lcc")).first()[0]
        or 0.0
    )


def triangle_edge_score(und_edges: DataFrame) -> DataFrame:
    """(src, dst, score) — #triangles through each undirected edge, keyed with
    src < dst. Ref: ``cpp/edgescores/TriangleEdgeScore.cpp:18-110``."""
    tri = enumerate_triangles(und_edges)
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")),
                F.struct(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")),
                F.struct(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")),
            )
        ).alias("e")
    ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    counts = pairs.groupBy("u", "v").agg(F.count("*").alias("score"))
    base = und_edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return (
        base.join(counts, ["u", "v"], "left")
        .fillna({"score": 0})
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "score")
    )


def local_square_clustering(und_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, score): local square (4-cycle) clustering coefficient —
    ``cpp/centrality/LocalSquareClusteringCoefficient.cpp:19-50`` exact
    semantics: per unordered neighbor pair (v, w) of u,
    ``squares += cn(v,w) - 1`` and
    ``potential += deg(v) + deg(w) - cn(v,w) - 1 - 2*[edge(v,w)]``;
    score = squares / potential (0 when potential <= 0).

    Relational: neighbor-pair enumeration (the wedge join keyed on the
    CENTER u) + a common-neighbor-count join. Wedge fan-out at a hub is
    O(deg^2) — same skew class as undirected triangle counting; the gate
    graph is hub-capped, and web-scale callers should degree-cap first.
    """
    e = und_edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    # unordered neighbor pairs of each u
    p = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(e.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u")
        .filter(F.col("v") < F.col("w"))
    )
    # common-neighbor counts for pairs sharing >= 1 neighbor
    cn = (
        e.select(F.col("src").alias("mid"), F.col("dst").alias("v"))
        .join(e.select(F.col("src").alias("mid"), F.col("dst").alias("w")), "mid")
        .filter(F.col("v") < F.col("w"))
        .groupBy("v", "w")
        .agg(F.count("*").alias("cn"))
    )
    has_edge = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("v"), F.col("dst").alias("w"), F.lit(1).alias("vw")
    )
    full = (
        p.join(cn, ["v", "w"])  # cn >= 1 always (u is a common neighbor)
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .join(deg.select(F.col("node").alias("w"), F.col("d").alias("dw")), "w")
        .join(has_edge, ["v", "w"], "left")
    )
    agg = full.groupBy("u").agg(
        F.sum(F.col("cn") - 1).alias("sq"),
        F.sum(
            F.col("dv") + F.col("dw") - F.col("cn") - 1
            - 2 * F.coalesce(F.col("vw"), F.lit(0))
        ).alias("pot"),
    )
    return (
        nodes.select(F.col("id").alias("node"))
        .join(agg.withColumnRenamed("u", "node"), "node", "left")
        .select(
            "node",
            F.when(F.col("pot") > 0, F.col("sq") / F.col("pot"))
            .otherwise(0.0)
            .alias("score"),
        )
    )


def quadrangle_edge_score(und_edges: DataFrame) -> DataFrame:
    """(src, dst, score) — #quadrangles (simple 4-cycles) through each
    undirected edge, keyed src < dst. Ref:
    ``cpp/edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp:15-95`` — its
    degree-ordered wedge-marker sweep credits every 4-cycle once to each of
    its four edges; the order-free closed form is

        score(a, b) = P3(a, b) - deg(a) - deg(b) + 1

    where P3 counts length-3 walks a->x->y->b (the corrections remove the
    degenerate x = b and y = a walks, overlapping in the walk a->b->a->b;
    x = y / x = a / y = b are impossible in a simple loop-free graph).

    Physical plan: one wedge aggregation (paths2 = symmetric self-join
    pre-aggregated to distance-2 pair counts) + one edge join + one groupBy
    — the same shuffle shape as the triangle wedge join. Wedge fan-out is
    the deg^2 hub term; at web scale feed this a degree-capped or sparsified
    edge table (the reference's own use is inside sparsification pipelines).
    """
    e = und_edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    paths2 = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("x"))
        .join(e.select(F.col("src").alias("x"), F.col("dst").alias("y")), "x")
        .groupBy("a", "y")
        .agg(F.count("*").alias("c2"))
    )
    p3 = (
        paths2.join(e.select(F.col("src").alias("y"), F.col("dst").alias("b")), "y")
        .groupBy("a", "b")
        .agg(F.sum("c2").alias("p3"))
    )
    base = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    return (
        base.join(p3, ["a", "b"], "left")
        .join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            (F.coalesce(F.col("p3"), F.lit(0)) - F.col("da") - F.col("db") + 1)
            .cast("long")
            .alias("score"),
        )
    )


def chiba_nishizeki_triangle_score(und_edges: DataFrame) -> DataFrame:
    """ChibaNishizekiTriangleEdgeScore (``edgescores/
    ChibaNishizekiTriangleEdgeScore.cpp:17-100``): triangles containing each
    edge, computed there by the degree-bucketed Chiba-Nishizeki neighbor-
    marking sweep. The output contract is identical to TriangleEdgeScore
    (both count triangles per edge); the sequential bucket sweep exists to
    bound work per node, which the distributed plan already achieves with
    the degree-oriented wedge join — so this IS ``triangle_edge_score``
    (equality asserted in tests/test_round4d.py)."""
    return triangle_edge_score(und_edges)


def approx_avg_local_clustering(
    und_edges: DataFrame, trials: int, seed: int = 42
) -> float:
    """Schank-Wagner sampled average local clustering coefficient
    (``ClusteringCoefficient::approxAvgLocal``, global/
    ClusteringCoefficient.cpp:130-162): sample a node v uniformly among
    deg>=2 nodes, two distinct random neighbors of v, count the closure.
    The reference's Mersenne retry loops are replaced by equivalent
    deterministic portable-md5 draws (same distribution: uniform deg>=2
    node via rank index, uniform distinct ordered neighbor pair via the
    i / j0+(j0>=i) construction) — a pure function of (seed, trial), so
    the DuckDB oracle replays the exact estimate.

    Scale shape: trials-row probe table hash-joined against the
    rank-indexed eligible-node table and the per-node neighbor-rank
    table; no driver loop, no retry rounds.
    """
    from networkit_spark.operators.sampling import _draw
    from networkit_spark.plans.ids import dense_ids
    from pyspark.sql import Window

    spark = und_edges.sparkSession
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    elig = deg.filter(F.col("d") >= 2)
    k_elig = elig.count()
    if k_elig == 0:
        return 0.0
    idx = dense_ids(elig.select("node"), "node", id_col="idx")
    elig = elig.join(idx, "node")
    t = spark.range(trials).select(F.col("id").alias("k"))
    t = t.withColumn("ridx", _draw("cc", seed, F.col("k")) % k_elig)
    tv = t.join(elig, t["ridx"] == elig["idx"]).select("k", "node", "d")
    tv = tv.withColumn("i", _draw("ccu", seed, F.col("k")) % F.col("d"))
    tv = tv.withColumn("j0", _draw("ccw", seed, F.col("k")) % (F.col("d") - 1))
    tv = tv.select(
        "k",
        "node",
        "i",
        (F.col("j0") + F.when(F.col("j0") >= F.col("i"), 1).otherwise(0)).alias("j"),
    )
    w = Window.partitionBy("src").orderBy("dst")
    nbr = und_edges.select(
        "src", "dst", (F.row_number().over(w) - 1).alias("rn")
    )
    uw = (
        tv.join(
            nbr.select(F.col("src").alias("node"), F.col("dst").alias("u"),
                       F.col("rn").alias("i")),
            ["node", "i"],
        )
        .join(
            nbr.select(F.col("src").alias("node"), F.col("dst").alias("w"),
                       F.col("rn").alias("j")),
            ["node", "j"],
        )
    )
    closed = uw.join(
        und_edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_semi",
    ).count()
    return closed / trials


def clustering(und_edges: DataFrame, error: float = 0.01, seed: int = 42) -> float:
    """``networkit.globals.clustering`` (globals.pyx:107): exact average
    local clustering below 100 nodes, else the Schank-Wagner estimate with
    ceil(ln(10)/error^2) samples (fixed 90% confidence)."""
    import math

    n = und_edges.select("src").distinct().count()
    if n < 100:
        return avg_local_clustering_coefficient(und_edges)
    trials = math.ceil(math.log(10) / (error**2))
    return approx_avg_local_clustering(und_edges, trials, seed=seed)


def new_triangles(und_edges: DataFrame, new_und_edges: DataFrame) -> DataFrame:
    """Incremental triangle enumeration: triangles of the UPDATED graph that
    contain >= 1 edge of ``new_und_edges`` — exactly the triangles the batch
    created, since a triangle absent before the batch must contain a new
    edge. ``count(new_triangles) == T(G') - T(G)`` when the new edges were
    truly absent from G. Returns one row per triangle (a < b < c).

    Plan: each new undirected edge (u, v) joins the updated adjacency twice
    (common neighbors w); the sorted-triple ``distinct`` dedupes triangles
    that contain 2 or 3 new edges. Cost is O(|batch| x avg-degree) + one
    dedup shuffle — independent of |E|. A hub endpoint in the batch fans out
    its neighborhood; for hub-heavy batches pre-orient the adjacency the
    same way ``enumerate_triangles`` does.

    Both inputs symmetrized (both directions present), loop-free.
    """
    adj = und_edges.select("src", "dst")
    ne = (
        new_und_edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    wu = ne.join(
        adj.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u"
    )
    tri = wu.join(
        adj.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).filter((F.col("w") != F.col("u")) & (F.col("w") != F.col("v")))
    trip = tri.select(
        F.array_sort(F.array("u", "v", "w")).alias("t")
    ).distinct()
    return trip.select(
        F.col("t")[0].alias("a"), F.col("t")[1].alias("b"), F.col("t")[2].alias("c")
    )
