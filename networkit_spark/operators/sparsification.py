"""Edge scores + sparsification filters.

Reference: ``networkit/sparsification.pyx:26-1387`` + ``cpp/edgescores/`` /
``cpp/sparsification/``. The whole module family reduces to *compute an edge
score column, then filter by (possibly rank-normalized) threshold*:

- ``TriangleEdgeScore`` -> operators.triangles.triangle_edge_score
- ``RandomEdgeScore`` (:432)      -> :func:`random_edge_score` (seeded hash)
- ``LocalDegreeScore`` (:516)     -> :func:`local_degree_score`
- per-edge neighborhood Jaccard -> :func:`jaccard_edge_score`
- ``PrefixJaccardScore`` (:386)   -> :func:`prefix_jaccard_score` (best
  Jaccard over rank prefixes — the SimmelianSparsifierNonParametric substrate)
- ``EdgeScoreAsWeight`` / ``EdgeScoreBlender`` / ``GeometricMeanScore`` ->
  :func:`score_as_weight` / :func:`score_blender` / :func:`geometric_mean_score`
- ``EdgeScoreNormalizer`` (:196)  -> :func:`normalize_scores` (min-max)
- ``EdgeScoreLinearizer`` (:165)  -> :func:`linearize_scores` (rank/percentile)
- ``GlobalThresholdFilter`` (:664)-> :func:`global_threshold_filter`
- ``LocalFilterScore`` (:573, "local adaptive filtering" — keep the top
  ``ceil(deg^alpha)`` edges per node) -> :func:`local_filter_sparsify`

Edge keys are canonical (src < dst) for undirected scores; filters return
the surviving symmetrized edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.operators.triangles import triangle_edge_score


def _canon(und_edges: DataFrame) -> DataFrame:
    return und_edges.filter(F.col("src") < F.col("dst"))


def random_edge_score(und_edges: DataFrame, seed: int = 42) -> DataFrame:
    """(src, dst, score) uniform [0,1) deterministic per edge."""
    e = _canon(und_edges)
    h = F.xxhash64("src", "dst", F.lit(seed))
    return e.select(
        "src", "dst", ((F.abs(h) % 1_000_000_007) / 1_000_000_007.0).alias("score")
    )


def local_degree_score(und_edges: DataFrame) -> DataFrame:
    """LocalDegreeScore.cpp semantics shape: for edge (u, v), rank v among
    u's neighbors by degree (desc); score = 1 - log(rank)/log(deg(u));
    edge keeps the max over both directions. Preserves local hub structure
    ("local degree" backbone)."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.select("src", "dst")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
    )
    w = Window.partitionBy("src").orderBy(F.desc("dd"), F.asc("dst"))
    ranked = e.withColumn("rk", F.row_number().over(w))
    directed_score = ranked.select(
        "src",
        "dst",
        F.when(F.col("ds") > 1, 1.0 - F.log(F.col("rk").cast("double")) / F.log(F.col("ds").cast("double")))
        .otherwise(1.0)
        .alias("s"),
    )
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        directed_score.select(u, v, "s")
        .groupBy("u", "v")
        .agg(F.max("s").alias("score"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "score")
    )


def jaccard_edge_score(und_edges: DataFrame) -> DataFrame:
    """Per-edge Jaccard of endpoint neighborhoods (SimilarityScore family)."""
    from networkit_spark.operators.linkprediction import link_prediction_scores

    pairs = _canon(und_edges).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    scores = link_prediction_scores(und_edges, pairs=pairs)
    return scores.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("jaccard").alias("score")
    )


def normalize_scores(scores: DataFrame, invert: bool = False) -> DataFrame:
    """Min-max to [0,1] (EdgeScoreNormalizer)."""
    row = scores.agg(F.min("score"), F.max("score")).first()
    lo, hi = row[0], row[1]
    span = (hi - lo) or 1.0
    norm = (F.col("score") - lo) / span
    return scores.withColumn("score", (1.0 - norm) if invert else norm)


def linearize_scores(scores: DataFrame) -> DataFrame:
    """Replace scores by their percentile rank (EdgeScoreLinearizer).

    Distributed: rank each distinct score via the range-sort dense-id
    utility (no single-partition window), then join back; percentile of an
    edge = rank(first edge with that score) / (m - 1), matching
    ``percent_rank`` tie semantics.
    """
    from networkit_spark.plans.ids import global_min_rank

    m = scores.count()
    if m <= 1:
        return scores.withColumn("score", F.lit(0.0))
    ranked = global_min_rank(scores, "score", rank_col="_grk")
    return ranked.withColumn(
        "score", (F.col("_grk") - 1) / F.lit(float(m - 1))
    ).drop("_grk")


def global_threshold_filter(
    und_edges: DataFrame, scores: DataFrame, threshold: float, above: bool = True
) -> DataFrame:
    """Keep edges with score >= threshold (or <=). Returns symmetrized table.
    Ref: ``GlobalThresholdFilter`` (sparsification.pyx:664)."""
    cond = F.col("score") >= threshold if above else F.col("score") <= threshold
    keep = scores.filter(cond).select("src", "dst")
    canon = _canon(und_edges).join(keep, ["src", "dst"], "left_semi")
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def scan_edge_score(und_edges: DataFrame) -> DataFrame:
    """SCAN structural similarity per edge:
    ``(tri(u,v) + 1) / sqrt((deg(u)+1) * (deg(v)+1))``
    (``cpp/sparsification/SCANStructuralSimilarityScore.cpp:7-21``).

    One wedge-join for the triangle counts (degree-ordered, skew-safe) plus
    two broadcast-sized degree joins — no all-pairs work, scale-safe.
    """
    tri = triangle_edge_score(und_edges)
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    return (
        tri.join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            "src",
            "dst",
            (
                (F.col("score") + 1)
                / F.sqrt((F.col("ds") + 1.0) * (F.col("dd") + 1.0))
            ).alias("score"),
        )
    )


def chance_corrected_triangle_score(und_edges: DataFrame, n: int | None = None) -> DataFrame:
    """Chance-corrected triangle score
    (``cpp/sparsification/ChanceCorrectedTriangleScore.cpp:17-33``):
    ``tri * (n-2) / ((deg(u)-1) * (deg(v)-1))`` when tri > 0; 1 when either
    endpoint has degree 1; else 0."""
    if n is None:
        n = (
            und_edges.select(F.col("src").alias("x"))
            .union(und_edges.select(F.col("dst")))
            .distinct()
            .count()
        )
    tri = triangle_edge_score(und_edges)
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    return (
        tri.join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(
            "src",
            "dst",
            F.when(
                F.col("score") > 0,
                F.col("score") * F.lit(float(n - 2))
                / ((F.col("ds") - 1.0) * (F.col("dd") - 1.0)),
            )
            .when((F.col("ds") == 1) | (F.col("dd") == 1), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


def multiscale_score(und_edges: DataFrame) -> DataFrame:
    """Multiscale backbone score (``cpp/sparsification/MultiscaleScore.cpp``):
    per direction (u -> v) normalize w(u,v) by u's weighted degree and score
    the edge with ``1 - (1 - p)^(deg(u) - 1)`` (null model: normalized
    weights of a degree-k node are uniform); the edge keeps the max over
    both directions. Pure groupBy + join SQL — scale-safe."""
    s = und_edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("wsum"), F.count("*").alias("d")
    )
    directed = (
        und_edges.join(s.withColumnRenamed("node", "src"), "src")
        .select(
            "src",
            "dst",
            (
                1.0
                - F.pow(
                    # wsum = 0 (all-zero weights, e.g. triangle-count input
                    # on a triangle-free node): normalized weight is 0, not
                    # a division error (ANSI mode) — score contribution 0
                    1.0 - F.when(F.col("wsum") > 0, F.col("weight") / F.col("wsum")).otherwise(0.0),
                    F.col("d").cast("double") - 1.0,
                )
            ).alias("p"),
        )
    )
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        directed.select(u, v, "p")
        .groupBy("u", "v")
        .agg(F.max("p").alias("score"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "score")
    )


def simmelian_overlap_score(und_edges: DataFrame, max_rank: int = 10) -> DataFrame:
    """Simmelian overlap (``cpp/sparsification/SimmelianOverlapScore.cpp`` +
    ``SimmelianScore.cpp:17-46``): rank each node's neighbors by per-edge
    triangle count (competition ranking, 0-based, strongest first); the
    score of edge (u, v) = number of common neighbors ranked <= max_rank by
    BOTH endpoints.

    Physical plan: one triangle wedge-join, a per-node window rank (keys are
    node ids — no global sort), a rank filter (caps each node's survivor
    list at <= max_rank-ish, bounding the semi-join fan-out), then a
    common-neighbor join on the capped lists. The rank cap is the hot-key
    guard: a 10^7-degree hub contributes at most its top ranks."""
    tri = triangle_edge_score(und_edges)
    directed = tri.select("src", "dst", "score").union(
        tri.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "score")
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"))
    top = (
        directed.withColumn("rk", F.rank().over(w) - 1)
        .filter(F.col("rk") <= max_rank)
        .select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    )
    e = _canon(und_edges).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    common = (
        e.join(top.select(F.col("node").alias("u"), F.col("nbr")), "u")
        .filter(F.col("nbr") != F.col("v"))
        .join(
            top.select(F.col("node").alias("v"), F.col("nbr")),
            ["v", "nbr"],
            "left_semi",
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
    )
    return (
        e.join(common, ["u", "v"], "left")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("score"),
        )
    )


def local_similarity_score(und_edges: DataFrame) -> DataFrame:
    """Local-similarity sparsification exponent
    (``cpp/sparsification/LocalSimilarityScore.cpp:17-77``): per directed
    edge sim = tri / (deg(u) + deg(v) - tri); rank u's neighbors by sim
    descending (reference tie order is its sort order; we tie-break by
    neighbor id ascending, deterministically, in BOTH engine and oracle);
    exponent e = 1 - log(rank)/log(deg(u)) (1 when deg(u) <= 1); edge keeps
    max over both directions."""
    tri = triangle_edge_score(und_edges)
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    sym = tri.select("src", "dst", "score").union(
        tri.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "score")
    )
    e = (
        sym.join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .withColumn(
            "sim",
            F.col("score") / (F.col("ds") + F.col("dd") - F.col("score")),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    ranked = e.withColumn("rk", F.row_number().over(w)).select(
        "src",
        "dst",
        F.when(
            F.col("ds") > 1,
            1.0 - F.log(F.col("rk").cast("double")) / F.log(F.col("ds").cast("double")),
        )
        .otherwise(1.0)
        .alias("s"),
    )
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        ranked.select(u, v, "s")
        .groupBy("u", "v")
        .agg(F.max("s").alias("score"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "score")
    )


def local_filter_sparsify(und_edges: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Keep each node's top ``ceil(deg^alpha)`` incident edges by degree of
    the other endpoint (LocalFilterScore / "local sparsification" shape);
    an edge survives if either endpoint keeps it."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.select("src", "dst", "weight")
        .join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    w = Window.partitionBy("src").orderBy(F.desc("dd"), F.asc("dst"))
    kept = (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.ceil(F.pow(F.col("ds"), F.lit(alpha))))
        .select("src", "dst", "weight")
    )
    u = F.least("src", "dst").alias("src")
    v = F.greatest("src", "dst").alias("dst")
    canon = kept.select(u, v, "weight").distinct()
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def forest_fire_score(
    und_edges: DataFrame,
    n_nodes: int,
    n_fires: int = 32,
    pf: float = 0.4,
    rounds: int = 4,
) -> DataFrame:
    """(src, dst, score) with src < dst — deterministic synchronous variant
    of ``ForestFireScore.cpp:24-80``: fires start at hash-chosen nodes,
    spread for ``rounds`` supersteps, each frontier->unvisited edge burns
    independently with probability ``pf`` (the batched binomial analog of
    the reference's sequential geometric burning; the reference is
    RNG-driven and OpenMP-nondeterministic, so this variant trades exact
    parity for reproducibility). Score = burn count / max burn count.

    All fires advance together: state is (fire, node) visited pairs, one
    frontier-x-edges shuffle per superstep regardless of fire count. Burn
    decisions use the portable 60-bit md5 hash (== DuckDB
    ``('0x'||substr(md5(x),1,15))::BIGINT``), so the whole process unrolls
    to an ANSI-SQL oracle. Node ids are assumed continuous [0, n).
    """
    spark = und_edges.sparkSession
    threshold = int(pf * float(2**60))
    fires = spark.range(n_fires).select(F.col("id").alias("fire"))
    start = fires.select(
        "fire",
        F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit("ff|"), F.col("fire").cast("string"))), 1, 15), 16, 10)
            .cast("decimal(20,0)")
            .cast("long"),
            F.lit(n_nodes),
        ).alias("node"),
    )
    visited = start.select("fire", "node").distinct()
    frontier = visited
    burn_batches = []
    e = und_edges.filter(F.col("src") != F.col("dst")).select("src", "dst").persist()
    e.count()
    for r in range(rounds):
        cand = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .join(visited.withColumnRenamed("node", "dst"), ["fire", "dst"], "left_anti")
        )
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.lit("ffb"), F.col("fire"), F.lit(r), F.col("src"), F.col("dst"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("decimal(20,0)").cast("long")
        burns = cand.filter(h < F.lit(threshold)).select("fire", "src", "dst")
        burns = burns.persist()
        burns.count()
        burn_batches.append(burns)
        new_nodes = burns.select("fire", F.col("dst").alias("node")).distinct()
        visited = visited.unionByName(new_nodes).distinct().persist()
        visited.count()
        frontier = new_nodes
    if burn_batches:
        all_burns = burn_batches[0]
        for b in burn_batches[1:]:
            all_burns = all_burns.unionByName(b)
    else:
        all_burns = spark.createDataFrame([], "fire long, src long, dst long")
    counts = (
        all_burns.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("burns"))
    )
    mx = counts.agg(F.max("burns")).first()[0] or 1
    canon = (
        und_edges.filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .join(counts, ["src", "dst"], "left")
        .fillna({"burns": 0})
    )
    e.unpersist()
    return canon.select("src", "dst", (F.col("burns") / F.lit(float(mx))).alias("score"))


def score_as_weight(
    scored: DataFrame,
    squared: bool = False,
    offset: float = 1.0,
    factor: float = 1.0,
) -> DataFrame:
    """``EdgeScoreAsWeight.cpp:16-34``: weight = offset + factor * score
    (score squared first when ``squared``). Pure column expression."""
    s = F.col("score") * F.col("score") if squared else F.col("score")
    return scored.select(
        "src", "dst", (F.lit(offset) + F.lit(factor) * s).alias("weight")
    )


def score_blender(
    scores0: DataFrame, scores1: DataFrame, selection: DataFrame
) -> DataFrame:
    """``EdgeScoreBlender.cpp:17-29``: per edge pick ``scores1`` where the
    boolean ``selection(src, dst, sel)`` is true else ``scores0``. Two
    co-keyed joins on the canonical edge key (broadcast-eligible when one
    side is a small override set)."""
    return (
        scores0.select("src", "dst", F.col("score").alias("s0"))
        .join(scores1.select("src", "dst", F.col("score").alias("s1")), ["src", "dst"])
        .join(selection, ["src", "dst"])
        .select(
            "src",
            "dst",
            F.when(F.col("sel"), F.col("s1")).otherwise(F.col("s0")).alias("score"),
        )
    )


def geometric_mean_score(und_edges: DataFrame, scored: DataFrame | None = None) -> DataFrame:
    """``GeometricMeanScore.cpp:18-41``: score(e=(u,v)) = att(e) /
    sqrt(nodeSum(u) * nodeSum(v)) where nodeSum is the sum of the attribute
    over a node's incident edges (0 stays 0). One symmetrized groupBy for
    the node sums + two joins — no per-row Python."""
    att = scored if scored is not None else triangle_edge_score(und_edges)
    sums = (
        att.select(F.col("src").alias("node"), "score")
        .union(att.select(F.col("dst").alias("node"), "score"))
        .groupBy("node")
        .agg(F.sum("score").alias("ns"))
    )
    return (
        att.join(sums.select(F.col("node").alias("src"), F.col("ns").alias("su")), "src")
        .join(sums.select(F.col("node").alias("dst"), F.col("ns").alias("sv")), "dst")
        .select(
            "src",
            "dst",
            F.when(
                F.col("score") > 0,
                F.col("score") / F.sqrt(F.col("su") * F.col("sv")),
            )
            .otherwise(0.0)
            .alias("score"),
        )
    )


def prefix_jaccard_score(und_edges: DataFrame, scored: DataFrame | None = None) -> DataFrame:
    """``PrefixJaccardScore.cpp:20-150``: rank each node's incident edges by
    attribute descending (competition rank — ties share the count of
    strictly-greater entries; the partner endpoint occupies a rank but is
    skipped in the sweep); for each edge (u, v) sweep rank levels ascending,
    maintaining the prefix neighbor sets of both endpoints, and return the
    best Jaccard ``common / (uOnly + vOnly + common)`` over all levels.
    Default attribute: per-edge triangle count (the
    SimmelianSparsifierNonParametric substrate, ``sparsification.pyx:386``).

    Physical plan — the sequential two-pointer merge becomes set algebra:
    a per-node window rank, a full-outer join pairing the two endpoints'
    neighbor lists per edge, an event encoding (a common neighbor counts for
    its earlier side on [min_rank, max_rank) then flips to common — the
    ``++commonNeighbors; --vNeighbors`` bookkeeping), and one per-edge
    RANGE-cumulative window whose running Jaccard is maxed. Work is
    sum(deg(u)+deg(v)) over edges — the same order as the wedge join that
    produced the triangle attribute; per-edge window keys bound the sort."""
    att = scored if scored is not None else triangle_edge_score(und_edges)
    inc = att.select(F.col("src").alias("node"), F.col("dst").alias("nbr"), "score").union(
        att.select(F.col("dst").alias("node"), F.col("src").alias("nbr"), "score")
    )
    wr = Window.partitionBy("node").orderBy(F.desc("score"))
    inc = inc.withColumn("rk", F.rank().over(wr) - 1).select("node", "nbr", "rk")
    e = att.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    un = (
        e.join(inc.withColumnRenamed("node", "u"), "u")
        .filter(F.col("nbr") != F.col("v"))
        .select("u", "v", "nbr", F.col("rk").alias("ru"))
    )
    vn = (
        e.join(inc.withColumnRenamed("node", "v"), "v")
        .filter(F.col("nbr") != F.col("u"))
        .select("u", "v", "nbr", F.col("rk").alias("rv"))
    )
    both = un.join(vn, ["u", "v", "nbr"], "full")
    u_first = F.col("ru") <= F.col("rv")  # min-side tie goes to u (net-neutral)
    events = (
        both.filter(F.col("rv").isNull()).select(
            "u", "v", F.col("ru").alias("r"), F.lit(1).alias("du"), F.lit(0).alias("dv"), F.lit(0).alias("dc")
        )
        .union(
            both.filter(F.col("ru").isNull()).select(
                "u", "v", F.col("rv").alias("r"), F.lit(0), F.lit(1), F.lit(0)
            )
        )
        .union(
            both.filter(F.col("ru").isNotNull() & F.col("rv").isNotNull()).select(
                "u", "v", F.least("ru", "rv").alias("r"),
                F.when(u_first, 1).otherwise(0),
                F.when(u_first, 0).otherwise(1),
                F.lit(0),
            )
        )
        .union(
            both.filter(F.col("ru").isNotNull() & F.col("rv").isNotNull()).select(
                "u", "v", F.greatest("ru", "rv").alias("r"),
                F.when(u_first, -1).otherwise(0),
                F.when(u_first, 0).otherwise(-1),
                F.lit(1),
            )
        )
    )
    wc = (
        Window.partitionBy("u", "v")
        .orderBy("r")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    jac = events.select(
        "u",
        "v",
        (
            F.sum("dc").over(wc)
            / (F.sum("du").over(wc) + F.sum("dv").over(wc) + F.sum("dc").over(wc))
        ).alias("j"),
    )
    best = jac.groupBy("u", "v").agg(F.max("j").alias("score"))
    return (
        e.join(best, ["u", "v"], "left")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
        )
    )


def constant_score(edges: DataFrame, value: float = 1.0) -> DataFrame:
    """ConstantScore (sparsification.py reference :1599-1617): the same
    value on every edge — the sanity-check attributizer."""
    return edges.select("src", "dst", F.lit(float(value)).alias("score"))


def jaccard_distance(und_edges: DataFrame) -> DataFrame:
    """JaccardDistance (distance/JaccardDistance.cpp:39-41): per edge
    1 - t/(deg(u)+deg(v)-t). ``jaccard_edge_score`` IS the similarity form
    (JaccardSimilarityAttributizer = 1 - this), since for an edge the
    common-neighbor count equals its triangle count."""
    return jaccard_edge_score(und_edges).select(
        "src", "dst", (F.lit(1.0) - F.col("score")).alias("score")
    )
