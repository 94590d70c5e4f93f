"""ANF — approximate neighborhood function / effective diameter.

Reference: ``cpp/distance/EffectiveDiameterApproximation.cpp`` (defaults
``k=64, r=7``, header :37): per node, k Flajolet-Martin bitmasks, one bit set
at geometric position at init; each hop ORs every node's masks with its
neighbors' (``mCurr[v][j] |= mPrev[u][j]``); estimated reachable count =
``2^(mean lowest-unset-bit) / 0.77351``; effective diameter = hops until the
estimate reaches ``ratio * n``. Also ``NeighborhoodFunction(Approximation)``
and ``HopPlotApproximation`` — all the same loop, different readouts.

Differences from the reference (documented, deliberate):
- init is hash-deterministic (trailing zeros of ``xxhash64(node, j)``)
  instead of ``Aux::Random`` — reproducible under any parallelism; the
  estimator's distribution is identical (geometric(1/2) positions);
- per-hop state is k long columns aggregated with ``bit_or`` — the OR-gather
  is exactly the PageRank message shuffle with a different combiner, so the
  same one-shuffle-per-superstep profile; works on any number of components
  (the reference throws on more than one).

The exact twin (:func:`effective_diameter_exact`) runs multi-source BFS —
usable on small graphs and as the test oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import aqe_disabled

CORRECTION = 0.77351


def _init_masks(nodes: DataFrame, k: int, n_bits: int) -> DataFrame:
    """mask_j(u): one bit at position = trailing zeros of xxhash64(u, j),
    capped at n_bits (bit dropped beyond, like the reference's cap)."""
    cap = 1 << (n_bits - 1)
    cols = []
    for j in range(k):
        h = F.xxhash64(F.col("id"), F.lit(j))
        # h & -h isolates the lowest set bit == 2^(trailing zeros); trailing
        # zeros of a uniform hash are geometric(1/2) — the FM init position.
        low = h.bitwiseAND(-h)
        cols.append(
            F.when((h != 0) & (low > 0) & (low <= F.lit(cap)), low)
            .otherwise(F.lit(0).cast("long"))
            .alias(f"m{j}")
        )
    return nodes.select(F.col("id").alias("node"), *cols)


def _estimate(masks: DataFrame, k: int) -> F.Column:
    """Per-row estimated reachable count: 2^(mean lowest-zero-bit)/0.77351."""
    lows = []
    for j in range(k):
        m = F.col(f"m{j}")
        # lowest zero bit index: trailing ones count = bit_count(m & ~(m+1))
        # (Column.__invert__ is logical NOT — must use bitwise_not for ints)
        lows.append(
            F.bit_count(
                m.bitwiseAND(F.bitwise_not(m + F.lit(1).cast("long")))
            ).cast("double")
        )
    mean_b = sum(lows) / F.lit(float(k))
    return F.pow(F.lit(2.0), mean_b) / CORRECTION


def neighborhood_function_approx(
    und_edges: DataFrame,
    nodes: DataFrame | None = None,
    k: int = 32,
    r: int = 7,
    max_h: int = 64,
) -> list[tuple[int, float]]:
    """[(h, estimated #pairs within h hops)] until saturation.

    Ref: ``NeighborhoodFunctionApproximation`` — the global readout
    (sum of per-node estimates) per hop.
    """
    spark = und_edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
        n = nodes.count()
        n_bits = min(62, int(math.ceil(math.log2(max(2, n)))) + r)
        e = und_edges.select("src", "dst").persist()
        e.count()
        masks = _init_masks(nodes, k, n_bits).localCheckpoint(eager=True)
        out: list[tuple[int, float]] = []
        prev_sum = None
        for h in range(1, max_h + 1):
            nbr = (
                e.join(masks.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(*[F.bit_or(f"m{j}").alias(f"n{j}") for j in range(k)])
            )
            masks = (
                masks.join(nbr, "node", "left")
                .select(
                    "node",
                    *[
                        F.coalesce(
                            F.col(f"m{j}").bitwiseOR(F.col(f"n{j}")), F.col(f"m{j}")
                        ).alias(f"m{j}")
                        for j in range(k)
                    ],
                )
                .localCheckpoint(eager=True)
            )
            est = masks.select(_estimate(masks, k).alias("e")).agg(F.sum("e")).first()[0]
            out.append((h, float(est)))
            if prev_sum is not None and abs(est - prev_sum) < 1e-9:
                break  # saturated: all masks stable
            prev_sum = est
        e.unpersist()
        return out


def effective_diameter_approx(
    und_edges: DataFrame,
    nodes: DataFrame | None = None,
    ratio: float = 0.9,
    k: int = 32,
    r: int = 7,
    max_h: int = 64,
) -> float:
    """Smallest h where the estimated reachable-pair count reaches ``ratio``
    of its saturated value, linearly interpolated between hops (the standard
    ANF effective-diameter readout)."""
    nf = neighborhood_function_approx(und_edges, nodes, k, r, max_h)
    total = nf[-1][1]
    target = ratio * total
    prev_h, prev_v = 0, 0.0
    for h, v in nf:
        if v >= target:
            if v == prev_v:
                return float(h)
            return prev_h + (target - prev_v) / (v - prev_v)
        prev_h, prev_v = h, v
    return float(nf[-1][0])


def effective_diameter_exact(
    und_edges: DataFrame, nodes: DataFrame | None = None, ratio: float = 0.9
) -> float:
    """Exact readout via multi-source BFS (test oracle; ``EffectiveDiameter``
    exact variant in the reference). O(n * m) — small graphs only."""
    from networkit_spark.operators.distance import multi_source_bfs

    nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
    dists = multi_source_bfs(und_edges, nodes)
    counts = sorted(
        (r["dist"], r["cnt"])
        for r in dists.groupBy("dist").agg(F.count("*").alias("cnt")).collect()
    )
    total = sum(c for _, c in counts)
    target = ratio * total
    acc = 0
    prev_h, prev_acc = 0, 0
    for h, c in counts:
        acc += c
        if acc >= target:
            if acc == prev_acc:
                return float(h)
            return prev_h + (target - prev_acc) / (acc - prev_acc) * (h - prev_h)
        prev_h, prev_acc = h, acc
    return float(counts[-1][0]) if counts else 0.0


def neighborhood_function_heuristic(
    und_edges: DataFrame,
    nodes: DataFrame | None = None,
    n_samples: int | None = None,
    strategy: str = "split",
    seed: int = 42,
) -> list[tuple[int, int]]:
    """Sampled-BFS neighborhood function
    (``distance/NeighborhoodFunctionHeuristic.cpp:42-129``): run BFS from
    ``n_samples`` start nodes, histogram the hop distances, scale by
    ``n / n_samples``, accumulate, and pin the endpoints exactly
    (``result[0] = 2m``, ``result[dia-1] = n(n-1)``, ``:75-100``).

    Default sample count matches the reference: ``ceil(max(0.15 n,
    sqrt(m)))``. Strategies (``:106-129``): ``split`` sorts nodes by degree
    and takes every (n // n_samples)-th — fully deterministic here because
    degree ties break by node id (the reference's unstable sort leaves ties
    unspecified); ``random`` uses a portable seeded md5 draw WITHOUT
    replacement (reference draws with replacement — documented divergence).

    Distributed shape: source selection is a distributed range-rank
    (``plans/ids.dense_ids`` over a packed (degree, node) key — no global
    single-partition window), then one batched multi-source BFS wave for
    all samples, one groupBy histogram (diameter-sized), and O(diameter)
    driver-side accumulation. Unlike the reference, disconnected inputs are
    accepted (unreached pairs simply never enter the histogram).

    Returns ``[(h, N(h))]`` for ``h = 1..diameter``.
    """
    from networkit_spark.operators.distance import diameter_ifub, spsp
    from networkit_spark.plans.ids import dense_ids

    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst").persist()
    e.count()
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select("id").persist()
    n = nodes.count()
    m = e.count() // 2
    if n_samples is None:
        n_samples = int(math.ceil(max(0.15 * n, math.sqrt(m))))
    n_samples = max(1, min(n_samples, n))

    deg = (
        nodes.join(
            e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg")),
            "id",
            "left",
        ).select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
    )
    if strategy == "split":
        # packed sort key (degree, node): ranks = ascending-degree order,
        # ties by node id; every (n // n_samples)-th node is a start node
        sw = max(1, n // n_samples)
        keyed = deg.select(
            (F.col("deg").cast("long") * F.lit(1 << 33) + F.col("id")).alias("key")
        )
        ranked = dense_ids(keyed, "key", id_col="rk", distinct=False)
        sources = (
            ranked.filter(
                (F.col("rk") % sw == 0) & (F.col("rk") < n_samples * sw)
            )
            .select(
                (F.col("key") % F.lit(1 << 33)).cast("long").alias("id")
            )
        )
    elif strategy == "random":
        drawn = deg.select(
            "id",
            F.md5(F.concat_ws(":", F.lit("nfh"), F.lit(seed), F.col("id"))).alias("h"),
        )
        sources = drawn.orderBy("h").limit(n_samples).select("id")
    else:
        raise ValueError("strategy must be 'split' or 'random'")

    dia = diameter_ifub(e, nodes)
    dist = spsp(e, sources, nodes.select("id"))
    hist = {
        int(r["dist"]): int(r["c"])
        for r in dist.filter(F.col("dist") >= 1)
        .groupBy("dist")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    e.unpersist()
    nodes.unpersist()

    if dia <= 0:
        return []
    result = [0] * dia
    result[0] = 2 * m
    if dia >= 2:
        result[dia - 1] = n * (n - 1)
    norm = n / float(n_samples)
    for d in range(2, dia):
        result[d - 1] = int(math.floor(hist.get(d, 0) * norm + 0.5)) + result[d - 2]
    return [(h + 1, result[h]) for h in range(dia)]


def hyperball_harmonic(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    k: int = 32,
    r: int = 7,
    max_h: int = 64,
) -> DataFrame:
    """HyperBall-style approximate harmonic centrality — the algorithm the
    public WebGraph / cc-webgraph pipeline runs to produce Common Crawl's
    host rankings at 10^9-host scale (Boldi & Vigna, "In-Core Computation
    of Geometric Centralities with HyperBall", 2013):

        harmonic(v) = sum_u 1/d(u,v)
                    = sum_{t>=1} (|B_in(v,t)| - |B_in(v,t-1)|) / t

    with the incoming-ball sizes |B_in(v,t)| estimated by per-node
    Flajolet-Martin sketches (the reference's ANF machinery,
    ``EffectiveDiameterApproximation.cpp``). The recurrence
    ``B_in(v,t) = {v} ∪ U_{w->v} B_in(w,t-1)`` gathers along the ORIGINAL
    edge direction (v ORs its in-neighbors' balls), so the message join is
    src->dst exactly like PageRank. Same one-OR-gather-shuffle-per-hop
    profile as PageRank; hash-deterministic init, so results are
    reproducible under any parallelism. Returns (node, score).

    Accuracy is the FM sketch's (~1.04/sqrt(k) relative std per ball);
    use the exact multi-source BFS (``operators.closeness.closeness``)
    when n is small enough to afford it."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        n = nodes.count()
        n_bits = min(62, int(math.ceil(math.log2(max(2, n)))) + r)
        # loop-invariant edge table pre-partitioned on the per-hop join key
        # (the PageRank contrib recipe): with the shuffle_hash hint below,
        # only the sketch state shuffles per hop — never the m-row edges
        shuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        fwd = edges.select("src", "dst").repartition(shuf, "src").persist()
        fwd.count()
        mask_cols = [f"m{j}" for j in range(k)]
        state = _init_masks(nodes, k, n_bits)
        state = state.select(
            "node", *mask_cols,
            _estimate(state, k).alias("prev_est"),
            F.lit(0.0).alias("acc"),
        ).localCheckpoint(eager=True)
        prev_sum = None
        for h in range(1, max_h + 1):
            nbr = (
                fwd.join(
                    state.withColumnRenamed("node", "src").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(*[F.bit_or(f"m{j}").alias(f"n{j}") for j in range(k)])
            )
            merged = state.join(nbr, "node", "left").select(
                "node",
                *[
                    F.coalesce(
                        F.col(f"m{j}").bitwiseOR(F.col(f"n{j}")), F.col(f"m{j}")
                    ).alias(f"m{j}")
                    for j in range(k)
                ],
                "prev_est", "acc",
            )
            est = _estimate(merged, k)
            state = merged.select(
                "node", *mask_cols,
                est.alias("prev_est"),
                (
                    F.col("acc")
                    + F.greatest(est - F.col("prev_est"), F.lit(0.0)) / float(h)
                ).alias("acc"),
            ).localCheckpoint(eager=True)
            tot = state.agg(F.sum("prev_est")).first()[0]
            if prev_sum is not None and abs(tot - prev_sum) < 1e-9:
                break  # every incoming ball saturated
            prev_sum = tot
        fwd.unpersist()
        return state.select("node", F.col("acc").alias("score"))
