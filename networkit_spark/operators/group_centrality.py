"""Group centrality: greedy group-degree maximization.

Reference: ``cpp/centrality/GroupDegree.cpp`` (lazy-greedy with a bucket
priority queue) — greedily grow a k-node group S maximizing
``|N(S) \\ S|`` (``countGroupNodes=False``, the ctor default) or
``|N(S) ∪ S|`` (True). The greedy gives the standard (1 - 1/e)
approximation for this submodular coverage objective.

Distributed form: synchronous greedy — each of the k rounds recomputes every
candidate's marginal gain with one anti-join + agg (no lazy queue; k is
small, each round is one shuffle), argmax with deterministic min-node-id tie
break (the reference's heap order is unspecified under ties; ours is pinned
so runs are reproducible and SQL-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_degree(
    und_edges: DataFrame,
    nodes: DataFrame,
    k: int,
    count_group: bool = False,
) -> tuple[DataFrame, int]:
    """((rank, node) members in selection order, score)."""
    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst").persist()
    e.count()
    sel: list[int] = []
    reach = spark.createDataFrame([], "id long")
    for r in range(k):
        cand = nodes.select(F.col("id").alias("src"))
        if sel:
            cand = cand.filter(~F.col("src").isin(sel))
        # marginal gain = # neighbors not yet reachable
        new_nbrs = (
            e.join(cand, "src", "left_semi")
            .join(reach.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .groupBy("src")
            .agg(F.count("*").alias("g"))
        )
        gains = cand.join(new_nbrs, "src", "left").fillna({"g": 0})
        if count_group:
            bonus = cand.join(reach.withColumnRenamed("id", "src"), "src", "left_anti").select(
                "src", F.lit(1).alias("b")
            )
            gains = gains.join(bonus, "src", "left").fillna({"b": 0}).select(
                "src", (F.col("g") + F.col("b")).alias("g")
            )
        pick = gains.orderBy(F.desc("g"), F.asc("src")).first()["src"]
        sel.append(int(pick))
        reach = (
            reach.union(spark.createDataFrame([(int(pick),)], "id long"))
            .union(e.filter(F.col("src") == pick).select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
    if count_group:
        score = reach.count()
    else:
        score = reach.filter(~F.col("id").isin(sel)).count()
    e.unpersist()
    members = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sel)], "rank long, node long"
    )
    return members, score


def _contrib(d_col):
    """Harmonic contribution of one distance value: 1/d for d > 0 else 0
    (GroupHarmonicCloseness.cpp:622-631 skips dist 0)."""
    return F.when(d_col > 0, F.lit(1.0) / d_col).otherwise(F.lit(0.0))


def group_closeness_greedy(
    und_edges: DataFrame,
    nodes: DataFrame,
    k: int,
    mode: str = "harmonic",
    n_candidates: int = 8,
    max_bfs_rounds: int = 15,
) -> tuple[DataFrame, float]:
    """Greedy group closeness over a pruned candidate pool.

    Reference semantics: ``cpp/centrality/GroupCloseness.cpp`` (greedy
    farness improvement; ``scoreOfGroup`` at ``GroupCloseness.hpp:103-112``
    = (n - |S|) / sum_v d(S, v)) and ``GroupHarmonicCloseness.cpp:622-631``
    (score = sum_{d(S,v) > 0} 1 / d(S, v)). Both references are
    approximation algorithms (pruned/lazy greedy); this one prunes to the
    ``n_candidates`` highest-degree nodes (the reference's own starting
    heuristic, GroupCloseness.cpp:80-83), then runs exact greedy within the
    pool:

    1. ONE batched multi-source BFS gives d(c, v) for every candidate at
       once (source-tagged frontier — one shuffle per BFS level total, not
       per candidate).
    2. Each of the k rounds scores every candidate's exact marginal gain
       with a single join + agg against the current group-distance table
       d_S, argmax with gains rounded to 9 decimals and min-node-id tie
       break (pinned, SQL-checkable).

    mode='harmonic': gain = sum_v [contrib(min(d_S, d_c)) - contrib(d_S)];
    mode='closeness': gain = sum_v [min(d_S, cap) - min(d_S, d_c, cap)],
    cap = n (unreached penalty).

    Returns ((rank, node) in pick order, scoreOfGroup of the final group).
    """
    from .distance import multi_source_bfs

    spark = und_edges.sparkSession
    n = nodes.count()
    cap = float(n)
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("dg"))
    cands = [
        r["node"]
        for r in deg.orderBy(F.desc("dg"), F.asc("node")).limit(n_candidates).collect()
    ]
    cd = multi_source_bfs(
        und_edges, spark.createDataFrame([(c,) for c in cands], "id long"),
        max_rounds=max_bfs_rounds,
    ).persist()
    cd.count()
    sel: list[int] = []
    ds = None  # (node, d); absent row = unreached by S
    for _ in range(k):
        pool = cd.filter(~F.col("source").isin(sel)) if sel else cd
        if ds is None:
            if mode == "harmonic":
                gain = F.sum(_contrib(F.col("dist")))
            else:
                gain = F.sum(F.lit(cap) - F.least(F.col("dist").cast("double"), F.lit(cap)))
            gains = pool.groupBy("source").agg(gain.alias("g"))
        else:
            j = pool.join(ds, "node", "left")
            dS = F.coalesce(F.col("d").cast("double"), F.lit(1e18))
            new_d = F.least(dS, F.col("dist").cast("double"))
            if mode == "harmonic":
                gain = F.sum(_contrib(new_d) - _contrib(F.when(F.col("d").isNotNull(), F.col("d").cast("double")).otherwise(F.lit(0.0))))
            else:
                gain = F.sum(
                    F.least(dS, F.lit(cap)) - F.least(new_d, F.lit(cap))
                )
            gains = j.groupBy("source").agg(gain.alias("g"))
        pick = gains.select(
            "source", F.round("g", 9).alias("g")
        ).orderBy(F.desc("g"), F.asc("source")).first()["source"]
        sel.append(int(pick))
        picked = cd.filter(F.col("source") == pick).select("node", F.col("dist").alias("dp"))
        if ds is None:
            ds = picked.select("node", F.col("dp").alias("d"))
        else:
            ds = (
                ds.join(picked, "node", "full")
                .select(
                    "node",
                    F.least(
                        F.coalesce(F.col("d"), F.lit(2**62)),
                        F.coalesce(F.col("dp"), F.lit(2**62)),
                    ).alias("d"),
                )
            )
        ds = ds.localCheckpoint(eager=True)
    if mode == "harmonic":
        score = ds.agg(F.sum(_contrib(F.col("d").cast("double")))).first()[0] or 0.0
    else:
        sum_d = ds.agg(F.sum("d")).first()[0] or 0
        score = (float(n - len(sel)) / sum_d) if sum_d > 0 else 0.0
    cd.unpersist()
    members = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(sel)], "rank long, node long"
    )
    return members, float(score)


def approx_group_betweenness(
    und_edges: DataFrame,
    nodes: DataFrame,
    group_size: int,
    epsilon: float = 0.5,
    seed: int = 42,
    samples: int | None = None,
    max_rounds: int = 10_000,
) -> list[int]:
    """ApproxGroupBetweenness (``centrality/ApproxGroupBetweenness.cpp``;
    Mahmoody et al., "Scalable Betweenness Centrality Maximization via
    Sampling"): sample ``ceil(k ln n / eps^2)`` (s, t) pairs, pick ONE
    shortest path per pair (backward from t, uniform predecessor at each
    level), and greedily pick the k nodes covering the most sampled paths.

    Distributed shape: sampling is the portable md5 draw (replayable in
    any engine); all samples share ONE multi-source Brandes BFS
    (``bfs_with_sigma``) from the distinct sources; the backward walks
    advance level-synchronously for every sample at once (hash-argmin picks
    a uniform predecessor — the reference draws from its RNG, same
    distribution, different stream); the greedy is k rounds of one
    count-agg + anti-join each.  ``nodes`` must carry dense ids 0..n-1
    (re-rank with ``plans.ids.dense_ids`` first otherwise).

    Returns the group in selection order (padded with unused smallest ids
    if fewer than ``group_size`` nodes cover any path, mirroring the
    reference's PQ draining zero-degree nodes).
    """
    import math

    from networkit_spark.operators.approx_betweenness import bfs_with_sigma
    from networkit_spark.operators.sampling import _draw

    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst").persist()
    e.count()
    n = nodes.count()
    L = samples if samples is not None else int(
        math.ceil(group_size * math.log(n) / (epsilon * epsilon))
    )
    draws = spark.range(L).select(
        F.col("id").alias("l"),
        (_draw("agb_s", seed, F.col("id")) % n).alias("s"),
    ).select(
        "l", "s",
        ((F.col("s") + 1 + _draw("agb_t", seed, F.col("l")) % (n - 1)) % n).alias("t"),
    )
    srcs = draws.select(F.col("s").alias("id")).distinct()
    dist, preds = bfs_with_sigma(e, srcs)
    preds = preds.persist()
    preds.count()
    # reachable samples only; start the backward walk at the target level
    state = (
        draws.join(
            dist.select(F.col("source").alias("s"), F.col("node").alias("t"), "dist"),
            ["s", "t"],
        )
        .select("l", "s", F.col("t").alias("cur"), F.col("dist").alias("lev"))
        .filter(F.col("lev") >= 2)  # paths with at least one interior node
        .localCheckpoint(eager=True)
    )
    hyper = spark.createDataFrame([], "l long, node long")
    for _ in range(max_rounds):
        if state.isEmpty():
            break
        picked = (
            state.join(
                preds.select(
                    F.col("source").alias("s"), F.col("node").alias("cur"), "pred"
                ),
                ["s", "cur"],
            )
            .groupBy("l", "s", "lev")
            .agg(
                F.min_by(
                    "pred", F.struct(_draw("agb_pick", seed, F.col("l"), F.col("lev"), F.col("pred")).alias("h"), F.col("pred").alias("p"))
                ).alias("cur")
            )
            .select("l", "s", "cur", (F.col("lev") - 1).alias("lev"))
            .localCheckpoint(eager=True)
        )
        hyper = hyper.unionByName(picked.select("l", F.col("cur").alias("node")))
        state = picked.filter(F.col("lev") >= 2)
    hyper = hyper.localCheckpoint(eager=True)
    e.unpersist()
    preds.unpersist()

    group: list[int] = []
    H = hyper
    for _ in range(group_size):
        top = (
            H.groupBy("node").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("node"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        v = int(top[0]["node"])
        group.append(v)
        covered = H.filter(F.col("node") == v).select("l").distinct()
        H = H.join(covered, "l", "left_anti").localCheckpoint(eager=True)
    # pad (reference drains its PQ: zero-coverage picks are arbitrary; we
    # pin smallest unused ids)
    i = 0
    while len(group) < group_size and i < n:
        if i not in group:
            group.append(i)
        i += 1
    return group


_BIG = 1 << 40


def group_closeness_local_search(
    und_edges: DataFrame,
    nodes: DataFrame,
    group: list[int],
    max_swaps: int = 100,
    batch: int = 64,
) -> tuple[list[int], float]:
    """Single-swap local search for group closeness
    (``centrality/GroupClosenessLocalSearch.cpp`` semantics; the
    bitset/sampling estimator variant is ``GroupClosenessLocalSwaps.cpp``).

    Per round: one |S|-source BFS gives every node its nearest and
    second-nearest member distances (d1, owner, d2); every shell candidate
    v (batched multi-source BFS) is evaluated EXACTLY via
    ``new_far(v, u) = sum_x min(d_{S\\u}(x), d_v(x)) = base(v) +
    delta(v, u)`` with ``base(v) = sum min(d1, d_v)`` and ``delta(v, u) =
    sum_{owner(x)=u} (min(d2, d_v) - min(d1, d_v))`` — two aggregations,
    no |S|-fold blowup.  The best strictly-improving (u, v) swap is applied
    (ties: smallest v, then u); stop at a true 1-swap local optimum.

    Unlike the reference's estimate-then-verify single candidate per round,
    every candidate is evaluated exactly (batched — the Spark-natural
    trade: one wave evaluates all swaps, the reference's per-candidate
    machinery saves sequential work that parallel waves amortize anyway).
    Nodes unreachable from the group are excluded from farness (connected
    inputs assumed, as in the reference).

    Returns (group in member order after swaps, final farness).
    """
    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst").persist()
    e.count()
    from networkit_spark.operators.distance import multi_source_bfs

    S = list(dict.fromkeys(int(x) for x in group))

    def stats_for(members):
        d = multi_source_bfs(
            e, spark.createDataFrame([(m,) for m in members], "id long")
        )
        m1 = d.groupBy("node").agg(
            F.min(F.struct("dist", "source")).alias("m1")
        ).select(
            "node", F.col("m1.dist").alias("d1"), F.col("m1.source").alias("owner")
        )
        d2 = (
            d.join(m1, "node")
            .filter(F.col("source") != F.col("owner"))
            .groupBy("node")
            .agg(F.min("dist").alias("d2"))
        )
        return (
            m1.join(d2, "node", "left")
            .select(
                "node", "d1", "owner", F.coalesce("d2", F.lit(_BIG)).alias("d2")
            )
            .localCheckpoint(eager=True)
        )

    far = None
    for _ in range(max_swaps):
        st = stats_for(S)
        far = st.agg(F.sum("d1")).first()[0] or 0
        sdf = spark.createDataFrame([(m,) for m in S], "m long")
        shell = (
            e.join(sdf.withColumnRenamed("m", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(sdf.withColumnRenamed("m", "id"), "id", "left_anti")
        )
        cand_ids = sorted(r["id"] for r in shell.collect())
        best = None  # (new_far, v, u)
        for lo in range(0, len(cand_ids), batch):
            b = cand_ids[lo:lo + batch]
            dv = multi_source_bfs(
                e, spark.createDataFrame([(v,) for v in b], "id long")
            ).select(F.col("source").alias("v"), "node", F.col("dist").alias("dvx"))
            joined = st.crossJoin(
                F.broadcast(spark.createDataFrame([(v,) for v in b], "v long"))
            ).join(dv, ["v", "node"], "left").select(
                "v", "owner",
                F.least("d1", F.coalesce("dvx", F.lit(_BIG))).alias("n1"),
                F.least("d2", F.coalesce("dvx", F.lit(_BIG))).alias("n2"),
            )
            base = joined.filter(F.col("n1") < _BIG).groupBy("v").agg(
                F.sum("n1").alias("base")
            )
            delta = (
                joined.filter(F.col("n2") < _BIG)
                .groupBy("v", "owner")
                .agg(F.sum(F.col("n2") - F.col("n1")).alias("delta"))
            )
            # members owning no node get delta = 0 (cross the batch with S)
            vu = spark.createDataFrame(
                [(v, u) for v in b for u in S], "v long, owner long"
            )
            rows = (
                vu.join(base, "v")
                .join(delta, ["v", "owner"], "left")
                .select("v", F.col("owner").alias("u"),
                        (F.col("base") + F.coalesce("delta", F.lit(0))).alias("nf"))
                .collect()
            )
            for r in rows:
                key = (int(r["nf"]), int(r["v"]), int(r["u"]))
                if best is None or key < best:
                    best = key
        if best is None or best[0] >= far:
            break
        nf, v, u = best
        S[S.index(u)] = v
    e.unpersist()
    return S, float(far if far is not None else 0)
