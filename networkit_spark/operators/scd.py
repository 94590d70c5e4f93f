"""Selective community detection: ApproximatePageRank + PageRankNibble.

Reference: ``cpp/scd/ApproximatePageRank.cpp`` (Andersen-Chung-Lang push:
a node u with residual res(u) >= eps * deg(u) pushes — p(u) += alpha*res,
each neighbor v gains (1-alpha)*res*w/(2*vol(u)), u keeps (1-alpha)*res/2)
and ``cpp/scd/PageRankNibble.cpp`` (sweep cut: order support by
p(u)/deg(u) descending, take the prefix minimizing conductance
cut/min(vol, totalVolume - vol), strictly-better updates so the smallest
best prefix wins).

The reference pushes one queue node at a time (order-dependent float
accumulation, no exact parity possible); here every above-threshold node
pushes simultaneously per superstep — the synchronous ACL variant — and
p/res are rounded to 12 decimals per round so the cascade of threshold
comparisons is bit-portable across engines (the DuckDB oracle unrolls the
same rounds).

Scale: each push round is one frontier join + aggregation over the
support-induced neighborhood (support size is O(1/(eps*alpha)),
independent of graph size — the point of Nibble); the sweep's window
cumsum runs over that same small support set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import SuperstepRunner


def approximate_pagerank(
    und_edges: DataFrame,
    seeds: list[int],
    alpha: float = 0.1,
    eps: float = 1e-4,
    max_rounds: int = 100,
    fixed_rounds: int | None = None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(node, p, res) for the support (p > 0 or res > 0). Synchronous
    batched push; ``fixed_rounds`` forces an exact round count (oracle
    twin), otherwise runs until no node is above threshold. The loop rides
    :class:`SuperstepRunner` (eager per-round checkpoint — the state is
    tiny, the cost is the lineage cut, which is mandatory here: unconverged
    pushes can run ~50+ rounds)."""
    spark = und_edges.sparkSession
    e = und_edges.filter(F.col("src") != F.col("dst"))
    deg = e.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("deg"))
    deg = deg.persist()
    deg.count()
    init = 1.0 / len(seeds)
    init_state = spark.createDataFrame(
        [(int(s), 0.0, init) for s in seeds], "node long, p double, res double"
    )
    is_active = (F.col("deg") > 0) & (F.col("res") >= F.lit(eps) * F.col("deg"))

    def step(state, i):
        st = state.join(deg, "node", "left").fillna({"deg": 0.0})
        active = st.filter(is_active)
        gains = (
            e.join(
                active.select(
                    F.col("node").alias("src"),
                    F.col("res").alias("ares"),
                    F.col("deg").alias("adeg"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.lit(1.0 - alpha) * F.col("ares") * F.col("weight")
                    / (2.0 * F.col("adeg"))
                ).alias("gain")
            )
        )
        moved = st.select(
            "node",
            F.when(is_active, F.col("p") + F.lit(alpha) * F.col("res"))
            .otherwise(F.col("p")).alias("p"),
            F.when(is_active, F.lit(1.0 - alpha) * F.col("res") / 2.0)
            .otherwise(F.col("res")).alias("res"),
        )
        new_state = (
            moved.join(gains, "node", "full")
            .select(
                "node",
                F.round(F.coalesce(F.col("p"), F.lit(0.0)), 12).alias("p"),
                F.round(
                    F.coalesce(F.col("res"), F.lit(0.0))
                    + F.coalesce(F.col("gain"), F.lit(0.0)),
                    12,
                ).alias("res"),
            )
        )
        info = {}
        if fixed_rounds is None:
            info["active"] = active.count()
        return new_state, info

    runner = runner or SuperstepRunner(spark, run_id="apr")
    result = runner.run(
        init_state,
        step,
        converged_fn=(None if fixed_rounds is not None else (lambda info: info["active"] == 0)),
        max_iterations=fixed_rounds if fixed_rounds is not None else max_rounds,
    )
    deg.unpersist()
    return result.state


def best_sweep_set(
    und_edges: DataFrame, pr: DataFrame, n_nodes: int
) -> DataFrame:
    """(node) rows of the conductance-minimizing prefix of the support
    ordered by p/deg descending (``PageRankNibble::bestSweepSet``).
    Scores rounded to 9 decimals, ties by node id — engine-portable order.
    The window sort runs over the support set only (small by design)."""
    e = und_edges.filter(F.col("src") != F.col("dst"))
    deg = e.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("deg"))
    total_volume = e.agg(F.sum("weight")).first()[0] or 0.0
    support = (
        pr.filter(F.col("p") > 0)
        .join(deg, "node")
        .select("node", "deg", F.round(F.col("p") / F.col("deg"), 9).alias("score"))
    )
    w_rank = Window.orderBy(F.desc("score"), F.asc("node"))
    ranked = support.select(
        "node", "deg", F.row_number().over(w_rank).alias("rk")
    ).persist()
    ranked.count()
    # intra(k) = cumulative weight of edges whose BOTH endpoints rank <= k
    r_src = ranked.select(F.col("node").alias("src"), F.col("rk").alias("r_src"))
    r_dst = ranked.select(F.col("node").alias("dst"), F.col("rk").alias("r_dst"))
    intra_events = (
        e.join(r_src, "src")
        .join(r_dst, "dst")
        .filter(F.col("r_src") < F.col("r_dst"))  # each und. edge once
        .groupBy(F.col("r_dst").alias("rk"))
        .agg(F.sum("weight").alias("closed_w"))
    )
    w_pref = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(intra_events, "rk", "left")
        .fillna({"closed_w": 0.0})
        .select(
            "node",
            "rk",
            F.sum("deg").over(w_pref).alias("vol"),
            (F.sum("deg").over(w_pref) - 2.0 * F.sum("closed_w").over(w_pref)).alias("cut"),
        )
        .select(
            "node",
            "rk",
            F.round(
                F.col("cut")
                / F.least(F.col("vol"), F.lit(float(total_volume)) - F.col("vol")),
                9,
            ).alias("cond"),
        )
    )
    # best prefix: strictly-better minimum, earliest rank wins; prefix must
    # be smaller than the whole node set
    best_rk = (
        sweep.filter(F.col("rk") < n_nodes)
        .groupBy()
        .agg(F.min(F.struct(F.col("cond"), F.col("rk"))).alias("b"))
        .select(F.col("b.rk").alias("best_rk"))
        .first()["best_rk"]
    )
    out = sweep.filter(F.col("rk") <= best_rk).select("node")
    ranked.unpersist()
    return out


def page_rank_nibble(
    und_edges: DataFrame,
    seed: int,
    n_nodes: int,
    alpha: float = 0.1,
    eps: float = 1e-4,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Expand one community around ``seed``
    (``PageRankNibble::expandOneCommunity``). Returns (node) rows."""
    pr = approximate_pagerank(
        und_edges, [seed], alpha=alpha, eps=eps, fixed_rounds=fixed_rounds
    )
    return best_sweep_set(und_edges, pr, n_nodes)


def lfm_local(
    und_edges: DataFrame,
    seeds: list[int],
    alpha: float = 1.0,
    max_rounds: int = 50,
) -> DataFrame:
    """LFM local community expansion, batched over many seeds at once.

    Reference: ``cpp/scd/LFMLocal.cpp:12-100`` — fitness
    ``q(C) = 2 W_int / (2 W_int + cut)^alpha``; greedily add the shell node
    with the largest positive fitness gain, then drop members whose removal
    raises fitness (seeds are never dropped), until no shell node improves.
    The reference expands one community at a time with random tie-breaks;
    here EVERY seed expands in the same superstep (membership keyed by
    seed) and ties pick the smallest node id — pinned and reproducible.

    Per round: one members-edges join for shell gains + one for member
    contributions; per-seed aggregates (#seeds rows) come to the driver for
    the quality bookkeeping. Scale: cost tracks the community
    neighborhoods, not the graph.

    ``und_edges``: symmetric rows. Returns (seed, node) memberships.
    """
    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst", "weight").persist()
    e.count()
    wdeg = e.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))

    members = spark.createDataFrame(
        [(s, s) for s in seeds], "seed long, node long"
    ).localCheckpoint(eager=True)
    active = set(seeds)
    for _ in range(max_rounds):
        if not active:
            break
        # per-seed totals: vol, W_int -> cut = vol - 2 W_int
        mem_src = members.select("seed", F.col("node").alias("src"))
        mem_dst = members.select("seed", F.col("node").alias("dst"))
        intw = (
            e.join(mem_src, "src").join(mem_dst, ["seed", "dst"], "left_semi")
            .groupBy("seed").agg((F.sum("weight") / 2).alias("W"))
        )
        vol = (
            members.join(wdeg, "node")
            .groupBy("seed").agg(F.sum("wdeg").alias("vol"))
        )
        stats = {
            r["seed"]: (r["W"] or 0.0, (r["vol"] or 0.0) - 2 * (r["W"] or 0.0))
            for r in vol.join(intw, "seed", "left").collect()
        }
        # shell: member -> outside neighbor; intDeg = weight into community
        shell = (
            e.join(mem_src, "src")
            .join(mem_dst, ["seed", "dst"], "left_anti")
            .groupBy("seed", F.col("dst").alias("node"))
            .agg(F.sum("weight").alias("intdeg"))
            .join(wdeg, "node")
            .select("seed", "node", "intdeg", (F.col("wdeg") - F.col("intdeg")).alias("extdeg"))
        )
        stats_df = spark.createDataFrame(
            [(s, w, c) for s, (w, c) in stats.items() if s in active],
            "seed long, W double, C double",
        )

        def q_col(W, C):
            den = 2 * W + C
            return F.when(den > 0, (2 * W) / F.pow(den, F.lit(alpha))).otherwise(
                F.lit(0.0)
            )

        gains = (
            shell.join(F.broadcast(stats_df), "seed")
            .select(
                "seed", "node", "intdeg", "extdeg",
                F.round(
                    q_col(
                        F.col("W") + F.col("intdeg"),
                        F.col("C") - F.col("intdeg") + F.col("extdeg"),
                    )
                    - q_col(F.col("W"), F.col("C")),
                    12,
                ).alias("gain"),
            )
            .filter(F.col("gain") > 1e-12)
        )
        # distributed argmax per seed: best (gain, smallest node id)
        picks = gains.groupBy("seed").agg(
            F.max_by(
                F.struct("node", "intdeg", "extdeg"),
                F.struct(F.col("gain"), (-F.col("node")).alias("nn")),
            ).alias("b")
        ).select("seed", "b.node", "b.intdeg", "b.extdeg")
        adds = {
            r["seed"]: (None, r["node"], r["intdeg"], r["extdeg"])
            for r in picks.collect()
        }
        if not adds:
            break
        for s in list(active):
            if s not in adds:
                active.discard(s)
        new_rows = [(s, v[1]) for s, v in adds.items()]
        members = members.unionByName(
            spark.createDataFrame(new_rows, "seed long, node long")
        ).localCheckpoint(eager=True)
        # removal sweep: drop the worst negative-contribution member per seed
        for s, v in adds.items():
            W, C = stats[s]
            stats[s] = (W + v[2], C - v[2] + v[3])
        mem_src = members.select("seed", F.col("node").alias("src"))
        mem_dst = members.select("seed", F.col("node").alias("dst"))
        mcontrib = (
            e.join(mem_src, "src").join(mem_dst, ["seed", "dst"], "left_semi")
            .groupBy("seed", F.col("src").alias("node"))
            .agg(F.sum("weight").alias("intdeg"))
            .join(wdeg, "node")
            .select("seed", "node", "intdeg", (F.col("wdeg") - F.col("intdeg")).alias("extdeg"))
        )
        stats2_df = spark.createDataFrame(
            [(s, w, c) for s, (w, c) in stats.items()],
            "seed long, W double, C double",
        )
        improvs = (
            mcontrib.filter(F.col("node") != F.col("seed"))  # never drop the seed
            .join(F.broadcast(stats2_df), "seed")
            .select(
                "seed", "node",
                F.round(
                    q_col(
                        F.col("W") - F.col("intdeg"),
                        F.col("C") + F.col("intdeg") - F.col("extdeg"),
                    )
                    - q_col(F.col("W"), F.col("C")),
                    12,
                ).alias("improv"),
            )
            .filter(F.col("improv") > 1e-12)
        )
        drop_df = improvs.groupBy("seed").agg(
            F.max_by(
                "node", F.struct(F.col("improv"), (-F.col("node")).alias("nn"))
            ).alias("node")
        )
        if drop_df.count() > 0:
            members = members.join(
                drop_df, ["seed", "node"], "left_anti"
            ).localCheckpoint(eager=True)
    e.unpersist()
    return members


def gce(
    edges: DataFrame,
    seeds: set[int] | list[int],
    max_additions: int = 10_000,
) -> set[int]:
    """Greedy Community Expansion, objective M (``cpp/scd/GCE.cpp:40-110``):
    Q = internal edge weight / cut; repeatedly add the shell node with the
    largest positive dQ = (intW + intDeg(v)) / (cut - intDeg(v) + extDeg(v))
    - Q (ties -> smallest id, replacing the reference's random tie pick with
    a deterministic one). ``edges``: undirected, symmetrized or canonical.

    Selective/local algorithm: the community is small by construction, so
    the greedy loop runs on the driver while each round's shell scan is one
    broadcast join + aggregation over the edge table — the reference's
    forShellNodes walk, distributed."""
    spark = edges.sparkSession
    sym = (
        edges.select("src", "dst", "weight")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    sym.count()
    com = set(int(s) for s in seeds)
    for _ in range(max_additions):
        mdf = F.broadcast(
            spark.createDataFrame([(v,) for v in sorted(com)], "m long")
        )
        # rows from community members: dst membership decides int vs cut
        out_rows = sym.join(mdf.withColumnRenamed("m", "src"), "src", "left_semi").join(
            mdf.withColumnRenamed("m", "dst").withColumn("_in", F.lit(True)), "dst", "left"
        )
        agg = out_rows.agg(
            (F.sum(F.when(F.col("_in"), F.col("weight")).otherwise(0.0)) / 2).alias("intw"),
            F.sum(F.when(F.col("_in").isNull(), F.col("weight")).otherwise(0.0)).alias("cut"),
        ).first()
        intw, cut = float(agg["intw"] or 0.0), float(agg["cut"] or 0.0)
        if cut == 0:
            break  # whole component absorbed
        q = intw / cut
        # shell: non-members adjacent to C, with intDeg (to C) / extDeg
        shell = (
            sym.join(mdf.withColumnRenamed("m", "src"), "src", "left_anti")
            .join(
                mdf.withColumnRenamed("m", "dst").withColumn("_in", F.lit(True)),
                "dst",
                "left",
            )
            .groupBy("src")
            .agg(
                F.sum(F.when(F.col("_in"), F.col("weight")).otherwise(0.0)).alias("intd"),
                F.sum(F.when(F.col("_in").isNull(), F.col("weight")).otherwise(0.0)).alias("extd"),
            )
            .filter(F.col("intd") > 0)
            .withColumn("_den", F.lit(cut) - F.col("intd") + F.col("extd"))
            .withColumn(
                "dq",
                F.when(
                    F.col("_den") > 0,
                    (F.lit(intw) + F.col("intd")) / F.col("_den") - F.lit(q),
                ).otherwise(F.lit(float("inf"))),  # absorbs the whole cut:
                # the reference's double division yields +inf and wins too
            )
            .filter(F.col("dq") > 0)
            .orderBy(F.desc("dq"), F.asc("src"))
            .limit(1)
            .collect()
        )
        if not shell:
            break
        com.add(int(shell[0]["src"]))
    sym.unpersist()
    return com


def set_conductance(edges: DataFrame, community: set[int] | list[int]) -> float:
    """``cpp/scd/SetConductance.cpp``: cut(C) / min(vol(C), vol(V\\C)),
    volumes over 2x total edge weight; 1.0 when either side has no volume."""
    spark = edges.sparkSession
    sym = edges.select("src", "dst", "weight").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).dropDuplicates(["src", "dst"])
    mdf = F.broadcast(
        spark.createDataFrame([(int(v),) for v in sorted(set(community))], "m long")
    )
    rows = sym.join(mdf.withColumnRenamed("m", "src"), "src", "left_semi").join(
        mdf.withColumnRenamed("m", "dst").withColumn("_in", F.lit(True)), "dst", "left"
    )
    agg = rows.agg(
        F.sum("weight").alias("vol"),
        F.sum(F.when(F.col("_in").isNull(), F.col("weight")).otherwise(0.0)).alias("cut"),
    ).first()
    vol, cut = float(agg["vol"] or 0.0), float(agg["cut"] or 0.0)
    total = float(sym.agg(F.sum("weight")).first()[0] or 0.0)
    rest = total - vol
    if min(vol, rest) <= 0:
        return 1.0
    return cut / min(vol, rest)


def scd_ground_truth_comparison(
    found: DataFrame, truth: DataFrame, ignore_seeds: bool = False
) -> DataFrame:
    """``SCDGroundTruthComparison.cpp:11-130``: per seed, compare its found
    community ``found(seed, node)`` against a ground-truth cover
    ``truth(node, subset)``; report the best Jaccard / F1 / precision /
    recall over candidate subsets — each maximized independently, exactly as
    the reference tracks four separate bests. Unless ``ignore_seeds``,
    candidate subsets are restricted to the subsets containing the seed.

    All joins/aggs, no iteration: overlap counts via one (node) join, the
    seed restriction as a semi-join, sizes broadcast-scale."""
    fsz = found.groupBy("seed").agg(F.count("*").alias("fs"))
    tsz = truth.groupBy("subset").agg(F.count("*").alias("ts"))
    ov = found.join(truth, "node")
    if not ignore_seeds:
        allowed = truth.select(F.col("node").alias("seed"), "subset")
        ov = ov.join(allowed, ["seed", "subset"], "left_semi")
    ov = ov.groupBy("seed", "subset").agg(F.count("*").alias("o"))
    p = F.col("o") / F.col("fs")
    r = F.col("o") / F.col("ts")
    sc = (
        ov.join(fsz, "seed")
        .join(tsz, "subset")
        .select(
            "seed",
            (F.col("o") / (F.col("fs") + F.col("ts") - F.col("o"))).alias("j"),
            r.alias("r"),
            p.alias("p"),
            F.when(F.col("o") > 0, 2.0 * p * r / (p + r)).otherwise(0.0).alias("f1"),
        )
        .groupBy("seed")
        .agg(
            F.max("j").alias("jaccard"),
            F.max("f1").alias("f1"),
            F.max("p").alias("prec"),
            F.max("r").alias("rec"),
        )
    )
    return (
        found.select("seed")
        .distinct()
        .join(sc, "seed", "left")
        .fillna({"jaccard": 0.0, "f1": 0.0, "prec": 0.0, "rec": 0.0})
    )


def tpl_add_round(e, wdeg_df, members, active):
    """One phase-1 greedy add round of TwoPhaseL (``TwoPhaseL.cpp:13-89``),
    batched over seeds: shell gains, boundary-size correction, L = Lin/Lex
    candidate filter, per-seed argmax pick (ties -> smallest node id).
    Shared by :func:`two_phase_l` and the `tpl_add1_hubs` oracle-twin
    query so the engine and its SQL replay cannot drift. Returns the
    picked (seed, node) rows (empty when no seed can improve)."""
    spark = e.sparkSession
    mem_src = members.select("seed", F.col("node").alias("src"))
    mem_dst = members.select("seed", F.col("node").alias("dst"))
    # member contributions: intdeg/extdeg per member
    mcontrib = (
        e.join(mem_src, "src")
        .join(mem_dst.withColumn("in_c", F.lit(1)), ["seed", "dst"], "left")
        .groupBy("seed", F.col("src").alias("node"))
        .agg(
            F.sum(F.when(F.col("in_c").isNotNull(), F.col("weight")).otherwise(0.0)).alias("intdeg"),
            F.sum(F.when(F.col("in_c").isNull(), F.col("weight")).otherwise(0.0)).alias("extdeg"),
        )
    )
    per_seed = mcontrib.groupBy("seed").agg(
        (F.sum("intdeg") / 2).alias("W"),
        F.sum("extdeg").alias("C"),
        F.sum(F.when(F.col("extdeg") > 0, 1).otherwise(0)).alias("B"),
        F.count("*").alias("size"),
    )
    stats = {
        r["seed"]: (r["W"], r["C"], int(r["B"]), int(r["size"]))
        for r in per_seed.collect()
    }
    # members whose ONLY external neighbor is x -> uniq_cnt(seed, x)
    ext_pairs = (
        e.join(mem_src, "src")
        .join(mem_dst, ["seed", "dst"], "left_anti")
        .select("seed", F.col("src").alias("member"), F.col("dst").alias("x"))
    )
    uniq = (
        ext_pairs.groupBy("seed", "member")
        .agg(F.count_distinct("x").alias("k"), F.max("x").alias("only"))
        .filter(F.col("k") == 1)
        .groupBy("seed", F.col("only").alias("node"))
        .agg(F.count("*").alias("uniq_cnt"))
    )
    # shell infos
    shell = (
        e.join(mem_src, "src")
        .join(mem_dst, ["seed", "dst"], "left_anti")
        .groupBy("seed", F.col("dst").alias("node"))
        .agg(F.sum("weight").alias("intdeg"))
        .join(wdeg_df, "node")
        .select(
            "seed", "node", "intdeg",
            (F.col("wdeg") - F.col("intdeg")).alias("extdeg"),
        )
        .join(uniq, ["seed", "node"], "left")
        .fillna({"uniq_cnt": 0})
    )
    sdf = spark.createDataFrame(
        [(s, *stats[s]) for s in active if s in stats],
        "seed long, W double, C double, B int, size int",
    )
    bc = (
        F.when(F.col("extdeg") > 0, 1).otherwise(0) - F.col("uniq_cnt")
    )
    n_lin = 2.0 * (F.col("W") + F.col("intdeg")) / (F.col("size") + 1)
    lex_den = (F.col("B") + bc).cast("double")
    n_lex = (F.col("C") - F.col("intdeg") + F.col("extdeg")) / lex_den
    cur_lin = 2.0 * F.col("W") / F.col("size")
    cur_lex = F.when(F.col("B") > 0, F.col("C") / F.col("B")).otherwise(F.lit(0.0))
    cur_l = F.when(cur_lex > 0, cur_lin / cur_lex).otherwise(F.lit(float("inf")))
    n_l = F.when(n_lex > 0, n_lin / n_lex).otherwise(
        F.when(lex_den <= 0, F.lit(float("-inf"))).otherwise(F.lit(float("inf")))
    )
    cands = (
        shell.join(F.broadcast(sdf), "seed")
        .filter((n_lin > cur_lin) & (n_l > cur_l))
        .select("seed", "node", n_l.alias("nl"))
    )
    picks = (
        cands.groupBy("seed")
        .agg(
            F.max_by(
                "node", F.struct(F.col("nl"), (-F.col("node")).alias("nn"))
            ).alias("node")
        )
        .collect()
    )
    return picks


def two_phase_l(
    und_edges: DataFrame,
    seeds: list[int],
    max_rounds: int = 100,
) -> DataFrame:
    """TwoPhaseL local community detection, batched over seeds.

    Reference: ``cpp/scd/TwoPhaseL.cpp:13-114`` — quality
    ``L = Lin / Lex`` with ``Lin = 2 W_int / |C|`` and ``Lex = cut /
    boundarySize``.  Phase 1 greedily adds the shell node with the highest
    new L among those that raise Lin (reference ties are random; here the
    smallest node id — pinned).  Phase 2 sweeps the members (ascending id)
    and removes any node unless removing it would BOTH lower Lin and raise
    Lex (``:90-105``).  A community that lost one of its seeds returns
    empty (``:107-112``).

    Distributed shape: phase 1 is the batched-greedy SCD skeleton — every
    seed advances per superstep; shell gains, boundary sizes and the
    boundary-change correction (#members whose only external neighbor is
    the candidate) are one member-edge join + two groupBys.  Phase 2 is
    driver-side on the collected community subgraphs (community-sized,
    the same profile as the reference's sequential sweep).

    ``und_edges``: symmetric rows. Returns (seed, node) memberships.
    """
    spark = und_edges.sparkSession
    e = und_edges.select("src", "dst", "weight").persist()
    e.count()
    wdeg_df = e.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("wdeg")
    )

    members = spark.createDataFrame(
        [(s, s) for s in seeds], "seed long, node long"
    ).localCheckpoint(eager=True)
    active = set(seeds)
    for _ in range(max_rounds):
        if not active:
            break
        picks = tpl_add_round(e, wdeg_df, members, active)
        if not picks:
            break
        picked = {r["seed"]: r["node"] for r in picks}
        active = set(picked)
        members = members.unionByName(
            spark.createDataFrame(list(picked.items()), "seed long, node long")
        ).localCheckpoint(eager=True)

    # ---- phase 2: driver-side removal sweep on collected subgraphs ----
    mem_src = members.select("seed", F.col("node").alias("src"))
    mem_dst = members.select("seed", F.col("node").alias("dst"))
    sub = (
        e.join(mem_src, "src")
        .join(mem_dst, ["seed", "dst"], "left_semi")
        .select("seed", "src", "dst", "weight")
        .collect()
    )
    wd = {
        r["node"]: r["wdeg"]
        for r in members.select("node").distinct().join(wdeg_df, "node").collect()
    }
    by_seed: dict[int, list] = {}
    for r in members.collect():
        by_seed.setdefault(r["seed"], []).append(r["node"])
    adj: dict[int, dict[int, dict[int, float]]] = {}
    for r in sub:
        adj.setdefault(r["seed"], {}).setdefault(r["src"], {})[r["dst"]] = r["weight"]
    e.unpersist()

    out_rows = []
    for s in sorted(by_seed):
        com = set(by_seed[s])
        a = adj.get(s, {})

        def intdeg(x):
            return sum(w for y, w in a.get(x, {}).items() if y in com)

        def stats_now():
            wint = sum(intdeg(x) for x in com) / 2.0
            cut = sum(wd.get(x, 0.0) - intdeg(x) for x in com)
            bnd = sum(1 for x in com if wd.get(x, 0.0) - intdeg(x) > 1e-12)
            return wint, cut, bnd

        W, C, B = stats_now()
        cur_lin_v = 2.0 * W / len(com)
        cur_lex_v = C / B if B else 0.0
        for x in sorted(by_seed[s]):
            if x not in com or len(com) <= 1:
                continue
            com.discard(x)
            nW, nC, nB = stats_now()
            n_lin_v = 2.0 * nW / len(com) if com else 0.0
            n_lex_v = nC / nB if nB else 0.0
            if cur_lin_v > n_lin_v and cur_lex_v < n_lex_v:
                com.add(x)  # keep
            else:
                cur_lin_v, cur_lex_v = n_lin_v, n_lex_v
        if s not in com:
            continue  # community dropped its seed -> empty (`:107-112`)
        out_rows.extend((s, x) for x in sorted(com))
    if not out_rows:
        return spark.createDataFrame([], "seed long, node long")
    return spark.createDataFrame(out_rows, "seed long, node long")
