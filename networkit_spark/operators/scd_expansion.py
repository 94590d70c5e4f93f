"""Triangle-based selective community expansion: TCE + LocalTightnessExpansion.

References:
- ``cpp/scd/TCE.cpp`` (Triangle-based Community Expansion): greedy
  conductance expansion where a shell node's priority is the sum over its
  community neighbors u of ``(w_uv + T_min(u,v)) / (denom * deg(v))`` with
  ``T_min(u,v) = sum_y min(w_uy, w_vy)`` over common neighbors and
  ``denom = min(wd_u, wd_v)`` (or the Jaccard form ``wd_u + wd_v - nom``);
  acceptance iff conductance strictly improves (``TCE.cpp:171-227``),
  optional refine pass that re-tests every member for removal
  (``TCE.cpp:229-291``).
- ``cpp/scd/LocalTightnessExpansion.cpp``: priority = sum of STATIC cosine
  similarities ``s(u,v) = (2*w_uv + sum_y w_uy*w_vy) / (wd_u * wd_v)`` with
  ``wd = sqrt(1 + sum w^2)`` over community neighbors (node internal
  similarity); acceptance iff
  ``extS/intS - (alpha*extSim(u) - intSim(u)) / (2*intSim(u)) > 0``
  (``LocalTightnessExpansion.cpp:292-296``).

Distributed shape (same stance as :func:`networkit_spark.operators.scd.gce`:
selective/local algorithms build a SMALL community, so the greedy loop is
driver-side bookkeeping while every graph touch is batched):

- both priorities are sums of STATIC per-edge scores, so the only cluster
  work is computing edge statistics ``(w, T_min, T_prod, degrees)`` for
  batches of nodes — ONE broadcast-semi-join wedge join per batch
  (:func:`_batch_edge_stats`), the distributed ``forTrianglesOf``. A node's
  full edge statistics are fetched exactly once, the first time it enters
  the explored region (seed init, shell entry, or TCE acceptance) — the
  same lazy local-graph growth as the reference's
  ``LocalDegreeDirectedGraph``, batched.
- the heap semantics (extract max; rejected nodes re-enter only when a
  neighbor joins and bumps their score, via the reference's
  ``shell.update``) are replayed exactly with an active-set + score dict.
  Determinism divergence (documented, same as gce): equal priorities pop
  smallest node id first, where the reference's d-ary heap order is
  unspecified.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst", "weight")
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _batch_edge_stats(sym: DataFrame, degs: DataFrame, batch) -> list:
    """For every edge (u, v) with u in ``batch``: weight, common-neighbor
    triangle sums (min- and product-weighted), and both endpoints' degree
    stats. One broadcast semi-join + one wedge join, local to the batch's
    neighborhood."""
    spark = sym.sparkSession
    b = F.broadcast(
        spark.createDataFrame([(int(x),) for x in sorted(set(batch))], "bn long")
    )
    e1 = (
        sym.join(b.withColumnRenamed("bn", "src"), "src", "left_semi")
        .select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").alias("w"))
        .persist()
    )
    w1 = e1.select("u", F.col("v").alias("y"), F.col("w").alias("wuy"))
    w2 = sym.select(
        F.col("src").alias("y"), F.col("dst").alias("v"), F.col("weight").alias("wvy")
    )
    tri = (
        w1.join(w2, "y")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.sum(F.least("wuy", "wvy")).alias("tmin"),
            F.sum(F.col("wuy") * F.col("wvy")).alias("tprod"),
        )
    )
    du = degs.select(
        F.col("node").alias("u"),
        F.col("wsum").alias("u_wsum"),
        F.col("wsq").alias("u_wsq"),
        F.col("deg").alias("u_deg"),
    )
    dv = degs.select(
        F.col("node").alias("v"),
        F.col("wsum").alias("v_wsum"),
        F.col("wsq").alias("v_wsq"),
        F.col("deg").alias("v_deg"),
    )
    rows = (
        e1.join(tri, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u", "v", "w",
            F.coalesce("tmin", F.lit(0.0)).alias("tmin"),
            F.coalesce("tprod", F.lit(0.0)).alias("tprod"),
            "u_wsum", "u_wsq", "u_deg", "v_wsum", "v_wsq", "v_deg",
        )
        .collect()
    )
    e1.unpersist()
    return rows


def tce_shell_scores_df(
    edges: DataFrame, members, jaccard: bool = False
) -> DataFrame:
    """The TCE shell-priority table for a given community, fully
    distributed (the score every shell node would carry in the reference
    heap): score(v) = sum over community neighbors u of
    ``(w_uv + T_min(u,v)) / (denom * deg(v))`` (``TCE.cpp:105-121``).
    Returns (node, score). This is the per-round batched computation the
    greedy loop consumes — registered as the oracle-checked gate query."""
    spark = edges.sparkSession
    sym = _sym(edges)
    degs = _degree_table(sym)
    mem = F.broadcast(
        spark.createDataFrame([(int(x),) for x in sorted(set(members))], "m long")
    )
    ce = (
        sym.join(mem.withColumnRenamed("m", "src"), "src", "left_semi")
        .join(mem.withColumnRenamed("m", "dst"), "dst", "left_anti")
        .select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").alias("w"))
    )
    eu = sym.join(mem.withColumnRenamed("m", "src"), "src", "left_semi").select(
        F.col("src").alias("u"), F.col("dst").alias("y"), F.col("weight").alias("wuy")
    )
    ev = sym.select(
        F.col("src").alias("v"), F.col("dst").alias("y"), F.col("weight").alias("wvy")
    )
    tri = (
        eu.join(ev, "y")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum(F.least("wuy", "wvy")).alias("tmin"))
    )
    du = degs.select(F.col("node").alias("u"), F.col("wsum").alias("wd_u"))
    dv = degs.select(
        F.col("node").alias("v"), F.col("wsum").alias("wd_v"), F.col("deg").alias("deg_v")
    )
    scored = (
        ce.join(tri, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .withColumn("nom", F.col("w") + F.coalesce("tmin", F.lit(0.0)))
        .withColumn(
            "denom",
            (F.col("wd_u") + F.col("wd_v") - F.col("nom"))
            if jaccard
            else F.least("wd_u", "wd_v"),
        )
        .withColumn(
            "s",
            F.when(
                (F.col("wd_v") > 0) & (F.col("denom") > 0),
                F.col("nom") / (F.col("denom") * F.col("deg_v")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return scored.groupBy(F.col("v").alias("node")).agg(F.sum("s").alias("score"))


def lte_shell_similarity_df(edges: DataFrame, members) -> DataFrame:
    """LocalTightnessExpansion shell priorities, fully distributed:
    int_sim(v) = sum over community neighbors u of the structural
    similarity ``(2*w_uv + sum_y w_uy*w_vy) / (sqrt(1+sum w_uy^2) *
    sqrt(1+sum w_vy^2))`` (``LocalTightnessExpansion.cpp``). Returns
    (node, int_sim)."""
    spark = edges.sparkSession
    sym = _sym(edges)
    degs = _degree_table(sym)
    mem = F.broadcast(
        spark.createDataFrame([(int(x),) for x in sorted(set(members))], "m long")
    )
    ce = (
        sym.join(mem.withColumnRenamed("m", "src"), "src", "left_semi")
        .join(mem.withColumnRenamed("m", "dst"), "dst", "left_anti")
        .select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").alias("w"))
    )
    eu = sym.join(mem.withColumnRenamed("m", "src"), "src", "left_semi").select(
        F.col("src").alias("u"), F.col("dst").alias("y"), F.col("weight").alias("wuy")
    )
    ev = sym.select(
        F.col("src").alias("v"), F.col("dst").alias("y"), F.col("weight").alias("wvy")
    )
    tri = (
        eu.join(ev, "y")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum(F.col("wuy") * F.col("wvy")).alias("tprod"))
    )
    du = degs.select(F.col("node").alias("u"), F.col("wsq").alias("wsq_u"))
    dv = degs.select(F.col("node").alias("v"), F.col("wsq").alias("wsq_v"))
    scored = (
        ce.join(tri, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .withColumn(
            "s",
            (2.0 * F.col("w") + F.coalesce("tprod", F.lit(0.0)))
            / (F.sqrt(1.0 + F.col("wsq_u")) * F.sqrt(1.0 + F.col("wsq_v"))),
        )
    )
    return scored.groupBy(F.col("v").alias("node")).agg(F.sum("s").alias("int_sim"))


class _LocalRegion:
    """Lazily-fetched local graph: edge stats cached per node the first
    time it is explored (the batched LocalDegreeDirectedGraph)."""

    def __init__(self, sym: DataFrame, degs: DataFrame):
        self.sym = sym
        self.degs = degs
        self.known: set[int] = set()
        self.adj: dict[int, list] = {}
        self.wsum: dict[int, float] = defaultdict(float)
        self.wsq: dict[int, float] = defaultdict(float)
        self.deg: dict[int, int] = defaultdict(int)

    def ensure(self, nodes) -> None:
        todo = [x for x in set(nodes) if x not in self.known]
        if not todo:
            return
        self.known.update(todo)
        for x in todo:
            self.adj.setdefault(x, [])
        for r in _batch_edge_stats(self.sym, self.degs, todo):
            self.adj[r["u"]].append(r)
            self.wsum[r["u"]] = float(r["u_wsum"])
            self.wsq[r["u"]] = float(r["u_wsq"])
            self.deg[r["u"]] = int(r["u_deg"])
            self.wsum[r["v"]] = float(r["v_wsum"])
            self.wsq[r["v"]] = float(r["v_wsq"])
            self.deg[r["v"]] = int(r["v_deg"])


def _degree_table(sym: DataFrame) -> DataFrame:
    return sym.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("wsum"),
        F.sum(F.col("weight") * F.col("weight")).alias("wsq"),
        F.count("*").alias("deg"),
    )


def _pop_max(active, priority):
    """argmax priority, ties -> smallest node id (deterministic stand-in
    for the reference heap's unspecified equal-key order)."""
    return max(active, key=lambda x: (priority[x], -x))


def tce(
    edges: DataFrame,
    seeds,
    refine: bool = False,
    jaccard: bool = False,
    max_pops: int = 100_000,
) -> set[int]:
    """Triangle-based Community Expansion (``TCE.cpp``): returns the
    expanded community as a set of node ids."""
    sym = _sym(edges).persist()
    degs = _degree_table(sym).persist()
    region = _LocalRegion(sym, degs)

    com = set(int(s) for s in seeds)
    region.ensure(com)

    score: dict[int, float] = defaultdict(float)
    cut_edges: dict[int, float] = defaultdict(float)
    active: set[int] = set()

    def s_dir(r) -> float:
        # score of shell node v given member u (TCE.cpp:105-121): nom =
        # w_uv + T_min; denom = jaccard ? wd_v + wd_u - nom : min(wd_v, wd_u)
        u, v = r["u"], r["v"]
        wd_u, wd_v = region.wsum[u], region.wsum[v]
        if wd_v <= 0.0:
            return 0.0
        nom = float(r["w"]) + float(r["tmin"])
        denom = (wd_v + wd_u - nom) if jaccard else min(wd_v, wd_u)
        if denom <= 0.0:
            return 0.0
        return nom / (denom * region.deg[v])

    def add_member_updates(u: int) -> None:
        for r in region.adj[u]:
            v = r["v"]
            if v in com:
                continue
            score[v] += s_dir(r)
            cut_edges[v] += float(r["w"])
            active.add(v)

    vol = sum(region.wsum[u] for u in com)
    for u in com:
        add_member_updates(u)
    cut = sum(cut_edges[v] for v in active)

    pops = 0
    while active and pops < max_pops:
        pops += 1
        u = _pop_max(active, score)
        active.discard(u)
        wd_u = region.wsum[u]
        new_cut = cut + wd_u - 2.0 * cut_edges[u]
        new_vol = vol + wd_u
        if vol <= 0.0 or new_vol <= 0.0:
            break
        if (new_cut / new_vol) < (cut / vol):
            com.add(u)
            region.ensure([u])
            add_member_updates(u)
            cut, vol = new_cut, new_vol

    if refine:
        # TCE.cpp:229-291: re-test every member (ascending id = std::set
        # iteration order) for removal while conductance improves
        for u in sorted(com):
            u_vol = region.wsum[u]
            u_cut_change = sum(
                (float(r["w"]) if r["v"] in com else -float(r["w"]))
                for r in region.adj[u]
            )
            new_cut = cut + u_cut_change
            new_vol = vol - u_vol
            if vol > 0.0 and new_vol > 0.0 and (new_cut / new_vol) < (cut / vol):
                com.discard(u)
                cut, vol = new_cut, new_vol

    degs.unpersist()
    sym.unpersist()
    return com


def lte_similarity(r, region: _LocalRegion) -> float:
    """LocalTightnessExpansion.cpp structural similarity of edge (u, v):
    (2*w_uv + sum_y w_uy*w_vy) / (sqrt(1 + sum w_uy^2) * sqrt(1 + w_vy^2))."""
    import math

    wd_u = math.sqrt(1.0 + region.wsq[r["u"]])
    wd_v = math.sqrt(1.0 + region.wsq[r["v"]])
    return (2.0 * float(r["w"]) + float(r["tprod"])) / (wd_u * wd_v)


def local_tightness_expansion(
    edges: DataFrame,
    seeds,
    alpha: float = 1.0,
    max_pops: int = 100_000,
) -> set[int]:
    """LocalTightnessExpansion (``LocalTightnessExpansion.cpp``): expand the
    seed set greedily by node internal similarity; accept while
    ``extS/intS - (alpha*ext(u) - int(u)) / (2*int(u)) > 0``."""
    sym = _sym(edges).persist()
    degs = _degree_table(sym).persist()
    region = _LocalRegion(sym, degs)

    com = set(int(s) for s in seeds)
    region.ensure(com)
    shell0 = {r["v"] for u in com for r in region.adj[u]} - com
    region.ensure(shell0)

    s_of: dict[tuple[int, int], float] = {}
    for x in region.known:
        for r in region.adj[x]:
            s_of[(r["u"], r["v"])] = lte_similarity(r, region)

    def s(u: int, v: int) -> float:
        return s_of.get((u, v), s_of.get((v, u), 0.0))

    int_sim: dict[int, float] = defaultdict(float)
    ext_sim: dict[int, float] = defaultdict(float)
    for x in com | shell0:
        for r in region.adj[x]:
            sv = s(x, r["v"])
            if r["v"] in com:
                int_sim[x] += sv
            else:
                ext_sim[x] += sv
    intS = sum(int_sim[x] for x in com)
    extS = sum(ext_sim[x] for x in com)
    shell_seen = set(shell0)
    active = set(shell0)

    pops = 0
    while active and pops < max_pops:
        pops += 1
        u = _pop_max(active, int_sim)
        active.discard(u)
        isu, esu = int_sim[u], ext_sim[u]
        if isu <= 0.0:
            continue
        ratio = (extS / intS) if intS > 0.0 else (
            float("inf") if extS > 0.0 else float("nan")
        )
        margin = ratio - (alpha * esu - isu) / (2.0 * isu)
        if not margin > 0.0:  # NaN rejects, like the C++ comparison
            continue
        com.add(u)
        new_shell = {r["v"] for r in region.adj[u]} - region.known
        region.ensure(new_shell)
        for r in region.adj[u]:
            if (r["u"], r["v"]) not in s_of:
                s_of[(r["u"], r["v"])] = lte_similarity(r, region)
        # the reference's per-neighbor bookkeeping (:171-222)
        for r in region.adj[u]:
            v = r["v"]
            sv = s(u, v)
            int_sim[v] += sv
            if v in com:
                extS -= sv
                intS += 2.0 * sv
                ext_sim[v] -= sv
            else:
                extS += sv
                if v not in shell_seen:
                    shell_seen.add(v)
                    # fresh external similarity, computed AFTER u joined
                    for rr in region.adj[v]:
                        if (rr["u"], rr["v"]) not in s_of:
                            s_of[(rr["u"], rr["v"])] = lte_similarity(rr, region)
                    ext_sim[v] = sum(
                        s(v, rr["v"]) for rr in region.adj[v] if rr["v"] not in com
                    )
                else:
                    ext_sim[v] -= sv
                active.add(v)

    degs.unpersist()
    sym.unpersist()
    return com
