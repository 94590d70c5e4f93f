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


# ---------------------------------------------------------------------------
# LocalT + CliqueDetect
# ---------------------------------------------------------------------------


def _batch_triangles(sym: DataFrame, batch) -> list:
    """Triangle triples (u, v, w), v < w, for every u in ``batch`` — the
    distributed ``forTrianglesOf``: one broadcast semi-join + one wedge
    join + one edge semi-join, local to the batch's neighborhood."""
    spark = sym.sparkSession
    b = F.broadcast(
        spark.createDataFrame([(int(x),) for x in sorted(set(batch))], "bn long")
    )
    e1 = sym.join(b.withColumnRenamed("bn", "src"), "src", "left_semi").select(
        F.col("src").alias("u"), F.col("dst").alias("x")
    )
    pairs = (
        e1.join(e1.withColumnRenamed("x", "y"), "u")
        .filter(F.col("x") < F.col("y"))
        .select("u", F.col("x").alias("v"), F.col("y").alias("w"))
    )
    closed = pairs.join(
        sym.select(F.col("src").alias("v"), F.col("dst").alias("w")), ["v", "w"], "left_semi"
    )
    return closed.collect()


def local_t(edges: DataFrame, seeds, max_pops: int = 100_000) -> set[int]:
    """LocalT (``cpp/scd/LocalT.cpp``): greedy expansion maximizing
    ``max(0, T_in * (T_in - T_ext))`` where T_in counts triangles fully
    inside the community and T_ext triangles with exactly one community
    vertex; equal scores prefer fewer external triangles (the reference's
    none-initialized comparison accepts equal-score candidates). Triangle
    triples are fetched once per node via the batched wedge join; the
    greedy loop classifies cached triples driver-side. Deterministic
    tie-break: smallest node id (the reference iterates an unordered_set)."""
    sym = _sym(edges).persist()
    com = set(int(s) for s in seeds)
    adj: dict[int, list[int]] = {}
    tri: dict[int, list[tuple[int, int]]] = {}
    known: set[int] = set()

    def ensure(nodes_):
        todo = sorted(set(nodes_) - known)
        if not todo:
            return
        known.update(todo)
        for x in todo:
            adj[x] = []
            tri[x] = []
        spark = sym.sparkSession
        b = F.broadcast(spark.createDataFrame([(x,) for x in todo], "bn long"))
        for r in (
            sym.join(b.withColumnRenamed("bn", "src"), "src", "left_semi")
            .select("src", "dst")
            .collect()
        ):
            adj[r["src"]].append(r["dst"])
        for r in _batch_triangles(sym, todo):
            tri[r["u"]].append((r["v"], r["w"]))

    ensure(com)
    shell: set[int] = set()
    for u in com:
        shell.update(v for v in adj[u] if v not in com)
    ensure(shell)

    def classify(x):
        ti = se = ex = 0
        for a, b2 in tri[x]:
            ina, inb = a in com, b2 in com
            if ina and inb:
                ti += 1
            elif ina or inb:
                se += 1
            else:
                ex += 1
        return ti, se, ex

    def score(t_in, t_ext):
        return max(0, t_in * (t_in - t_ext))

    pops = 0
    while pops < max_pops:
        pops += 1
        cur_int3 = 0
        cur_ext = 0
        for u in com:
            ti, _, ex = classify(u)
            cur_int3 += ti
            cur_ext += ex
        cur_int = cur_int3 // 3
        best, best_ext = None, None
        best_score = score(cur_int, cur_ext)
        for v in sorted(shell):
            iv, sv, ev = classify(v)
            ni, ne = cur_int + iv, cur_ext + ev - sv
            nsc = score(ni, ne)
            # LocalT.cpp:170-175: bestExternalTriangles starts at none (inf),
            # so the FIRST equal-score candidate is also accepted
            if nsc > best_score or (
                nsc == best_score and (best_ext is None or ne < best_ext)
            ):
                best, best_score, best_ext = v, nsc, ne
        if best is None:
            break
        com.add(best)
        shell.discard(best)
        new_nbrs = set()
        ensure([best])
        new_nbrs.update(v for v in adj[best] if v not in com)
        ensure(new_nbrs)
        shell.update(new_nbrs)
    sym.unpersist()
    return com


def clique_detect(edges: DataFrame, seeds) -> set[int]:
    """CliqueDetect (``cpp/scd/CliqueDetect.cpp``): community = seeds plus
    the maximum(-weight) clique among the common neighbors of all seeds.
    Clique enumeration runs on the induced subgraph via the distributed
    Bron-Kerbosch operator; ties pick the lexicographically smallest
    clique (deterministic stand-in for the reference's uniform random
    selector, documented divergence)."""
    from networkit_spark.operators.cliques import maximal_cliques

    spark = edges.sparkSession
    sym = _sym(edges).persist()
    seeds = sorted(int(s) for s in seeds)
    com = set(seeds)
    b = F.broadcast(spark.createDataFrame([(s,) for s in seeds], "bn long"))
    rows = (
        sym.join(b.withColumnRenamed("bn", "src"), "src", "left_semi")
        .select("src", "dst", "weight")
        .collect()
    )
    from collections import defaultdict

    cnt: dict[int, int] = defaultdict(int)
    wsum: dict[int, float] = defaultdict(float)
    weighted = False
    for r in rows:
        if r["dst"] not in com:
            cnt[r["dst"]] += 1
            wsum[r["dst"]] += float(r["weight"])
        if float(r["weight"]) != 1.0:
            weighted = True
    common = sorted(v for v, c in cnt.items() if c == len(seeds))
    if not common:
        sym.unpersist()
        return com
    cdf = F.broadcast(spark.createDataFrame([(v,) for v in common], "cn long"))
    induced = (
        sym.join(cdf.withColumnRenamed("cn", "src"), "src", "left_semi")
        .join(cdf.withColumnRenamed("cn", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    w_of = {}
    for r in induced.filter("src < dst").collect():
        w_of[(r["src"], r["dst"])] = float(r["weight"])
    cliques = [
        sorted(r["clique"])
        for r in maximal_cliques(
            induced, spark.createDataFrame([(v,) for v in common], "id long")
        ).collect()
    ]
    if not cliques:
        cliques = [[v] for v in common]
    if not weighted:
        best = min(cliques, key=lambda c: (-len(c), c))
    else:
        def cw(c):
            inner = sum(
                w_of.get((min(a, b2), max(a, b2)), 0.0)
                for i, a in enumerate(c) for b2 in c[i + 1:]
            )
            return inner + sum(wsum[v] for v in c)

        best = min(cliques, key=lambda c: (-cw(c), c))
    sym.unpersist()
    return com | set(best)


def random_bfs_community(
    edges: DataFrame,
    seeds,
    com_size: int | None = None,
    cover: DataFrame | None = None,
    seed: int = 42,
) -> set[int]:
    """RandomBFS baseline (``cpp/scd/RandomBFS.cpp``): BFS from the seeds,
    admitting whole levels until the target size, with a seeded shuffle of
    the last partial level. The target size is ``com_size``, or — like the
    reference's Cover constructor — the size of the common ground-truth
    community of all seeds (``cover`` = (node, subset); the reference picks
    a random common subset, this twin picks the smallest subset id,
    documented divergence). One broadcast frontier join per BFS level."""
    import random as _random

    spark = edges.sparkSession
    sym = _sym(edges).persist()
    seeds = sorted(int(s) for s in seeds)
    size = com_size if com_size is not None else len(seeds)
    if cover is not None:
        rows = cover.join(
            F.broadcast(spark.createDataFrame([(s,) for s in seeds], "node long")),
            "node",
            "left_semi",
        ).collect()
        by_seed = {}
        for r in rows:
            by_seed.setdefault(r["node"], set()).add(r["subset"])
        common = set.intersection(*(by_seed.get(s, set()) for s in seeds)) if seeds else set()
        if common:
            pick = min(common)
            size = cover.filter(F.col("subset") == pick).count()

    rng = _random.Random(seed)
    result: set[int] = set()
    current = list(seeds)
    visited = set(seeds)
    while len(result) < size and current:
        if len(current) + len(result) < size:
            result.update(current)
        else:
            rng.shuffle(current)
            for u in current:
                if len(result) >= size:
                    break
                result.add(u)
            break
        b = F.broadcast(
            spark.createDataFrame([(u,) for u in sorted(current)], "bn long")
        )
        nxt = sorted(
            r["dst"]
            for r in sym.join(b.withColumnRenamed("bn", "src"), "src", "left_semi")
            .select("dst")
            .distinct()
            .collect()
            if r["dst"] not in visited
        )
        visited.update(nxt)
        current = nxt
    sym.unpersist()
    return result


def combined_scd(edges: DataFrame, seeds, first, second) -> set[int]:
    """CombinedSCD (``cpp/scd/CombinedSCD.cpp:9-15``): expand with
    ``first``, feed the result as the seed set of ``second``."""
    mid = first(edges, seeds)
    if not mid:
        return set(int(s) for s in seeds)
    return second(edges, mid)


def local_t_shell_counts_df(edges: DataFrame, members) -> DataFrame:
    """LocalT's per-shell-node triangle classification (``LocalT.cpp``,
    the quantities the greedy consumes), fully distributed: for each shell
    node v, count triangles (v, a, b) with both / exactly one / neither of
    a, b in the community. Returns (node, t_int, t_semi, t_ext)."""
    spark = edges.sparkSession
    sym = _sym(edges)
    mem_ids = sorted(set(int(x) for x in members))
    mem = F.broadcast(spark.createDataFrame([(x,) for x in mem_ids], "m long"))
    shell = (
        sym.join(mem.withColumnRenamed("m", "src"), "src", "left_semi")
        .join(mem.withColumnRenamed("m", "dst"), "dst", "left_anti")
        .select(F.col("dst").alias("v"))
        .distinct()
    )
    nb = sym.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    n1 = nb.join(shell, "v", "left_semi")
    pairs = (
        n1.join(n1.withColumnRenamed("x", "y"), "v")
        .filter(F.col("x") < F.col("y"))
        .join(
            sym.select(F.col("src").alias("x"), F.col("dst").alias("y")),
            ["x", "y"],
            "left_semi",
        )
    )
    in_mem = lambda c: F.col(c).isin(mem_ids)
    return (
        pairs.groupBy(F.col("v").alias("node"))
        .agg(
            F.sum((in_mem("x") & in_mem("y")).cast("long")).alias("t_int"),
            F.sum((in_mem("x") != in_mem("y")).cast("long")).alias("t_semi"),
            F.sum((~in_mem("x") & ~in_mem("y")).cast("long")).alias("t_ext"),
        )
    )
