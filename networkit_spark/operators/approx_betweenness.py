"""ε-δ ApproxBetweenness (Riondato–Kornaropoulos path sampling).

Reference: ``cpp/centrality/ApproxBetweenness.cpp:29-100`` — sample
``r = ceil((c/eps^2) * (floor(log2(vd-2)) + 1 - ln(delta)))`` random node
pairs (``:45``; ``vd`` = pedantic vertex-diameter estimate,
``Diameter.cpp:289-331``), run an SSSP per sample, random-walk one shortest
path backward choosing each predecessor ``z`` with probability
``sigma_z / sigma_t`` (``:79-95``), add ``1/r`` to every interior node.
Guarantee: every score within ``eps`` of the normalized betweenness with
probability ``1 - delta``.

Distributed shape (everything batched — no per-sample loops over the
cluster):

1. ``vd``: connected components -> one BFS source per component (its min
   node id, the deterministic analog of the reference's first-unvisited
   iteration order) -> ONE multi-source BFS -> ``max(d1 + d2) + 1`` where
   d1, d2 are the two largest levels per source (``Diameter.cpp:296-309``).
2. samples: ``spark.range(r)`` + portable LCG hash over the dense node
   domain (the reference draws from an RNG; ours is hash-seeded so runs are
   reproducible — statistically the same sampler).
3. one multi-source BFS **with path counts** sigma over the distinct sample
   sources, materializing the shortest-path DAG ``(source, node, pred,
   sigma_pred)``;
4. backward path sampling for ALL samples simultaneously: per step one join
   against the DAG + a cumulative-weight window picks each sample's
   predecessor (probability sigma_z / sigma_t, exactly the reference's
   weighted choice), accumulating 1/r per interior node.

Path counts use double (the reference uses bigfloat; at sampled-source
batch sizes the counts stay far below 2^53 on the graphs this engine
targets — documented divergence).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import aqe_disabled

_M31 = 2147483647


def _lcg(col, salt: int, seed: int):
    """Portable deterministic uniform in [0, 2^31-1)."""
    return F.pmod(
        F.pmod(col, F.lit(_M31)) * F.lit(1103515245) + F.lit(salt * 12345 + seed),
        F.lit(_M31),
    )


def bfs_with_sigma(
    edges: DataFrame, sources: DataFrame, max_rounds: int = 10_000
) -> tuple[DataFrame, DataFrame]:
    """Multi-source BFS with shortest-path counts.

    Returns (dist(source, node, dist, sigma), preds(source, node, pred,
    sigma_pred)) — the Brandes forward pass, level-synchronous, all sources
    in one job.
    """
    from networkit_spark.operators.distance import _expand, _persist_by_src

    e = _persist_by_src(edges, "src", "dst")
    e.count()
    dist = sources.select(
        F.col("id").alias("source"),
        F.col("id").alias("node"),
        F.lit(0).cast("long").alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = dist
    cnt = dist.count()
    preds = None
    for _ in range(max_rounds):
        reach = (
            _expand(e, frontier, cnt)
            .select(
                "source",
                F.col("dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
                F.col("src").alias("pred"),
                F.col("sigma").alias("sigma_pred"),
            )
            .join(dist.select("source", "node"), ["source", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if reach.isEmpty():
            break
        new_preds = reach.select("source", "node", "pred", "sigma_pred")
        preds = new_preds if preds is None else preds.union(new_preds)
        nxt = reach.groupBy("source", "node", "dist").agg(
            F.sum("sigma_pred").alias("sigma")
        ).localCheckpoint(eager=True)
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
        cnt = nxt.count()
    e.unpersist()
    if preds is None:
        preds = dist.sparkSession.createDataFrame(
            [], "source long, node long, pred long, sigma_pred double"
        )
    else:
        preds = preds.localCheckpoint(eager=True)
    return dist, preds


def vertex_diameter_pedantic(edges: DataFrame, nodes: DataFrame | None = None) -> int:
    """``Diameter.cpp:289-331`` estimatedVertexDiameterPedantic: per
    component, BFS from one representative (min node id — deterministic);
    vd = max over components of (largest + second-largest BFS level) + 1."""
    from networkit_spark.operators.components import ConnectedComponents

    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    labels = ConnectedComponents().run(edges, nodes).labels_df
    sources = labels.select(F.col("label").alias("id")).distinct()
    from networkit_spark.operators.distance import multi_source_bfs

    d = multi_source_bfs(edges, sources)
    # two largest distances WITH multiplicity (Diameter.cpp:296-309: a
    # second node at the max level makes maxDist2 == maxDist)
    lv = d.groupBy("source", "dist").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("dist"))
    top2 = lv.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    per_src = top2.groupBy("source").agg(
        F.max(F.when(F.col("rk") == 1, F.col("dist"))).alias("d1"),
        F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("rk") == 2, F.col("dist"))).alias("d2"),
    ).select(
        (
            F.col("d1")
            + F.when(F.col("c1") >= 2, F.col("d1")).otherwise(
                F.coalesce(F.col("d2"), F.lit(0))
            )
        ).alias("dd")
    )
    row = per_src.agg(F.max("dd")).first()
    return int(row[0] or 0) + 1


def num_samples(vd: int, eps: float, delta: float, c: float = 1.0) -> int:
    """``ApproxBetweenness.cpp:45`` sample-count formula (c = the universal
    constant, default 1.0; reference anchor: eps=.01, delta=.1, vd=10 ->
    63026 samples, ``networkit/test/test_centrality.py:32-35``)."""
    if vd <= 2:
        return 0
    return math.ceil(
        (c / (eps * eps)) * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))
    )


def sample_pairs(
    nd: DataFrame, n: int, sid_start: int, r: int, seed: int
) -> DataFrame:
    """``r`` deterministic (u != v) node-pair samples with sample ids
    ``[sid_start, sid_start + r)`` — distinct sids are independent LCG
    streams, so adaptive callers (KADABRA epochs) extend the sample set by
    advancing ``sid_start``. ``nd`` = (idx, id) dense node index."""
    spark = nd.sparkSession
    sid = spark.range(sid_start, sid_start + r).select(F.col("id").alias("sid"))
    u_pick = F.pmod(_lcg(F.col("sid"), 1, seed), F.lit(n))
    # v != u: offset in [1, n) added mod n
    v_off = F.pmod(_lcg(F.col("sid"), 2, seed), F.lit(n - 1)) + 1
    samples = sid.select(
        "sid", u_pick.alias("ui"), F.pmod(u_pick + v_off, F.lit(n)).alias("vi")
    )
    return (
        samples.join(nd.select(F.col("idx").alias("ui"), F.col("id").alias("u")), "ui")
        .join(nd.select(F.col("idx").alias("vi"), F.col("id").alias("v")), "vi")
        .select("sid", "u", "v")
        .localCheckpoint(eager=True)
    )


def path_sample_contribs(edges: DataFrame, samples: DataFrame, seed: int) -> DataFrame:
    """Per-sample interior nodes of one uniformly-random shortest path per
    pair (sid, node) — the un-aggregated form of :func:`path_sample_hits`,
    kept by DynApproxBetweenness so single samples can be replaced per
    event."""
    return _path_sample_walk(edges, samples, seed)


def path_sample_hits(edges: DataFrame, samples: DataFrame, seed: int) -> DataFrame:
    """One uniformly-random shortest path per sample pair, all samples
    batched: forward multi-source Brandes BFS over the distinct sources,
    then the backward sigma-weighted walk for every sample simultaneously
    (one DAG join + cumulative-weight window per path step). Returns raw
    interior-node hit counts (node, hits long) — unreachable pairs
    contribute nothing (but the caller still counts them as samples, like
    the reference's early-return ``randomPath``)."""
    contribs = _path_sample_walk(edges, samples, seed)
    if contribs.isEmpty():
        return samples.sparkSession.createDataFrame([], "node long, hits long")
    return contribs.groupBy("node").agg(F.count("*").alias("hits"))


def _path_sample_walk(edges: DataFrame, samples: DataFrame, seed: int) -> DataFrame:
    """Shared walk: returns (sid, node) rows, one per interior node."""
    srcs = samples.select(F.col("u").alias("id")).distinct()
    dist, preds = bfs_with_sigma(edges, srcs)
    dist = dist.localCheckpoint(eager=True)

    # active walks: samples whose target is reachable
    active = (
        samples.join(
            dist.select(F.col("source").alias("u"), F.col("node").alias("v"), "dist"),
            ["u", "v"],
        )
        .select("sid", "u", F.col("v").alias("t"), F.col("dist").alias("steps"))
        .localCheckpoint(eager=True)
    )
    max_steps = active.agg(F.max("steps")).first()[0] or 0
    contribs = None
    for _ in range(int(max_steps)):
        live = active.filter(F.col("t") != F.col("u"))
        if live.isEmpty():
            break
        cand = live.join(
            preds.withColumnRenamed("source", "u").withColumnRenamed("node", "t"),
            ["u", "t"],
        )
        # weighted choice z ~ sigma_pred / sigma_t: cumulative weights per
        # sid in (pred asc) order; threshold = uniform * sigma_t
        wspec = Window.partitionBy("sid").orderBy("pred")
        cand = cand.withColumn(
            "cum", F.sum("sigma_pred").over(wspec)
        ).withColumn("tot", F.sum("sigma_pred").over(Window.partitionBy("sid")))
        urand = (
            _lcg(F.col("sid") * F.lit(31) + F.col("t"), 3, seed).cast("double")
            / F.lit(float(_M31))
        )
        chosen = (
            cand.withColumn("thr", urand * F.col("tot"))
            .filter(F.col("cum") > F.col("thr"))
            .withColumn(
                "rk", F.row_number().over(Window.partitionBy("sid").orderBy("pred"))
            )
            .filter(F.col("rk") == 1)
            .select("sid", "u", F.col("pred").alias("t"))
            .localCheckpoint(eager=True)
        )
        step_contrib = chosen.filter(F.col("t") != F.col("u")).select(
            "sid", F.col("t").alias("node")
        )
        contribs = step_contrib if contribs is None else contribs.union(step_contrib)
        active = chosen
    if contribs is None:
        return samples.sparkSession.createDataFrame([], "sid long, node long")
    return contribs.localCheckpoint(eager=True)


def approx_betweenness(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    eps: float = 0.1,
    delta: float = 0.1,
    c: float = 1.0,
    seed: int = 42,
    vd: int | None = None,
) -> tuple[DataFrame, int]:
    """(scores(node, score), r). Scores are normalized (each within eps of
    betweenness/(n(n-1)) w.p. 1-delta, per the RK bound)."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        if vd is None:
            vd = vertex_diameter_pedantic(edges, nodes)
        r = num_samples(vd, eps, delta, c)
        zero = nodes.select(F.col("id").alias("node"), F.lit(0.0).alias("score"))
        if r == 0:
            return zero, 0

        # dense index over nodes so LCG indices map uniformly
        from networkit_spark.plans.ids import dense_ids

        nd = dense_ids(nodes.select(F.col("id")), "id", id_col="idx").select(
            F.col("idx"), F.col("id")
        ).persist()
        n = nd.count()
        samples = sample_pairs(nd, n, 0, r, seed)
        hits = path_sample_hits(edges, samples, seed)
        inc = 1.0 / r
        scores = (
            nodes.select(F.col("id").alias("node"))
            .join(hits, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("hits"), F.lit(0)) * F.lit(inc)).alias("score"),
            )
        )
        nd.unpersist()
        return scores, r
