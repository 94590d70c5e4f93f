"""NodeDistance family + r-ball volume + bounded / bidirectional Dijkstra.

Reference semantics:

- ``cpp/distance/JaccardDistance.cpp:40-42`` — per-edge distance
  ``1 - t / (deg(u) + deg(v) - t)`` from the edge's triangle count ``t``.
- ``cpp/distance/AdamicAdarDistance.cpp:29-54`` — per-edge Adamic-Adar sum
  over common neighbors ``w``: ``sum 1/log(deg(w))``, then distance = its
  reciprocal.
- ``cpp/distance/Volume.cpp:14-66`` — sampled r-ball volume: average number
  of nodes within (weighted) distance ``r`` of a random node, single- and
  multi-radius forms.
- ``cpp/distance/IncompleteDijkstra.cpp`` — Dijkstra bounded to a distance
  horizon (the building block the reference uses for pruned searches).
- ``cpp/distance/BidirectionalDijkstra.cpp`` — s-t distance by alternating
  forward/backward searches that stop once the frontiers cannot improve the
  best meeting distance.
- ``cpp/distance/ReverseBFS.cpp`` — BFS over in-edges.

Distributed form: all of these reuse the frontier-relaxation skeleton from
``operators/distance.py`` (Bellman rounds; each round shuffles only
frontier-adjacent edges). The ball/bounded variants additionally *prune the
frontier at the distance horizon*, so work stays proportional to the ball
size, not the graph — the property that makes sampled Volume viable at
100 TB. Edge attributizers (Jaccard / Adamic-Adar) are one wedge join +
one groupBy — the same arboricity-bounded shape as the triangle kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.operators.sampling import _draw
from networkit_spark.operators.triangles import triangle_edge_score


def _degrees(und_edges: DataFrame) -> DataFrame:
    return und_edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )


def jaccard_distance(und_edges: DataFrame) -> DataFrame:
    """(src, dst, score, distance) per canonical (src < dst) undirected edge.

    ``JaccardDistance.cpp:40-42``: distance = 1 - t/(deg(u)+deg(v)-t) where
    t is the number of triangles through the edge. ``score`` is the Jaccard
    similarity itself (the complement), matching getEdgeScores().
    """
    t = triangle_edge_score(und_edges)
    deg = _degrees(und_edges)
    sim = (
        t.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "du"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "dv"), "dst")
        .select(
            "src",
            "dst",
            (F.col("score") / (F.col("du") + F.col("dv") - F.col("score"))).alias("score"),
        )
    )
    return sim.select("src", "dst", "score", (1.0 - F.col("score")).alias("distance"))


def adamic_adar_distance(und_edges: DataFrame) -> DataFrame:
    """(src, dst, aa, distance) per canonical undirected edge.

    ``AdamicAdarDistance.cpp:29-54``: every triangle {u, v, w} adds
    ``1/log(deg(w))`` to edge (u, v) (and symmetrically for the other two
    edges); the final distance is ``1/aa``. Edges on no triangle have
    aa = 0 — the reference's 1/0 = inf is surfaced as NULL here.

    Plan: common-neighbor wedge join on the canonical edge table (the same
    oriented-wedge shape as the triangle kernel), then one groupBy per edge.
    """
    deg = _degrees(und_edges)
    canon = und_edges.filter(F.col("src") < F.col("dst")).select("src", "dst")
    # common neighbors of (u, v): w adjacent to both — join the full
    # symmetrized table twice, once per endpoint
    nu = und_edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    nv = und_edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = (
        canon.withColumnRenamed("src", "u").withColumnRenamed("dst", "v")
        .join(nu, "u")
        .join(nv, ["v", "w"])
    )
    aa = (
        wedges.join(deg.withColumnRenamed("node", "w"), "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("deg"))).alias("aa"))
    )
    return (
        canon.withColumnRenamed("src", "u").withColumnRenamed("dst", "v")
        .join(aa, ["u", "v"], "left")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.coalesce(F.col("aa"), F.lit(0.0)).alias("aa"),
            F.when(F.col("aa") > 0, 1.0 / F.col("aa")).alias("distance"),
        )
    )


def reverse_bfs(edges: DataFrame, source: int, **kw) -> DataFrame:
    """(node, dist) following IN-edges (``ReverseBFS.cpp``) — BFS on the
    transpose."""
    from networkit_spark.operators.distance import bfs_distances

    t = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return bfs_distances(t, source, **kw)


def multi_source_bounded_sssp(
    edges: DataFrame,
    sources: DataFrame,
    limit: float,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(source, node, dist) weighted distances, pruned to dist <= limit.

    ``IncompleteDijkstra.cpp`` semantics batched over a source set: the
    frontier never carries a tentative distance beyond the horizon, so each
    round's shuffle is bounded by the union of the r-balls.
    """
    e = edges.select("src", "dst", "weight").persist()
    e.count()
    dist = sources.select(
        F.col("source"), F.col("node"), F.lit(0.0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(
                "source",
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("weight")).alias("nd"),
            )
            .filter(F.col("nd") <= limit)
            .groupBy("source", "node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, ["source", "node"], "full")
            .select(
                "source",
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("dist"),
                F.col("dist").alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).select("source", "node", "dist")
        dist = merged.select("source", "node", "dist")
        if frontier.count() == 0:
            break
    e.unpersist()
    return dist


def bounded_sssp(edges: DataFrame, source: int, limit: float) -> DataFrame:
    """(node, dist <= limit) from one source (``IncompleteDijkstra.cpp``)."""
    spark = edges.sparkSession
    src = spark.createDataFrame([(source, source)], "source long, node long")
    return multi_source_bounded_sssp(edges, src, limit).select("node", "dist")


def volume_sources(
    edges: DataFrame, samples: int, seed: int = 42, n: int | None = None
) -> DataFrame:
    """(sample_id, source): portable seeded node draws (``Volume.cpp:42``
    uses GraphTools::randomNode per sample; here source_s =
    md5-draw('vol', seed, s) % n so any engine replays the choice).
    Assumes dense node ids 0..n-1 (the repo-wide dictionary-encode contract).
    """
    spark = edges.sparkSession
    if n is None:
        n = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
            .count()
        )
    return spark.range(samples).select(
        F.col("id").alias("sample_id"),
        (_draw("vol", seed, F.col("id")) % n).alias("source"),
    )


def ball_sizes(
    edges: DataFrame,
    r: float,
    samples: int,
    seed: int = 42,
    n: int | None = None,
) -> DataFrame:
    """(sample_id, source, ball): nodes within weighted distance r of each
    sampled source, start node included (``Volume.cpp:14-37``)."""
    srcs = volume_sources(edges, samples, seed, n)
    d = multi_source_bounded_sssp(
        edges, srcs.select(F.col("sample_id").alias("source"), F.col("source").alias("node")), r
    )
    counts = d.groupBy(F.col("source").alias("sample_id")).agg(
        F.count("*").alias("ball")
    )
    return srcs.join(counts, "sample_id").select("sample_id", "source", "ball")


def volume(edges: DataFrame, r: float, samples: int, seed: int = 42) -> float:
    """Average r-ball size over sampled sources (``Volume.cpp:39-45``)."""
    row = ball_sizes(edges, r, samples, seed).agg(F.avg("ball")).first()
    return float(row[0] or 0.0)


def volume_multi(
    edges: DataFrame, rs: list[float], samples: int, seed: int = 42
) -> list[float]:
    """Multi-radius form (``Volume.cpp:47-66``): one ball computation at
    max(rs), each radius read off the same distance table."""
    rmax = max(rs)
    srcs = volume_sources(edges, samples, seed)
    d = multi_source_bounded_sssp(
        edges,
        srcs.select(F.col("sample_id").alias("source"), F.col("source").alias("node")),
        rmax,
    )
    aggs = [
        F.sum(F.when(F.col("dist") <= ri, 1).otherwise(0)).alias(f"r{i}")
        for i, ri in enumerate(rs)
    ]
    row = d.agg(*aggs).first()
    return [float((row[f"r{i}"] or 0)) / samples for i in range(len(rs))]


def bidirectional_dijkstra(
    edges: DataFrame, source: int, target: int, max_rounds: int = 10_000
) -> float | None:
    """s-t weighted distance (``BidirectionalDijkstra.cpp``): forward waves
    on out-edges and backward waves on in-edges advance together; ``best``
    tracks the cheapest meeting node, and every frontier entry whose
    tentative distance already reaches ``best`` is pruned (any s-t path it
    could extend is at least that long — exact for non-negative weights).
    Returns None when unreachable.
    """
    spark = edges.sparkSession
    ef = edges.select("src", "dst", "weight").persist()
    eb = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    ).persist()
    ef.count(), eb.count()
    df = spark.createDataFrame([(source, 0.0)], "node long, dist double")
    db = spark.createDataFrame([(target, 0.0)], "node long, dist double")
    ff, fb = df, db
    best = float("inf") if source != target else 0.0

    def _advance(e, dist, frontier):
        cand = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("dist"),
                F.col("dist").alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        newf = merged.filter(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).select("node", "dist")
        return merged.select("node", "dist"), newf

    for _ in range(max_rounds):
        ff = ff.filter(F.col("dist") < best).localCheckpoint(eager=True)
        fb = fb.filter(F.col("dist") < best).localCheckpoint(eager=True)
        nf, nb = ff.count(), fb.count()
        if nf == 0 and nb == 0:
            break
        if nf > 0:
            df, ff = _advance(ef, df, ff)
        if nb > 0:
            db, fb = _advance(eb, db, fb)
        meet = (
            df.withColumnRenamed("dist", "dfwd")
            .join(db.withColumnRenamed("dist", "dbwd"), "node")
            .agg(F.min(F.col("dfwd") + F.col("dbwd")))
            .first()[0]
        )
        if meet is not None:
            best = min(best, float(meet))
    ef.unpersist(), eb.unpersist()
    return None if best == float("inf") else best


def graph_distance(
    edges: DataFrame, u: int, v: int, weighted: bool = False
) -> float | None:
    """``distance/GraphDistance.cpp`` front door: the (weighted) distance
    between two nodes — BFS when unweighted, Dijkstra otherwise; the
    bidirectional pruned search is the distributed strategy for both.
    Returns None when unreachable."""
    e = edges if weighted else edges.withColumn("weight", F.lit(1.0))
    return bidirectional_dijkstra(e, u, v)
