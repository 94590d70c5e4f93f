"""Node2Vec back half: p/q-biased second-order walks + embedding training.

Reference: ``cpp/embedding/Node2Vec.cpp`` + ``BiasedRandomWalk.cpp`` (walks)
feeding word2vec SGNS. Distributed re-expression:

- **Biased walks**: the second-order transition from (prev -> cur) weights
  each candidate c in N(cur) by 1/p if c == prev ("return"), 1 if
  c in N(prev) ("stay close" — triangle edge), else 1/q ("explore") —
  ``BiasedRandomWalk.cpp`` semantics. Per step this is one join of the walk
  frontier against the adjacency + one broadcast-free edge-existence
  semi-join + a cumulative-weight window that realizes the weighted choice
  with a portable deterministic hash (reproducible under any parallelism).
- **Training**: word2vec-with-negative-sampling is equivalent (Levy &
  Goldberg 2014, public result) to factorizing the pointwise-mutual-
  information matrix of the co-occurrence counts. We therefore train
  embeddings by ALS matrix factorization over the walk co-occurrence
  counts (pyspark.ml ALS, implicit-feedback mode) — fully distributed,
  no Python SGD loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.operators.walks import capped_sorted_adjacency, walk_hash
from networkit_spark.plans.iteration import truncate_lineage

_M31 = 2147483647


def biased_random_walks(
    und_edges: DataFrame,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    length: int = 5,
    seed: int = 42,
    max_neighbors: int = 10_000,
) -> DataFrame:
    """(walk_id, step, node) node2vec walks with return parameter ``p`` and
    in-out parameter ``q``. First step is uniform (no prev); subsequent
    steps follow the second-order bias."""
    e = und_edges.select("src", "dst").persist()
    e.count()
    adj = truncate_lineage(capped_sorted_adjacency(und_edges, max_neighbors))
    starts = (
        adj.select(F.col("src").alias("node"))
        .crossJoin(
            und_edges.sparkSession.range(walks_per_node).select(F.col("id").alias("r"))
        )
        .select(
            (F.col("node") * walks_per_node + F.col("r")).alias("walk_id"),
            F.col("node").alias("cur"),
        )
    )
    # step 1: uniform choice (matches walks.py)
    first = (
        starts.join(adj.withColumnRenamed("src", "cur"), "cur")
        .select(
            "walk_id",
            F.col("cur").alias("prev"),
            F.element_at(
                "nbrs",
                (F.pmod(walk_hash(F.col("walk_id"), 1, seed), F.size("nbrs")) + 1).cast("int"),
            ).alias("cur"),
        )
    )
    out = starts.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node")).unionByName(
        first.select("walk_id", F.lit(1).alias("step"), F.col("cur").alias("node"))
    )
    state = truncate_lineage(first)
    for step in range(2, length):
        cand = (
            state.join(adj.withColumnRenamed("src", "cur"), "cur")
            .select("walk_id", "prev", "cur", F.explode("nbrs").alias("c"))
        )
        # triangle test: does edge (prev, c) exist?
        tri = e.select(F.col("src").alias("prev"), F.col("dst").alias("c"), F.lit(1).alias("is_tri"))
        cand = cand.join(tri, ["prev", "c"], "left")
        w = (
            F.when(F.col("c") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("is_tri") == 1, F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        cand = cand.withColumn("w", w)
        wspec = Window.partitionBy("walk_id").orderBy("c")
        cand = cand.withColumn("cum", F.sum("w").over(wspec)).withColumn(
            "tot", F.sum("w").over(Window.partitionBy("walk_id"))
        )
        urand = walk_hash(F.col("walk_id"), step, seed).cast("double") / F.lit(float(_M31))
        chosen = (
            cand.withColumn("thr", urand * F.col("tot"))
            .filter(F.col("cum") > F.col("thr"))
            .withColumn("rk", F.row_number().over(Window.partitionBy("walk_id").orderBy("c")))
            .filter(F.col("rk") == 1)
            .select("walk_id", F.col("cur").alias("prev"), F.col("c").alias("cur"))
        )
        chosen = truncate_lineage(chosen)
        out = out.unionByName(
            chosen.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("node"))
        )
        state = chosen
    e.unpersist()
    return out


def node2vec_embeddings(
    walks: DataFrame,
    dim: int = 16,
    window: int = 2,
    iterations: int = 10,
    reg: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """(node, embedding array<float>) trained by ALS factorization of the
    walk co-occurrence matrix (implicit feedback) — the distributed stand-in
    for word2vec SGNS (Levy-Goldberg equivalence). Requires pyspark.ml."""
    from pyspark.ml.recommendation import ALS

    from networkit_spark.operators.walks import walk_cooccurrences

    co = walk_cooccurrences(walks, window=window)
    ratings = co.select(
        F.col("a").cast("int").alias("user"),
        F.col("b").cast("int").alias("item"),
        F.col("cnt").cast("float").alias("rating"),
    )
    als = ALS(
        rank=dim,
        maxIter=iterations,
        regParam=reg,
        implicitPrefs=True,
        alpha=10.0,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    # co-occurrence is symmetric but ALS factorizes asymmetrically; the
    # standard symmetric embedding is the average of the context (item) and
    # target (user) factors (word2vec averages input/output vectors the
    # same way)
    uf = model.userFactors.select(F.col("id"), F.col("features").alias("u"))
    itf = model.itemFactors.select(F.col("id"), F.col("features").alias("v"))
    return (
        uf.join(itf, "id", "full")
        .select(
            F.col("id").cast("long").alias("node"),
            F.zip_with(
                F.coalesce("u", "v"), F.coalesce("v", "u"), lambda a, b: (a + b) / 2.0
            ).alias("embedding"),
        )
    )
