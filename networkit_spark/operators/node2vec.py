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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



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
    steps follow the second-order bias.

    Delegates to :func:`networkit_spark.operators.walks.node2vec_walks` —
    the array-fold kernel (per-candidate weights evaluated inside JVM
    higher-order functions over the capped adjacency arrays, no
    per-candidate row explosion / window sort) that is also the
    SQL-oracle-checked implementation."""
    from networkit_spark.operators.walks import node2vec_walks

    return node2vec_walks(
        und_edges,
        p=p,
        q=q,
        walks_per_node=walks_per_node,
        length=length,
        seed=seed,
        max_neighbors=max_neighbors,
    )


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
