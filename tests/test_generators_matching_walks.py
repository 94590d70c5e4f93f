from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.matching import (
    is_valid_matching,
    local_max_matching,
    matching_weight,
)
from networkit_spark.operators.walks import random_walks, walk_cooccurrences
from networkit_spark.sources.generators import (
    gnm,
    planted_partition,
    powerlaw_digraph,
    rmat,
    watts_strogatz,
)


def test_gnm_basic(spark):
    e = gnm(spark, 100, 300)
    assert 250 <= e.count() <= 300  # dedupe + self-loop removal shrinks a bit
    assert e.filter("src = dst").count() == 0
    assert e.filter("src >= 100 or dst >= 100 or src < 0").count() == 0
    # deterministic
    assert e.count() == gnm(spark, 100, 300).count()


def test_powerlaw_skew(spark):
    e = powerlaw_digraph(spark, 1000, 5000, gamma=2.2)
    deg = e.groupBy("dst").count()
    top = deg.agg(F.max("count")).first()[0]
    avg = deg.agg(F.avg("count")).first()[0]
    assert top > 5 * avg  # heavy hub skew


def test_rmat_shape(spark):
    e = rmat(spark, scale=8, edge_factor=4)
    assert e.filter("src >= 256 or dst >= 256").count() == 0
    assert e.count() > 500


def test_watts_strogatz(spark):
    e = watts_strogatz(spark, 50, k=4, beta=0.0)
    # no rewiring: each node points to 2 clockwise neighbors
    assert e.count() == 100
    e2 = watts_strogatz(spark, 50, k=4, beta=1.0)
    assert e2.count() <= 100  # rewiring may collide/dedupe


def test_planted_partition_structure(spark):
    e = planted_partition(spark, blocks=4, block_size=25, m_in=80, m_out=10)
    intra = e.filter((F.col("src") / 25).cast("int") == (F.col("dst") / 25).cast("int"))
    assert intra.count() > e.count() * 0.8  # overwhelmingly intra-block


def test_matching_path(spark):
    # P4: 0-1-2-3 -> maximal matching of 2 edges
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    m = local_max_matching(e)
    assert is_valid_matching(m)
    assert m.count() == 2


def test_matching_star_one_edge(spark):
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 6)]))
    m = local_max_matching(e)
    assert is_valid_matching(m)
    assert m.count() == 1


def test_matching_prefers_heavy(spark):
    # triangle with one heavy edge: heavy edge must be matched
    e = symmetrize(edges_df(spark, [(0, 1, 10.0), (1, 2, 1.0), (0, 2, 1.0)], weighted=True))
    m = local_max_matching(e)
    rows = m.collect()
    assert len(rows) == 1 and (rows[0]["u"], rows[0]["v"]) == (0, 1)
    assert matching_weight(m) == 10.0


def test_random_walks_shape_and_determinism(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    w = random_walks(e, walks_per_node=2, length=4)
    assert w.count() == 4 * 2 * 4  # nodes * walks * steps
    # every consecutive step is an actual edge
    a = w.select("walk_id", F.col("step").alias("s"), F.col("node").alias("a"))
    b = w.select("walk_id", (F.col("step") - 1).alias("s"), F.col("node").alias("b"))
    hops = a.join(b, ["walk_id", "s"]).select(F.col("b").alias("src"), F.col("a").alias("dst"))
    bad = hops.join(e.select("src", "dst"), ["src", "dst"], "left_anti").count()
    assert bad == 0
    w2 = random_walks(e, walks_per_node=2, length=4)
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))


def test_walk_cooccurrences(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2)]))
    w = random_walks(e, walks_per_node=1, length=3)
    co = walk_cooccurrences(w, window=1)
    assert co.filter("a = b").count() == 0
    assert co.count() > 0
