from pyspark.sql import functions as F

from networkit_spark.plans.skew import hot_keys, salted_join


def test_salted_join_matches_plain_join(spark):
    # big: node 0 is a hot src (200 rows), others cold
    rows = [(0, d) for d in range(1, 201)] + [(i, i + 1) for i in range(1, 50)]
    big = spark.createDataFrame(rows, "src long, dst long")
    small = spark.createDataFrame([(i, float(i)) for i in range(0, 60)], "src long, score double")

    plain = {(r["src"], r["dst"], r["score"]) for r in big.join(small, "src").collect()}
    salted = {
        (r["src"], r["dst"], r["score"])
        for r in salted_join(big, small, "src", n_salt=4, hot_threshold=100, salt_by="dst").collect()
    }
    assert salted == plain


def test_hot_keys_detection(spark):
    rows = [(0, d) for d in range(150)] + [(1, d) for d in range(10)]
    big = spark.createDataFrame(rows, "src long, dst long")
    hot = [r["src"] for r in hot_keys(big, "src", 100).collect()]
    assert hot == [0]


def test_salted_join_spreads_hot_rows(spark):
    rows = [(0, d) for d in range(1000)]
    big = spark.createDataFrame(rows, "src long, dst long")
    small = spark.createDataFrame([(0, 1.0)], "src long, score double")
    out = salted_join(big, small, "src", n_salt=8, hot_threshold=100, salt_by="dst")
    assert out.count() == 1000
    # verify the salt column actually spread the rows across >1 value
    bh = big.withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(8)))
    assert bh.select("salt").distinct().count() > 4


def test_pagerank_with_salting_matches(spark):
    import numpy as np

    from networkit_spark.graph import edges_df, nodes_range
    from networkit_spark.operators.pagerank import PageRank

    # hub node 0 with very high out-degree + ring
    edges = [(0, i) for i in range(1, 60)] + [(i, (i + 1) % 60) for i in range(1, 60)]
    e = edges_df(spark, [p for p in edges if p[0] != p[1]])
    nodes = nodes_range(spark, 60)
    a = PageRank(tol=1e-10).run(e, nodes, directed=True).scores()
    b = PageRank(tol=1e-10, salt_hot_sources=4, hot_threshold=10).run(
        e, nodes, directed=True
    ).scores()
    av = np.array([r["score"] for r in sorted(a.collect(), key=lambda r: r["node"])])
    bv = np.array([r["score"] for r in sorted(b.collect(), key=lambda r: r["node"])])
    assert np.allclose(av, bv, atol=1e-12)
