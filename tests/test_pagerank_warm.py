"""PageRank warm start: identical fixpoint, fewer iterations after a small
perturbation; the crawl-state refresh path uses it end to end."""

from pyspark.sql import functions as F

from networkit_spark.operators.pagerank import PageRank
from networkit_spark.sources.pages import synth_pages
from networkit_spark.streaming.crawl import (
    crawl_state,
    refresh_pagerank,
    run_crawl_ingest,
)


def _edges(spark, n=80):
    docs = spark.range(n).select(F.col("id").cast("long").alias("src"))
    i = F.col("src")
    e = docs.select(
        "src", ((i * 2 + 1) % n).alias("dst")
    ).union(docs.select("src", ((i * 3 + 7) % n).alias("dst")))
    return (
        e.filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def test_warm_start_same_fixpoint_fewer_iterations(spark):
    e1 = _edges(spark)
    nodes = spark.range(80).select(F.col("id"))
    cold1 = PageRank(tol=1e-10).run(e1, nodes)
    s1 = cold1.scores()

    # perturb: add 3 edges
    extra = spark.createDataFrame(
        [(0, 40, 1.0), (1, 41, 1.0), (2, 42, 1.0)], ["src", "dst", "weight"]
    )
    e2 = e1.union(extra).distinct()
    cold2 = PageRank(tol=1e-10).run(e2, nodes)
    warm2 = PageRank(tol=1e-10).run(e2, nodes, init_scores=s1)

    a = {r.node: r.score for r in cold2.scores().collect()}
    b = {r.node: r.score for r in warm2.scores().collect()}
    assert all(abs(a[k] - b[k]) < 1e-6 for k in a)
    assert warm2.iterations < cold2.iterations


def test_crawl_refresh_pagerank(spark, tmp_path):
    pages = synth_pages(spark, 40)
    drops = str(tmp_path / "drops")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    half = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") < 20
    pages.filter(half).coalesce(1).write.mode("append").parquet(drops)
    run_crawl_ingest(spark, drops, state, ckpt)
    r1 = refresh_pagerank(spark, state, tol=1e-8)
    assert r1.iterations > 1

    pages.filter(~half).coalesce(1).write.mode("append").parquet(drops)
    run_crawl_ingest(spark, drops, state, ckpt)
    r2 = refresh_pagerank(spark, state, tol=1e-8)

    # scores match a cold run on the final state exactly (same kernel)
    d, e, _ = crawl_state(spark, state)
    cold = PageRank(tol=1e-8).run(e, d.select(F.col("nid").alias("id")))
    a = {r.node: r.score for r in cold.scores().collect()}
    b = {r.node: r.score for r in r2.scores().collect()}
    assert all(abs(a[k] - b[k]) < 1e-6 for k in a)
