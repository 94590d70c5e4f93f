"""Streaming crawl ingest: two micro-batch drops of pages must leave the
same url-level edge set and component structure as a one-shot batch ingest,
and batch replays must be no-ops."""

import os

from pyspark.sql import functions as F

from networkit_spark.operators.components import ConnectedComponents
from networkit_spark.sources.pages import extract_links, synth_pages
from networkit_spark.streaming.crawl import crawl_state, run_crawl_ingest

N = 60


def _page_id(df):
    return F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")


def _drop(pages, path, lo, hi):
    pages.filter((_page_id(pages) >= lo) & (_page_id(pages) < hi)).coalesce(
        1
    ).write.mode("append").parquet(path)


def _url_pairs(spark, state_dir):
    d, e, _ = crawl_state(spark, state_dir)
    src = d.select(F.col("nid").alias("src"), F.col("url").alias("src_url"))
    dst = d.select(F.col("nid").alias("dst"), F.col("url").alias("dst_url"))
    return sorted(
        (r.src_url, r.dst_url)
        for r in e.join(src, "src").join(dst, "dst").collect()
    )


def test_crawl_ingest_two_batches(spark, tmp_path):
    pages = synth_pages(spark, N)
    drops = str(tmp_path / "drops")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _drop(pages, drops, 0, 30)
    run_crawl_ingest(spark, drops, state, ckpt)
    _drop(pages, drops, 30, N)
    run_crawl_ingest(spark, drops, state, ckpt)

    # url-level edge set == one-shot extraction over all pages
    expect = sorted(
        (r.src_url, r.dst_url) for r in extract_links(pages).collect()
    )
    assert _url_pairs(spark, state) == expect and len(expect) > 0

    # component structure == batch CC on the final edge table (labels may
    # differ; compare partitions as frozensets of members)
    d, e, lab = crawl_state(spark, state)
    nodes = d.select(F.col("nid").alias("id"))
    res = ConnectedComponents().run(
        e.select("src", "dst", "weight"), nodes
    )
    batch = res.get_partition()

    def parts(df):
        rows = df.collect()
        bylab = {}
        for r in rows:
            bylab.setdefault(r.label, set()).add(r.node)
        return sorted(map(frozenset, bylab.values()), key=lambda s: min(s))

    assert parts(lab) == parts(batch)


def test_crawl_ingest_replay_noop(spark, tmp_path):
    pages = synth_pages(spark, 20)
    drops = str(tmp_path / "drops")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _drop(pages, drops, 0, 20)
    run_crawl_ingest(spark, drops, state, ckpt)
    before = _url_pairs(spark, state)
    # no new files: availableNow drains nothing, state unchanged
    run_crawl_ingest(spark, drops, state, ckpt)
    assert _url_pairs(spark, state) == before
    # forced replay of the last batch id is skipped by the marker
    marker = os.path.join(state, "last_applied_batch")
    assert os.path.exists(marker)


def test_new_triangles_handcase(spark):
    from networkit_spark.operators.triangles import new_triangles

    def sym(pairs):
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(rows, ["src", "dst"])

    # old graph: path 0-1-2; new edge (0,2) closes one triangle; new edge
    # (2,3) closes none; new edges (4,5),(4,6),(5,6) form a fully-new one
    old = [(0, 1), (1, 2), (2, 3)]
    new = [(0, 2), (4, 5), (4, 6), (5, 6)]
    tri = new_triangles(sym(old + new), sym(new))
    got = sorted((r.a, r.b, r.c) for r in tri.collect())
    assert got == [(0, 1, 2), (4, 5, 6)]


def test_crawl_refresh_plp_and_triangles(spark, tmp_path):
    from networkit_spark.operators.plp import PLP
    from networkit_spark.operators.triangles import total_triangles
    from networkit_spark.streaming.crawl import (
        refresh_plp,
        refresh_triangles,
        _symmetrize,
    )

    pages = synth_pages(spark, 45)
    drops = str(tmp_path / "drops")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    pid = _page_id(pages)
    for lo, hi in [(0, 15), (15, 30), (30, 45)]:
        pages.filter((pid >= lo) & (pid < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(drops)
        run_crawl_ingest(spark, drops, state, ckpt)
        total = refresh_triangles(spark, state)
        refresh_plp(spark, state)

    d, e, _ = crawl_state(spark, state)
    assert total == total_triangles(_symmetrize(e))

    # warm PLP partition is structurally valid: covers all nodes, labels
    # drawn from node ids
    plp_labels = spark.read.parquet(str(tmp_path / "state" / "plp"))
    assert plp_labels.count() == d.count()
