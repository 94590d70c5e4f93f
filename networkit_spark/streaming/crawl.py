"""Streaming crawl ingest: a Structured Streaming pipeline that keeps the
link-graph state (url dictionary, edge table, component labels) current as
new crawl batches of pages arrive.

This is the streaming twin of the batch ingest (``sources/pages.py``): the
reference has no streaming surface (its Dyn* algorithms consume in-memory
``GraphEvent`` batches, ``networkit/cpp/dynamics/GraphEvent.hpp``); the
Spark-first shape is a file-source stream of pages micro-batches +
``foreachBatch`` state maintenance, so a continuously-arriving crawl keeps
the host/graph analytics warm without recomputing from scratch.

Per micro-batch (all DataFrame ops, links extracted JVM-side):
1. href extraction on the new pages only;
2. url dictionary append: unseen urls get dense ids continuing past the
   current max, ordered lexicographically WITHIN the batch (append-order
   semantics, the streaming analog of ``EdgeListReader.cpp:65-83``'s
   insertion-order map — ids are stable once assigned, never re-sorted);
3. new-edge append (dedup against state);
4. incremental connected components via
   ``streaming.events.update_components_additions`` (hash-min only over the
   batch-touched frontier, not the whole graph).

Idempotence: same ``last_applied_batch`` marker protocol as
``run_incremental_pipeline`` — foreachBatch is at-least-once, batch ids are
stable across restarts, so replays are detected exactly and skipped.

Scale notes: the dictionary join broadcasts while the dict fits (AQE
decides); the per-batch CC update touches O(batch frontier) rows. State
tables are plain parquet here (Iceberg via ``sources/catalog.py`` when a
runtime is attached); the overwrite-then-commit order matches the batch
marker so a crash replays into identical state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.plans.ids import dense_ids
from networkit_spark.sources.pages import extract_links
from networkit_spark.streaming.events import update_components_additions

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of pages micro-batches (parquet drops)."""
    return spark.readStream.schema(PAGES_DDL).parquet(path)


def _load(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    return spark.createDataFrame([], ddl)


def _store(spark: SparkSession, df: DataFrame, path: str, batch_id: int) -> None:
    tmp = path + f".tmp{batch_id}"
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    shutil.rmtree(tmp, ignore_errors=True)


def apply_pages_batch(
    spark: SparkSession, pages_batch: DataFrame, state_dir: str, batch_id: int
) -> None:
    """One micro-batch of the crawl-ingest state update (pure function of
    (state, batch) — shared by the stream and by tests/replays)."""
    dict_path = os.path.join(state_dir, "url_dict")
    edges_path = os.path.join(state_dir, "edges")
    labels_path = os.path.join(state_dir, "labels")

    url_dict = _load(spark, dict_path, "url string, nid long")
    edges = _load(spark, edges_path, "src long, dst long, weight double")
    labels = _load(spark, labels_path, "node long, label long")

    links = extract_links(pages_batch)
    batch_urls = (
        links.select(F.col("src_url").alias("url"))
        .union(links.select(F.col("dst_url").alias("url")))
        .union(pages_batch.select("url"))
        .distinct()
    )
    new_urls = batch_urls.join(url_dict.select("url"), "url", "left_anti")
    # explicit None check: `or -1` would treat a valid max nid of 0 as
    # falsy and restart ids at 0, colliding with the existing entry
    mx = url_dict.agg(F.max("nid")).collect()[0][0]
    base = (mx if mx is not None else -1) + 1
    # distributed dense-id assignment (plans/ids.dense_ids: range shuffle +
    # per-partition offsets) instead of a batch-local Window.orderBy —
    # same ascending-url semantics, but a huge backfill "batch" of new
    # urls no longer funnels through a single-partition sort
    appended = dense_ids(new_urls, "url", id_col="nid").select(
        "url", (F.col("nid") + F.lit(base)).cast("long").alias("nid")
    )
    url_dict2 = url_dict.union(appended).localCheckpoint(eager=True)

    enc = links.join(
        url_dict2.select(F.col("url").alias("src_url"), F.col("nid").alias("src")),
        "src_url",
    ).join(
        url_dict2.select(F.col("url").alias("dst_url"), F.col("nid").alias("dst")),
        "dst_url",
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    new_edges = enc.join(
        edges.select("src", "dst"), ["src", "dst"], "left_anti"
    ).localCheckpoint(eager=True)  # materialize BEFORE the state overwrite
    # below breaks this lineage's source files
    edges2 = edges.union(new_edges).localCheckpoint(eager=True)

    new_nodes = appended.select(
        F.col("nid").alias("node"), F.col("nid").alias("label")
    )
    labels2 = update_components_additions(
        labels.union(new_nodes), new_edges.select("src", "dst")
    ).localCheckpoint(eager=True)

    _store(spark, url_dict2, dict_path, batch_id)
    _store(spark, edges2, edges_path, batch_id)
    _store(spark, labels2, labels_path, batch_id)
    # the batch's delta edge set, for incremental kernel refreshes
    # (new_triangles, warm sweeps). Keyed by batch id so one availableNow
    # drain applying SEVERAL micro-batches accumulates every delta —
    # refresh_triangles consumes-and-clears the whole pending set. A
    # replay of an already-applied batch overwrites only its own subdir
    # (idempotent), never another batch's delta.
    _store(
        spark, new_edges,
        os.path.join(state_dir, "pending_new_edges", f"batch={batch_id}"),
        batch_id,
    )


def run_crawl_ingest(
    spark: SparkSession,
    pages_path: str,
    state_dir: str,
    checkpoint_dir: str,
    once: bool = True,
):
    """Start the streaming crawl ingest (availableNow drains all pending
    micro-batches when ``once``)."""
    applied_path = os.path.join(state_dir, "last_applied_batch")
    os.makedirs(state_dir, exist_ok=True)

    def process(batch_df: DataFrame, batch_id: int):
        if os.path.exists(applied_path):
            with open(applied_path) as f:
                if int(f.read().strip() or -1) >= batch_id:
                    return  # replayed batch — already applied
        apply_pages_batch(spark, batch_df, state_dir, batch_id)
        with open(applied_path, "w") as f:
            f.write(str(batch_id))

    stream = read_pages_stream(spark, pages_path)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def refresh_pagerank(
    spark: SparkSession,
    state_dir: str,
    tol: float = 1e-8,
    damp: float = 0.85,
):
    """Warm PageRank refresh over the current crawl state: seeds the power
    iteration with the previous batch's converged scores (new urls start at
    1/n, vector renormalized), so each refresh pays only the iterations the
    BATCH perturbed, not a cold start. Persists scores back into the state
    dir and returns the PageRankResult."""
    from networkit_spark.operators.pagerank import PageRank

    scores_path = os.path.join(state_dir, "pagerank")
    d, e, _ = crawl_state(spark, state_dir)
    prev = _load(spark, scores_path, "node long, score double")
    init = prev if not prev.isEmpty() else None
    res = PageRank(damp=damp, tol=tol).run(
        e, nodes=d.select(F.col("nid").alias("id")), init_scores=init
    )
    out = res.scores().select(
        F.col("node").cast("long").alias("node"), "score"
    ).localCheckpoint(eager=True)
    _store(spark, out, scores_path, -1)
    return res


def _symmetrize(e: DataFrame) -> DataFrame:
    return (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def refresh_plp(spark: SparkSession, state_dir: str, max_iterations: int = 100):
    """Warm PLP refresh: previous communities seed the sweep (new urls start
    as singletons — the reference's baseClustering semantics, PLP.cpp:30-34),
    so a small batch converges in the few sweeps its frontier needs."""
    from networkit_spark.operators.plp import PLP

    plp_path = os.path.join(state_dir, "plp")
    d, e, _ = crawl_state(spark, state_dir)
    und = _symmetrize(e)
    nodes = d.select(F.col("nid").alias("id"))
    prev = _load(spark, plp_path, "node long, label long")
    base = None
    if not prev.isEmpty():
        base = nodes.select(F.col("id").alias("node")).join(
            prev, "node", "left"
        ).select("node", F.coalesce("label", F.col("node")).alias("label"))
    res = PLP(max_iterations=max_iterations).run(und, nodes, base_clustering=base)
    out = res.get_partition().localCheckpoint(eager=True)
    _store(spark, out, plp_path, -1)
    return res


def refresh_triangles(spark: SparkSession, state_dir: str) -> int:
    """Incremental triangle total: count only the triangles the pending
    ingest batches created (``operators.triangles.new_triangles`` —
    O(batch x degree), not a recount) and fold them into the stored running
    total. Returns it.

    Deltas are consumed-and-cleared: ``pending_new_edges/batch=<id>``
    accumulates one subdir per applied micro-batch, so a drain that applied
    SEVERAL micro-batches folds every delta exactly once (a triangle absent
    before the drain must contain >= 1 pending edge, and the sorted-triple
    dedup in ``new_triangles`` never double-counts triangles spanning two
    pending batches). Re-seed by deleting the ``triangle_total`` state
    table, which forces one full recount."""
    import glob as _glob

    from networkit_spark.operators.triangles import new_triangles, total_triangles

    tri_path = os.path.join(state_dir, "triangle_total")
    pend_dir = os.path.join(state_dir, "pending_new_edges")
    d, e, _ = crawl_state(spark, state_dir)
    und = _symmetrize(e)
    prev = _load(spark, tri_path, "total long")
    batch_dirs = sorted(_glob.glob(os.path.join(pend_dir, "batch=*")))
    if prev.isEmpty():
        # first refresh: one full count seeds the running total (pending
        # deltas are already inside the edge state, so just clear them)
        total = total_triangles(und)
    else:
        ready = [p for p in batch_dirs if os.path.exists(os.path.join(p, "_SUCCESS"))]
        if ready:
            new_e = spark.read.schema(
                "src long, dst long, weight double"
            ).parquet(*ready)
            delta = new_triangles(und, _symmetrize(new_e)).count()
        else:
            delta = 0
        total = int(prev.first()["total"]) + int(delta)
    _store(
        spark,
        spark.createDataFrame([(int(total),)], "total long"),
        tri_path,
        -1,
    )
    for p in batch_dirs:  # consume-and-clear
        shutil.rmtree(p, ignore_errors=True)
    return int(total)


def crawl_state(spark: SparkSession, state_dir: str):
    """(url_dict, edges, labels) current state tables."""
    return (
        _load(spark, os.path.join(state_dir, "url_dict"), "url string, nid long"),
        _load(spark, os.path.join(state_dir, "edges"), "src long, dst long, weight double"),
        _load(spark, os.path.join(state_dir, "labels"), "node long, label long"),
    )
