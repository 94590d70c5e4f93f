"""GraphEvent streams: schema, windowed aggregation, incremental maintenance.

Reference mapping:

- ``GraphEvent`` (``dynamics/GraphEvent.hpp:18-52``): ``{Type, u, v, w}``
  with types NODE_ADDITION/REMOVAL/RESTORATION, EDGE_ADDITION/REMOVAL/
  WEIGHT_UPDATE/WEIGHT_INCREMENT, TIME_STEP. Our stream schema adds event
  time: ``(etype string, u long, v long, w double, ts timestamp)``;
  ``TIME_STEP`` maps to the watermark/trigger boundary.
- ``GraphUpdater::update(events)`` -> :func:`apply_events` — batch-apply an
  event table to an edge table (pure joins, last-writer-wins by ``ts``).
- ``GraphDifference`` -> :func:`graph_difference`.
- ``DynConnectedComponents::update`` -> :func:`update_components_additions` —
  incremental label maintenance for edge additions (merge components by
  hash-min over the label-merge graph) without recomputing from scratch.
- Structured Streaming: :func:`read_event_stream` (file source) ->
  :func:`windowed_edge_event_counts` (watermark + tumbling window) ->
  :func:`run_incremental_pipeline` (``foreachBatch`` maintaining the edge
  table + metrics under a checkpoint dir — restart-resumable via Spark's
  streaming checkpoint, the streaming twin of SuperstepRunner's resume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "etype string, u long, v long, w double, ts timestamp"

EDGE_ADDITION = "EDGE_ADDITION"
EDGE_REMOVAL = "EDGE_REMOVAL"
EDGE_WEIGHT_UPDATE = "EDGE_WEIGHT_UPDATE"
EDGE_WEIGHT_INCREMENT = "EDGE_WEIGHT_INCREMENT"
NODE_ADDITION = "NODE_ADDITION"
NODE_REMOVAL = "NODE_REMOVAL"
TIME_STEP = "TIME_STEP"


# ---------------------------------------------------------------------------
# batch event application (GraphUpdater parity)
# ---------------------------------------------------------------------------

def apply_events(edges: DataFrame, events: DataFrame) -> DataFrame:
    """Apply an event batch to ``edges(src, dst, weight)``.

    Semantics (GraphUpdater.cpp switch): events are applied in ``ts`` order;
    per (u, v) key the *last* addition/removal/update wins for existence,
    increments accumulate on the surviving weight. Distributed form: window
    by key instead of replaying sequentially.
    """
    ev = events.filter(
        F.col("etype").isin(
            EDGE_ADDITION, EDGE_REMOVAL, EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT
        )
    ).select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "etype", "w", "ts"
    )
    # last non-increment event decides existence + base weight
    from pyspark.sql import Window

    key = Window.partitionBy("src", "dst")
    base_w = key.orderBy(F.desc("ts"))
    non_inc = ev.filter(F.col("etype") != EDGE_WEIGHT_INCREMENT)
    last = (
        non_inc.withColumn("rn", F.row_number().over(base_w))
        .filter(F.col("rn") == 1)
        .select("src", "dst", F.col("etype").alias("last_type"),
                F.col("w").alias("last_w"), F.col("ts").alias("last_ts"))
    )
    # increments after the last base event accumulate
    incs = (
        ev.filter(F.col("etype") == EDGE_WEIGHT_INCREMENT)
        .join(last, ["src", "dst"], "left")
        .filter(F.col("last_ts").isNull() | (F.col("ts") > F.col("last_ts")))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("inc"))
    )
    changed = last.join(incs, ["src", "dst"], "full")
    # merge with the existing table
    merged = edges.alias("e").join(changed.alias("c"), ["src", "dst"], "full")
    # an edge exists iff the last non-increment event was not a removal, or
    # (no such event) it already existed. A pure increment on a NONEXISTENT
    # edge does NOT materialize one — the reference's GraphUpdater calls
    # Graph::increaseWeight, which requires the edge to exist (the event is
    # dropped here where the reference would throw; distributed jobs can't
    # abort per-row).
    exists = F.when(
        F.col("last_type").isNotNull(), F.col("last_type") != EDGE_REMOVAL
    ).otherwise(F.col("e.weight").isNotNull())
    new_w = (
        F.coalesce(
            F.when(F.col("last_type") == EDGE_ADDITION, F.col("last_w"))
            .when(F.col("last_type") == EDGE_WEIGHT_UPDATE, F.col("last_w")),
            F.col("e.weight"),
            F.lit(0.0),
        )
        + F.coalesce(F.col("inc"), F.lit(0.0))
    )
    return (
        merged.filter(exists)
        .select("src", "dst", new_w.alias("weight"))
    )


def graph_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Events transforming ``a`` into ``b`` (GraphDifference analog):
    (etype, u, v, w) rows — additions, removals, weight updates."""
    j = a.alias("a").join(b.alias("b"), ["src", "dst"], "full")
    added = j.filter(F.col("a.weight").isNull()).select(
        F.lit(EDGE_ADDITION).alias("etype"), F.col("src").alias("u"),
        F.col("dst").alias("v"), F.col("b.weight").alias("w"),
    )
    removed = j.filter(F.col("b.weight").isNull()).select(
        F.lit(EDGE_REMOVAL).alias("etype"), F.col("src").alias("u"),
        F.col("dst").alias("v"), F.col("a.weight").alias("w"),
    )
    updated = j.filter(
        F.col("a.weight").isNotNull()
        & F.col("b.weight").isNotNull()
        & (F.col("a.weight") != F.col("b.weight"))
    ).select(
        F.lit(EDGE_WEIGHT_UPDATE).alias("etype"), F.col("src").alias("u"),
        F.col("dst").alias("v"), F.col("b.weight").alias("w"),
    )
    return added.union(removed).union(updated)


def update_components_additions(labels: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Incremental CC for edge ADDITIONS (DynConnectedComponents analog):
    only merges can happen. Build the label-merge graph (old label pairs
    joined by new edges), hash-min it to a root per label, apply the mapping
    — touches label rows only, never re-runs CC on the full edge table."""
    lu = labels.select(F.col("node").alias("src"), F.col("label").alias("la"))
    lv = labels.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    merges = (
        new_edges.join(lu, "src").join(lv, "dst")
        .filter(F.col("la") != F.col("lb"))
        .select("la", "lb")
        .distinct()
    )
    if merges.isEmpty():
        return labels
    # tiny label-merge graph -> hash-min to fixpoint
    sym = merges.union(merges.select(F.col("lb").alias("la"), F.col("la").alias("lb")))
    mapping = (
        sym.select(F.col("la").alias("node")).distinct()
        .select("node", F.col("node").alias("root"))
    )
    changed = 1
    while changed > 0:
        cand = (
            sym.join(mapping.select(F.col("node").alias("la"), "root"), "la")
            .groupBy(F.col("lb").alias("node"))
            .agg(F.min("root").alias("nroot"))
        )
        new_map = (
            mapping.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("root"), F.coalesce(F.col("nroot"), F.col("root"))).alias("root"),
                F.col("root").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_map.filter(F.col("root") != F.col("prev")).count()
        mapping = new_map.select("node", "root")
    return (
        labels.join(mapping.withColumnRenamed("node", "label"), "label", "left")
        .select("node", F.coalesce(F.col("root"), F.col("label")).alias("label"))
    )


def update_components_removals(
    labels: DataFrame, remaining_edges: DataFrame, removed_edges: DataFrame
) -> DataFrame:
    """Incremental CC for edge REMOVALS (``DynConnectedComponents.cpp``
    removal path): a removal can only SPLIT the component it lived in, so
    re-run hash-min CC on the affected components' subgraphs only — every
    other component's labels are untouched. All affected components
    recompute in ONE batched CC job.

    ``remaining_edges`` = the edge table AFTER the removals (directed rows
    ok — CC symmetrizes); ``removed_edges(src, dst)`` = the removed pairs.
    """
    aff = (
        removed_edges.select("src")
        .union(removed_edges.select(F.col("dst").alias("src")))
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select("label")
        .distinct()
    )
    if aff.isEmpty():
        return labels
    aff_nodes = labels.join(aff, "label", "left_semi").select(F.col("node").alias("id"))
    sub = (
        remaining_edges.join(aff_nodes.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(aff_nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
        .withColumn("weight", F.lit(1.0))
    )
    from networkit_spark.operators.components import ConnectedComponents

    new = ConnectedComponents().run(sub, aff_nodes).labels_df
    unchanged = labels.join(aff, "label", "left_anti")
    return unchanged.unionByName(new)


def update_components(
    labels: DataFrame, edges_after: DataFrame, events: DataFrame
) -> DataFrame:
    """Incremental CC over a mixed event batch: apply ADDITION merges
    (cheap label-merge graph), then REMOVAL splits (affected-component
    recompute). ``edges_after`` = the edge table after ``apply_events``."""
    adds = events.filter(F.col("etype") == EDGE_ADDITION).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    rems = events.filter(F.col("etype") == EDGE_REMOVAL).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    out = labels
    if not adds.isEmpty():
        out = update_components_additions(out, adds)
    if not rems.isEmpty():
        out = update_components_removals(out, edges_after, rems)
    return out


# ---------------------------------------------------------------------------
# Structured Streaming
# ---------------------------------------------------------------------------

def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (json lines with EVENT_SCHEMA)."""
    return spark.readStream.schema(EVENT_SCHEMA).json(path)


def windowed_edge_event_counts(
    stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Tumbling-window event counts with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "etype")
        .agg(F.count("*").alias("n"), F.sum("w").alias("sum_w"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "etype", "n", "sum_w",
        )
    )


def run_incremental_pipeline(
    spark: SparkSession,
    event_path: str,
    state_dir: str,
    checkpoint_dir: str,
    once: bool = True,
):
    """foreachBatch pipeline: maintain the edge table under ``state_dir``
    (parquet) by applying each micro-batch of events.

    ``foreachBatch`` is at-least-once: a crash between the table overwrite
    and the streaming-checkpoint commit replays the batch on restart, which
    would double-apply EDGE_WEIGHT_INCREMENT events. The batch apply is made
    idempotent by recording the last applied ``batch_id`` in the state dir
    and skipping replays of it (the streaming checkpoint guarantees batch
    ids are stable across restarts, so replay detection is exact). The
    ``.tmp`` staging dir is removed after the final write."""
    import os
    import shutil

    edges_path = os.path.join(state_dir, "edges")
    applied_path = os.path.join(state_dir, "last_applied_batch")

    def process(batch_df: DataFrame, batch_id: int):
        if os.path.exists(applied_path):
            with open(applied_path) as f:
                if int(f.read().strip() or -1) >= batch_id:
                    return  # replayed batch — already applied
        if os.path.exists(os.path.join(edges_path, "_SUCCESS")):
            edges = spark.read.parquet(edges_path)
        else:
            edges = spark.createDataFrame([], "src long, dst long, weight double")
        updated = apply_events(edges, batch_df)
        tmp = edges_path + f".tmp{batch_id}"
        updated.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(edges_path)
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(state_dir, exist_ok=True)
        with open(applied_path, "w") as f:
            f.write(str(batch_id))

    stream = read_event_stream(spark, event_path)
    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def update_weakly_components(
    labels: DataFrame, edges_after: DataFrame, events: DataFrame
) -> DataFrame:
    """DynWeaklyConnectedComponents (``DynWeaklyConnectedComponents.cpp``):
    weakly-connected components of a DIRECTED graph under an event batch.
    Weak connectivity ignores direction, and both the addition merge path
    and the removal recompute path here already symmetrize internally, so
    the directed edge table feeds :func:`update_components` unchanged —
    one front door, same incremental cost profile as the undirected twin."""
    return update_components(labels, edges_after, events)
