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
    exists = F.when(
        F.col("last_type").isNotNull(), F.col("last_type") != EDGE_REMOVAL
    ).otherwise(F.col("e.weight").isNotNull() | F.col("inc").isNotNull())
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
    (parquet) by applying each micro-batch of events; Spark's streaming
    checkpoint makes restarts exactly-once over the file source. Returns the
    query (already awaited when ``once``)."""
    import os

    edges_path = os.path.join(state_dir, "edges")

    def process(batch_df: DataFrame, batch_id: int):
        if os.path.exists(os.path.join(edges_path, "_SUCCESS")):
            edges = spark.read.parquet(edges_path)
        else:
            edges = spark.createDataFrame([], "src long, dst long, weight double")
        updated = apply_events(edges, batch_df)
        tmp = edges_path + f".tmp{batch_id}"
        updated.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(edges_path)

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
