"""Custom stateful streaming operator: per-node running degree over the
edge-event stream, via ``applyInPandasWithState``.

Reference semantics: the reference's dynamic graph keeps per-node degrees
current as GraphEvents arrive (``GraphUpdater.cpp`` applies
EDGE_ADDITION / EDGE_REMOVAL one by one to the in-memory Graph). The
streaming-native equivalent is a keyed state store: group the event stream
by node, fold each micro-batch's Arrow batches into the node's persisted
``(degree, events_seen)`` state, and emit the updated row — Spark manages
state persistence/recovery through the checkpoint, so the operator resumes
exactly where it stopped (same contract as the reference's incremental
updater, minus the single-process mutation).

This is the ``applyInPandasWithState`` pattern from the public PySpark
Structured Streaming API: state is per-key (per node), batches arrive as
pandas DataFrames (Arrow transfer), and the update function is a pure fold
— no driver-side loops, state sharded across executors by the group key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from .events import EDGE_ADDITION, EDGE_REMOVAL

OUTPUT_SCHEMA = StructType(
    [
        StructField("node", LongType()),
        StructField("degree", LongType()),
        StructField("events_seen", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("degree", LongType()),
        StructField("events_seen", LongType()),
    ]
)


def _update_degree(key, pdf_iter, state: GroupState):
    """Fold one micro-batch of a node's events into its persisted state."""
    (node,) = key
    if state.exists:
        degree, seen = state.get
    else:
        degree, seen = 0, 0
    for pdf in pdf_iter:
        for etype in pdf["etype"]:
            if etype == EDGE_ADDITION:
                degree += 1
            elif etype == EDGE_REMOVAL:
                degree = max(0, degree - 1)
            seen += 1
    state.update((degree, seen))
    yield pd.DataFrame(
        {"node": [node], "degree": [degree], "events_seen": [seen]}
    )


def stateful_node_degree(events: DataFrame) -> DataFrame:
    """Streaming (or batch) events -> per-node running degree.

    ``events``: (ts, etype, u, v, w) as in ``events.py``; every event
    touches both endpoints, so the stream is exploded to one row per
    (node, etype) before the keyed fold. Works on a streaming DataFrame
    (state persists across micro-batches via the checkpoint) and on a
    batch DataFrame (single fold) identically.
    """
    from pyspark.sql import functions as F

    per_node = events.select(
        F.explode(F.array(F.col("u"), F.col("v"))).alias("node"), "etype"
    )
    return per_node.groupBy("node").applyInPandasWithState(
        _update_degree,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
