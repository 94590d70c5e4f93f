import json
import os

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range
from networkit_spark.operators.components import ConnectedComponents
from networkit_spark.streaming.events import (
    apply_events,
    graph_difference,
    read_event_stream,
    run_incremental_pipeline,
    update_components_additions,
    windowed_edge_event_counts,
)


def ev_df(spark, rows):
    """rows: (etype, u, v, w, ts_str)"""
    return spark.createDataFrame(
        [(e, u, v, float(w), t) for e, u, v, w, t in rows],
        "etype string, u long, v long, w double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def edges_set(df):
    return {(r["src"], r["dst"], r["weight"]) for r in df.collect()}


def test_apply_events_add_remove_update(spark):
    edges = edges_df(spark, [(0, 1, 1.0), (1, 2, 2.0)], weighted=True)
    events = ev_df(spark, [
        ("EDGE_ADDITION", 2, 3, 1.5, "2025-01-01 00:00:01"),
        ("EDGE_REMOVAL", 0, 1, 0.0, "2025-01-01 00:00:02"),
        ("EDGE_WEIGHT_UPDATE", 1, 2, 5.0, "2025-01-01 00:00:03"),
    ])
    out = edges_set(apply_events(edges, events))
    assert out == {(2, 3, 1.5), (1, 2, 5.0)}


def test_apply_events_last_writer_wins_and_increment(spark):
    edges = edges_df(spark, [], weighted=True)
    events = ev_df(spark, [
        ("EDGE_ADDITION", 0, 1, 1.0, "2025-01-01 00:00:01"),
        ("EDGE_REMOVAL", 0, 1, 0.0, "2025-01-01 00:00:02"),
        ("EDGE_ADDITION", 0, 1, 3.0, "2025-01-01 00:00:03"),
        ("EDGE_WEIGHT_INCREMENT", 0, 1, 0.5, "2025-01-01 00:00:04"),
        # increment BEFORE the last addition must not count
        ("EDGE_WEIGHT_INCREMENT", 9, 9, 100.0, "2025-01-01 00:00:00"),
    ])
    out = edges_set(apply_events(edges, events))
    assert (0, 1, 3.5) in out
    # increment with no base edge is dropped — reference parity:
    # GraphUpdater calls Graph::increaseWeight, which requires the edge
    assert not any(e[0] == 9 and e[1] == 9 for e in out)


def test_graph_difference_roundtrip(spark):
    a = edges_df(spark, [(0, 1, 1.0), (1, 2, 2.0)], weighted=True)
    b = edges_df(spark, [(1, 2, 3.0), (2, 3, 1.0)], weighted=True)
    diff = graph_difference(a, b)
    kinds = {(r["etype"], r["u"], r["v"]) for r in diff.collect()}
    assert kinds == {
        ("EDGE_ADDITION", 2, 3),
        ("EDGE_REMOVAL", 0, 1),
        ("EDGE_WEIGHT_UPDATE", 1, 2),
    }
    # applying the diff (as timestamped events) to a yields b
    events = diff.withColumn("ts", F.to_timestamp(F.lit("2025-01-01 00:00:01")))
    assert edges_set(apply_events(a, events)) == edges_set(b)


def test_incremental_components_matches_full(spark):
    base = [(0, 1), (2, 3), (4, 5)]
    e = edges_df(spark, base)
    nodes = nodes_range(spark, 6)
    labels = ConnectedComponents().run(e, nodes).get_partition()
    # add bridging edges 1-2 and 3-4 -> all one component
    new = edges_df(spark, [(1, 2), (3, 4)])
    inc = update_components_additions(labels, new)
    full = ConnectedComponents().run(
        e.union(new), nodes
    ).get_partition()
    assert {(r["node"], r["label"]) for r in inc.collect()} == {
        (r["node"], r["label"]) for r in full.collect()
    }


def test_incremental_components_no_merge_is_noop(spark):
    e = edges_df(spark, [(0, 1), (2, 3)])
    nodes = nodes_range(spark, 4)
    labels = ConnectedComponents().run(e, nodes).get_partition()
    inc = update_components_additions(labels, edges_df(spark, [(0, 1)]))
    assert {(r["node"], r["label"]) for r in inc.collect()} == {
        (r["node"], r["label"]) for r in labels.collect()
    }


@pytest.fixture()
def event_dir(tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    rows = [
        {"etype": "EDGE_ADDITION", "u": 0, "v": 1, "w": 1.0, "ts": "2025-01-01T00:00:05.000Z"},
        {"etype": "EDGE_ADDITION", "u": 1, "v": 2, "w": 1.0, "ts": "2025-01-01T00:00:30.000Z"},
        {"etype": "EDGE_REMOVAL", "u": 0, "v": 1, "w": 0.0, "ts": "2025-01-01T00:01:10.000Z"},
    ]
    with open(d / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_windowed_stream_counts(spark, event_dir, tmp_path):
    stream = read_event_stream(spark, event_dir)
    agg = windowed_edge_event_counts(stream, window="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from win_counts").collect()
    got = {(str(r["window_start"]), r["etype"]): r["n"] for r in rows}
    assert got[("2025-01-01 00:00:00", "EDGE_ADDITION")] == 2
    assert got[("2025-01-01 00:01:00", "EDGE_REMOVAL")] == 1


def test_incremental_pipeline_foreachbatch(spark, event_dir, tmp_path):
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt2")
    run_incremental_pipeline(spark, event_dir, state, ckpt, once=True)
    edges = spark.read.parquet(os.path.join(state, "edges"))
    out = edges_set(edges)
    assert out == {(1, 2, 1.0)}  # 0-1 added then removed; 1-2 survives
    # restart with no new files -> state unchanged (checkpoint resume)
    run_incremental_pipeline(spark, event_dir, state, ckpt, once=True)
    assert edges_set(spark.read.parquet(os.path.join(state, "edges"))) == out


def test_incremental_components_removal_split(spark):
    """EDGE_REMOVAL path: removing a bridge splits the component; labels of
    untouched components stay identical (DynConnectedComponents removal)."""
    from networkit_spark.operators.components import ConnectedComponents
    from networkit_spark.streaming.events import update_components_removals

    # two components: path 0-1-2-3 (bridge 1-2) and pair 10-11
    before = edges_df(spark, [(0, 1), (1, 2), (2, 3), (10, 11)])
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 10, 11)], "id long")
    labels = ConnectedComponents().run(before, nodes).labels_df
    after = edges_df(spark, [(0, 1), (2, 3), (10, 11)])
    removed = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["label"] for r in
           update_components_removals(labels, after, removed).collect()}
    full = {r["node"]: r["label"] for r in
            ConnectedComponents().run(after, nodes).labels_df.collect()}
    assert got == full
    assert got[0] == got[1] != got[2] == got[3]
    assert got[10] == got[11]


def test_incremental_components_mixed_batch(spark):
    """ADD + REMOVE in one batch matches a full recompute."""
    from networkit_spark.operators.components import ConnectedComponents
    from networkit_spark.streaming.events import apply_events, update_components

    before = edges_df(spark, [(0, 1), (2, 3)])
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    labels = ConnectedComponents().run(before, nodes).labels_df
    events = ev_df(spark, [
        ("EDGE_ADDITION", 1, 2, 1.0, "2025-01-01 00:00:01"),   # merge 01+23
        ("EDGE_ADDITION", 3, 4, 1.0, "2025-01-01 00:00:02"),   # attach 4
        ("EDGE_REMOVAL", 0, 1, 0.0, "2025-01-01 00:00:03"),    # split off 0
    ])
    after = apply_events(before, events)
    got = {r["node"]: r["label"] for r in
           update_components(labels, after, events).collect()}
    full = {r["node"]: r["label"] for r in
            ConnectedComponents().run(after, nodes).labels_df.collect()}
    assert got == full
