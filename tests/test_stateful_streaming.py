"""applyInPandasWithState keyed degree fold: state must persist across
micro-batches through the checkpoint."""

import json

from networkit_spark.streaming.events import EVENT_SCHEMA
from networkit_spark.streaming.stateful import stateful_node_degree


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stateful_degree_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_batch(src, "b1.json", [
        {"etype": "EDGE_ADDITION", "u": 0, "v": 1, "w": 1.0, "ts": "2024-01-01T00:00:00"},
        {"etype": "EDGE_ADDITION", "u": 0, "v": 2, "w": 1.0, "ts": "2024-01-01T00:00:01"},
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    out = stateful_node_degree(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("deg_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["node"]: (r["degree"], r["events_seen"])
            for r in spark.sql("select * from deg_state").collect()
        }
        assert first[0] == (2, 2)
        assert first[1] == (1, 1)
        # second micro-batch: one more edge at node 0, one removal at node 1
        _write_batch(src, "b2.json", [
            {"etype": "EDGE_ADDITION", "u": 0, "v": 3, "w": 1.0, "ts": "2024-01-01T00:01:00"},
            {"etype": "EDGE_REMOVAL", "u": 1, "v": 0, "w": 1.0, "ts": "2024-01-01T00:01:01"},
        ])
        q.processAllAvailable()
        rows = spark.sql("select * from deg_state").collect()
        # memory sink in update mode appends updated rows; take the LAST
        # emission per node (cumulative state)
        last = {}
        for r in rows:
            cur = last.get(r["node"])
            if cur is None or r["events_seen"] > cur[1]:
                last[r["node"]] = (r["degree"], r["events_seen"])
        # node 0: +1 add then -1 removal (it is also endpoint of (1,0)) -> 2+1-1=2? no:
        # batch2 rows touching 0: addition (0,3) and removal (1,0) -> degree 2+1-1=2
        assert last[0] == (2, 4)
        assert last[1] == (0, 2)
        assert last[3] == (1, 1)
    finally:
        q.stop()
