"""gephi event-stream export/import roundtrip (networkit/gephi.py format)."""

import json

from pyspark.sql import functions as F

from networkit_spark.sources.gephi import read_gephi_events, write_gephi_events

EDGES = [(0, 1), (1, 2), (0, 2), (2, 3)]


def _und(spark):
    return spark.createDataFrame(
        EDGES + [(b, a) for a, b in EDGES], "src bigint, dst bigint"
    )


def test_export_events_wellformed(spark, tmp_path):
    path = str(tmp_path / "gephi_events")
    write_gephi_events(_und(spark), path)
    lines = [r["value"] for r in spark.read.text(path).collect()]
    events = [json.loads(line) for line in lines]
    an = [e for e in events if "an" in e]
    ae = [e for e in events if "ae" in e]
    assert len(an) == 4 and len(ae) == 4
    # edge ids follow the reference's "src_dst" scheme, src < dst
    ids = sorted(k for e in ae for k in e["ae"])
    assert ids == ["0_1", "0_2", "1_2", "2_3"]
    body = next(iter(ae[0]["ae"].values()))
    assert set(body) == {"source", "target", "directed"}


def test_roundtrip_with_node_values(spark, tmp_path):
    path = str(tmp_path / "gephi_events_vals")
    und = _und(spark)
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("double").alias("degree")
    )
    write_gephi_events(und, path, node_values=deg, value_col="degree")
    ev = read_gephi_events(spark, path)
    kinds = {r["kind"]: r["cnt"] for r in ev.groupBy("kind").agg(F.count("*").alias("cnt")).collect()}
    assert kinds == {"an": 4, "ae": 4, "cn": 4}
    back = {
        (r["source"], r["target"])
        for r in ev.filter("kind = 'ae'").collect()
    }
    assert back == {(0, 1), (0, 2), (1, 2), (2, 3)}
    vals = {int(r["id"]): r["value"] for r in ev.filter("kind = 'cn'").collect()}
    assert vals == {0: 2.0, 1: 2.0, 2: 3.0, 3: 1.0}
