"""DGS (Dynamic Graph Stream, DGS004) reader / writer.

Reference: ``cpp/dynamics/DGSStreamParser.cpp`` (tags ``st an ae ce ie de dn
rn``; ``mapped`` mode assigns consecutive 0-based ids in first-appearance
order, direct mode subtracts ``baseIndex``) and ``DGSWriter.cpp`` (inverse).
Events come back in the repo's ``EVENT_SCHEMA`` (etype, u, v, w) plus a
``seq`` column preserving stream order — the reference returns a
``vector<GraphEvent>`` whose index is exactly ``seq``.

Spark plan: lines parse in parallel (one ``split`` + ``CASE`` over tags —
no Python in the row path); stream order is the text line number
(``zipWithIndex`` on the ordered text RDD). Mapped-mode id assignment is
first-appearance rank, computed distributed as ``min(seq, slot)`` per key →
``plans/ids``-style dense rank — identical to the reference's sequential
``nextNode++`` walk without serializing the file through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    EDGE_REMOVAL,
    EDGE_WEIGHT_INCREMENT,
    EDGE_WEIGHT_UPDATE,
    NODE_ADDITION,
    NODE_REMOVAL,
    TIME_STEP,
)

NODE_RESTORATION = "NODE_RESTORATION"

_TAG2TYPE = {
    "st": TIME_STEP,
    "an": NODE_ADDITION,
    "ae": EDGE_ADDITION,
    "ce": EDGE_WEIGHT_UPDATE,
    "ie": EDGE_WEIGHT_INCREMENT,
    "de": EDGE_REMOVAL,
    "dn": NODE_REMOVAL,
    "rn": NODE_RESTORATION,
}
_TYPE2TAG = {v: k for k, v in _TAG2TYPE.items()}


def _parsed_lines(spark: SparkSession, path: str) -> DataFrame:
    """(seq, toks) for every event line, seq = 0-based stream position."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(rdd, "line string, lineno long")
    first = df.orderBy("lineno").limit(1).first()
    if first is None or not first["line"].startswith("DGS004"):
        raise ValueError("expected DGS004 cookie in first line")
    body = df.filter((F.col("lineno") >= 2) & (F.trim("line") != ""))
    return body.select(
        (F.col("lineno") - 2).alias("seq"),
        F.filter(F.split(F.trim("line"), r"\s+"), lambda t: t != "").alias("toks"),
    )


def read_dgs(
    spark: SparkSession,
    path: str,
    mapped: bool = False,
    base_index: int = 0,
) -> DataFrame:
    """-> events (seq long, etype string, u long, v long, w double)."""
    p = _parsed_lines(spark, path)
    tag = F.col("toks")[0]
    wof = lambda c: F.split(c, "=")[1].cast("double")  # noqa: E731  weight=<w>
    uv = F.split(F.col("toks")[1], "-")
    raw = p.select(
        "seq",
        tag.alias("tag"),
        # string keys for u/v per tag (direct mode parses them as numbers)
        F.when(tag == "ae", F.col("toks")[2])
        .when(tag.isin("ce", "ie", "de"), uv[0])
        .when(tag.isin("an", "dn", "rn"), F.col("toks")[1])
        .alias("ku"),
        F.when(tag == "ae", F.col("toks")[3])
        .when(tag.isin("ce", "ie", "de"), uv[1])
        .alias("kv"),
        F.when(tag == "ae", F.when(F.size("toks") >= 5, wof(F.col("toks")[4])).otherwise(F.lit(1.0)))
        .when(tag.isin("ce", "ie"), wof(F.col("toks")[2]))
        .alias("w"),
    )
    bad = raw.filter(~F.col("tag").isin(*_TAG2TYPE)).limit(1).collect()
    if bad:
        raise ValueError(f"malformed DGS line: unknown tag {bad[0]['tag']!r}")
    if mapped:
        # first-appearance order: u-slot of a line precedes its v-slot
        appearances = raw.select(
            F.col("ku").alias("key"), (F.col("seq") * 2).alias("slot")
        ).union(
            raw.select(F.col("kv"), F.col("seq") * 2 + 1)
        ).filter(F.col("key").isNotNull())
        firsts = appearances.groupBy("key").agg(F.min("slot").alias("slot"))
        from networkit_spark.plans.ids import dense_ids

        ranked = dense_ids(
            firsts.select(F.struct("slot", "key").alias("_k")), "_k", id_col="nid",
            distinct=False,
        ).select(F.col("_k.key").alias("key"), "nid")
        raw = (
            raw.join(ranked.withColumnRenamed("key", "ku").withColumnRenamed("nid", "u"), "ku", "left")
            .join(ranked.withColumnRenamed("key", "kv").withColumnRenamed("nid", "v"), "kv", "left")
        )
    else:
        raw = raw.withColumn("u", F.col("ku").cast("long") - base_index).withColumn(
            "v", F.col("kv").cast("long") - base_index
        )
    type_expr = F.col("tag")
    for t, name in _TAG2TYPE.items():
        type_expr = F.when(F.col("tag") == t, name).otherwise(type_expr)
    return raw.select(
        "seq", type_expr.alias("etype"), "u", "v", F.col("w").cast("double").alias("w")
    )


def write_dgs(events: DataFrame, path: str, description: str = "dgs-stream 0 0") -> None:
    """Inverse of :func:`read_dgs` (DGSWriter.cpp): events ordered by ``seq``
    (or input order when absent). DGS is a sequential text stream, so the
    final file assembles on the driver via a streaming iterator — the line
    *rendering* happens in Spark."""
    cols = events.columns
    ordered = events.orderBy("seq") if "seq" in cols else events
    tag = F.lit(None).cast("string")
    for name, t in _TYPE2TAG.items():
        tag = F.when(F.col("etype") == name, t).otherwise(tag)
    uv = F.concat(F.col("u"), F.lit("-"), F.col("v"))
    wkv = F.concat(F.lit("weight="), F.col("w").cast("string"))
    line = (
        F.when(F.col("etype") == TIME_STEP, F.lit("st"))
        .when(F.col("etype").isin(NODE_ADDITION, NODE_REMOVAL, NODE_RESTORATION),
              F.concat_ws(" ", tag, F.col("u")))
        .when(F.col("etype") == EDGE_ADDITION,
              F.concat_ws(" ", tag, uv, F.col("u"), F.col("v"), wkv))
        .when(F.col("etype").isin(EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT),
              F.concat_ws(" ", tag, uv, wkv))
        .when(F.col("etype") == EDGE_REMOVAL, F.concat_ws(" ", tag, uv))
    )
    with open(path, "w") as f:
        f.write("DGS004\n")
        f.write(description + "\n")
        for row in ordered.select(line.alias("line")).toLocalIterator():
            f.write(row["line"] + "\n")
