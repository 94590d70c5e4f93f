"""Edge-list / METIS / SNAP / KONECT readers + writers.

Reference: ``networkit/graphio.pyx`` dispatcher (``Format`` enum :1043-1065,
``getReader`` :1092-1130, ``guessFileFormat`` :1142-1302, ``readGraph``
:1308, ``writeGraph`` :1546); C++ ``cpp/io/EdgeListReader.cpp:19-168``
(configurable separator / firstNode / comment prefix; ``continuous=false``
builds a string->id dictionary :65-83), ``METISGraphReader.cpp`` (adjacency-
per-line), ``SNAPGraphReader.cpp`` (tab-separated, ``#`` comments),
``KONECTGraphReader.cpp`` (``%`` headers).

Spark mapping: ``spark.read.csv`` with separator/comment options — the scan
parallelizes and predicate-pushes for free; non-continuous ids dictionary-
encode exactly like the pages ingest (lexicographic dense rank — reproducible
under any parallelism, unlike the reference's insertion-order map).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Format presets mirroring graphio.pyx Format enum dialects
FORMATS = {
    "edgelist-tab-zero": {"sep": "\t", "first_node": 0, "comment": "#"},
    "edgelist-tab-one": {"sep": "\t", "first_node": 1, "comment": "#"},
    "edgelist-space-zero": {"sep": " ", "first_node": 0, "comment": "#"},
    "edgelist-space-one": {"sep": " ", "first_node": 1, "comment": "#"},
    "snap": {"sep": "\t", "first_node": 0, "comment": "#"},
    "konect": {"sep": " ", "first_node": 1, "comment": "%"},
}


def guess_format(path: str) -> str:
    """Extension sniffing (guessFileFormat analog, graphio.pyx:1142-1302)."""
    base = os.path.basename(path).lower()
    if base.endswith(".graph"):
        return "metis"
    if base.endswith((".konect", ".tsv")):
        return "konect"
    if base.endswith(".txt"):
        return "snap"
    return "edgelist-tab-zero"


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    comment: str = "#",
    first_node: int = 0,
    continuous: bool = True,
    directed: bool = False,
):
    """-> (nodes(id[, raw]), edges(src, dst, weight)).

    ``continuous=True``: numeric ids shifted by ``first_node`` (reference
    ``scanId`` strtol path). ``continuous=False``: arbitrary string ids,
    dictionary-encoded to dense [0, n) by lexicographic rank
    (``EdgeListReader.cpp:65-83`` analog). Weight column auto-detected from
    a third csv column (``:43-44``).
    """
    raw = (
        spark.read.option("sep", sep)
        .option("comment", comment)
        .csv(path)
        .toDF(*["c0", "c1", "c2"][: 3])
        if _ncols(spark, path, sep, comment) >= 3
        else spark.read.option("sep", sep).option("comment", comment).csv(path).toDF("c0", "c1")
    )
    has_w = "c2" in raw.columns
    w = F.col("c2").cast("double") if has_w else F.lit(1.0)
    if continuous:
        edges = raw.select(
            (F.col("c0").cast("long") - first_node).alias("src"),
            (F.col("c1").cast("long") - first_node).alias("dst"),
            w.alias("weight"),
        )
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        from pyspark.sql import Window

        ids = raw.select(F.col("c0").alias("raw")).union(raw.select(F.col("c1"))).distinct()
        win = Window.orderBy("raw")
        nodes = ids.withColumn("id", (F.row_number().over(win) - 1).cast("long")).select("id", "raw")
        edges = (
            raw.join(nodes.select(F.col("raw").alias("c0"), F.col("id").alias("src")), "c0")
            .join(nodes.select(F.col("raw").alias("c1"), F.col("id").alias("dst")), "c1")
            .select("src", "dst", w.alias("weight"))
        )
    if not directed:
        from networkit_spark.graph import symmetrize

        edges = symmetrize(edges)
    return nodes, edges


def _ncols(spark, path, sep, comment) -> int:
    probe = spark.read.option("sep", sep).option("comment", comment).csv(path).limit(1)
    return len(probe.columns)


def read_snap(spark: SparkSession, path: str, directed: bool = True):
    """SNAPGraphReader.cpp parity: tab-separated, '#' comments, 0-based ids."""
    return read_edge_list(spark, path, sep="\t", comment="#", first_node=0,
                          continuous=True, directed=directed)


def read_konect(spark: SparkSession, path: str, directed: bool = False):
    """KONECTGraphReader parity: space-separated, '%' headers, 1-based ids."""
    return read_edge_list(spark, path, sep=" ", comment="%", first_node=1,
                          continuous=True, directed=directed)


def read_metis(spark: SparkSession, path: str):
    """METISGraphReader.cpp parity: header ``n m [fmt]``; line i (1-based)
    lists the (1-based) neighbors of node i-1... (nodes are 1-based in the
    format; we emit 0-based ids). Undirected: each edge appears on both
    lines, which IS our symmetrized representation.

    Line numbers come from zipWithIndex (deterministic for file sources);
    the file scan stays distributed.
    """
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long")
    body = df.filter(
        (F.col("lineno") > 0) & (~F.col("line").startswith("%")) & (F.trim("line") != "")
    )
    edges = (
        body.select(
            (F.col("lineno") - 1).alias("src"),
            F.explode(F.split(F.trim("line"), r"\s+")).alias("nbr"),
        )
        .filter(F.col("nbr") != "")
        .select("src", (F.col("nbr").cast("long") - 1).alias("dst"), F.lit(1.0).alias("weight"))
    )
    header = df.filter(F.col("lineno") == 0).first()["line"].split()
    n = int(header[0])
    nodes = spark.range(n).select(F.col("id").cast("long").alias("id"))
    return nodes, edges


def write_edge_list(
    edges: DataFrame, path: str, sep: str = "\t", first_node: int = 0
) -> None:
    """EdgeListWriter analog (one undirected edge per line, src<dst for
    symmetrized inputs would be the caller's choice — we write rows as-is)."""
    (
        edges.select(
            (F.col("src") + first_node).cast("string"),
            (F.col("dst") + first_node).cast("string"),
            F.col("weight").cast("string"),
        )
        .write.mode("overwrite")
        .option("sep", sep)
        .csv(path)
    )


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader analog: one label per line, node = line number."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long")
    return df.select(
        F.col("lineno").alias("node"), F.col("line").cast("long").alias("label")
    )
