"""Partition / Cover I/O family (reference `io` module).

* text Partition: one subset id per line, node = line number
  (``PartitionReader.cpp`` / ``PartitionWriter.cpp``; the reader lives in
  ``sources/edgelist.read_partition``).
* text Cover: the i-th non-comment line lists the member nodes of subset i
  (``CoverReader.cpp:18-28`` / ``CoverWriter.cpp``) — a node may appear in
  several lines (overlapping communities).
* binary Partition: ``n`` little-endian fixed-width (4/8 byte) subset ids,
  node = record index (``BinaryPartitionReader.cpp:13-45`` / Writer).
* binary edge-list Partition: (node, subset) fixed-width LE pairs across one
  or more shard files (``BinaryEdgeListPartitionReader.cpp``) — the
  distributed-friendly variant: order-free, shardable.

Spark notes: text/binary-indexed formats are sequential by construction
(record position IS the node id), so writers assemble on the driver via a
streaming iterator — rendering stays in Spark; the edge-list binary variant
reads and writes shard-parallel (one task per shard), which is the format
to use at scale.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partition(labels: DataFrame, path: str) -> None:
    """PartitionWriter: line i = subset id of node i (nodes must be 0..n-1)."""
    with open(path, "w") as f:
        for row in labels.orderBy("node").select("label").toLocalIterator():
            f.write(f"{row['label']}\n")


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """-> (node, subset): subset = 0-based non-comment line number, members =
    whitespace-separated node ids on that line (CoverReader semantics)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(rdd, "line string, lineno long")
    body = df.filter(~F.col("line").startswith("#"))
    from networkit_spark.plans.ids import dense_ids

    # comment lines do NOT consume subset ids: re-rank surviving lines
    ranked = dense_ids(body.select("lineno"), "lineno", id_col="subset", distinct=False)
    body = body.join(ranked, "lineno")
    toks = F.filter(F.split(F.trim("line"), r"\s+"), lambda t: t != "")
    return (
        body.select("subset", F.explode(toks).alias("tok"))
        .select(F.col("tok").cast("long").alias("node"), "subset")
    )


def write_cover(cover: DataFrame, path: str) -> None:
    """CoverWriter: line i = members of subset i, ascending node order."""
    rows = (
        cover.groupBy("subset")
        .agg(F.array_join(F.array_sort(F.collect_list("node")), " ").alias("line"))
        .orderBy("subset")
    )
    with open(path, "w") as f:
        for row in rows.select("line").toLocalIterator():
            f.write(row["line"] + "\n")


def read_binary_partition(spark: SparkSession, path: str, width: int = 8) -> DataFrame:
    """BinaryPartitionReader: n fixed-width LE subset ids, node = index."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    size = os.path.getsize(path)
    if size % width:
        raise ValueError("length of partition file must be a multiple of the width")
    n = size // width
    # index-addressed records: split into ranges, decode slice per task
    tasks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    step = max(1, -(-n // tasks))
    specs = [(i, min(n, i + step)) for i in range(0, n, step)]
    spec_df = spark.createDataFrame(specs or [(0, 0)], "lo long, hi long").repartition(
        max(1, len(specs))
    )
    fmt = "<I" if width == 4 else "<Q"

    def _decode(iterator):
        import pandas as pd

        for pdf in iterator:
            nodes, labels = [], []
            for row in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(row.lo * width)
                    buf = fh.read((row.hi - row.lo) * width)
                for i in range(row.hi - row.lo):
                    (lab,) = struct.unpack_from(fmt, buf, i * width)
                    nodes.append(row.lo + i)
                    labels.append(lab)
            yield pd.DataFrame({"node": nodes, "label": labels})

    return spec_df.mapInPandas(_decode, "node long, label long")


def write_binary_partition(labels: DataFrame, path: str, width: int = 8) -> None:
    """BinaryPartitionWriter: nodes must be compact 0..n-1."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    fmt = "<I" if width == 4 else "<Q"
    with open(path, "wb") as f:
        for row in labels.orderBy("node").select("label").toLocalIterator():
            f.write(struct.pack(fmt, int(row["label"])))


def read_binary_edgelist_partition(
    spark: SparkSession, paths: list[str] | str, width: int = 8
) -> DataFrame:
    """BinaryEdgeListPartitionReader: fixed-width LE (node, subset) pairs
    across shard files — order-free, so shards decode fully in parallel."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    if isinstance(paths, str):
        paths = [paths]
    fmt = "<I" if width == 4 else "<Q"
    files = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(1, len(paths))
    )

    def _decode(iterator):
        import pandas as pd

        for pdf in iterator:
            nodes, labels = [], []
            for row in pdf.itertuples(index=False):
                with open(row.path, "rb") as fh:
                    buf = fh.read()
                if len(buf) % (2 * width):
                    raise ValueError("file length must be a multiple of 2*width")
                for off in range(0, len(buf), 2 * width):
                    (u,) = struct.unpack_from(fmt, buf, off)
                    (p_,) = struct.unpack_from(fmt, buf, off + width)
                    nodes.append(u)
                    labels.append(p_)
            yield pd.DataFrame({"node": nodes, "label": labels})

    return files.mapInPandas(_decode, "node long, label long")


def write_binary_edgelist_partition(
    labels: DataFrame, dir_path: str, width: int = 8, shards: int | None = None
) -> None:
    """Shard-parallel writer for the (node, subset) pair format."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    spark = labels.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    os.makedirs(dir_path, exist_ok=True)
    fmt = "<I" if width == 4 else "<Q"

    def _write(key, pdf):
        import pandas as pd

        shard = int(key[0])
        pdf = pdf.sort_values("node")
        with open(os.path.join(dir_path, f"part-{shard:05d}"), "wb") as f:
            for u, lab in zip(pdf["node"], pdf["label"]):
                f.write(struct.pack(fmt, int(u)) + struct.pack(fmt, int(lab)))
        return pd.DataFrame({"shard": [shard]})

    (
        labels.withColumn("shard", F.pmod(F.hash("node"), F.lit(shards)).cast("int"))
        .groupBy("shard")
        .applyInPandas(_write, "shard int")
        .count()
    )


def read_edgelist_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """EdgeListCoverReader (``EdgeListCoverReader.cpp:16-46``): each
    non-comment line = node id followed by the ids of the subsets it belongs
    to (node ids shifted by ``first_node``); -> (node, subset)."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    toks = F.filter(F.split(F.trim("value"), r"\s+"), lambda t: t != "")
    return (
        lines.select(toks.alias("t"))
        .select(
            (F.col("t")[0].cast("long") - first_node).alias("node"),
            F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("ss"),
        )
        .select("node", F.explode("ss").alias("s"))
        .select("node", F.col("s").cast("long").alias("subset"))
    )


def write_dot_partition(edges, labels, path: str) -> None:
    """DotPartitionWriter (``io/DotPartitionWriter.cpp:30-49``): a DOT graph
    whose non-isolated nodes are filled with an HSV hue per cluster
    (hue = rank of the cluster id among the clusters present / #clusters,
    pinned ascending — the reference's unordered-set iteration order is
    unspecified) plus one ``u -- v;`` line per canonical edge.

    ``edges``: canonical (src < dst) rows; ``labels``: (node, label).
    """
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    deg_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    present = (
        deg_nodes.join(labels, "node")
        .select("label")
        .distinct()
    )
    k = present.count()
    hue = present.orderBy("label").collect()
    hue_map = spark.createDataFrame(
        [(int(r["label"]), i / k) for i, r in enumerate(hue)],
        "label long, hue double",
    )
    node_lines = (
        deg_nodes.join(labels, "node")
        .join(F.broadcast(hue_map), "label")
        .select(
            F.lit(1).alias("o"),
            F.col("node").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.concat(
                F.col("node").cast("string"),
                F.lit(' [style=filled, color="'),
                F.col("hue").cast("string"),
                F.lit(',0.99,0.99", label='),
                F.col("label").cast("string"),
                F.lit("];"),
            ).alias("x"),
        )
    )
    edge_lines = edges.select(
        F.lit(2).alias("o"),
        F.col("src").cast("long").alias("k1"),
        F.col("dst").cast("long").alias("k2"),
        F.concat(
            F.col("src").cast("string"), F.lit(" -- "),
            F.col("dst").cast("string"), F.lit(";"),
        ).alias("x"),
    )
    hdr = spark.createDataFrame(
        [(0, 0, 0, "graph {"), (3, 0, 0, "}")], "o int, k1 long, k2 long, x string"
    )
    (
        hdr.unionByName(node_lines).unionByName(edge_lines)
        .orderBy("o", "k1", "k2")
        .select("x")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_snap_cover(spark: SparkSession, path: str,
                    node_map: DataFrame | None = None) -> DataFrame:
    """SNAPEdgeListPartitionReader (``io/SNAPEdgeListPartitionReader.cpp:
    22-108``): one community per line, whitespace-separated node ids;
    subset id = 1-based RAW line number (the reference increments the
    counter before the comment/empty check, so skipped lines consume ids).
    ``node_map`` = optional (orig, node) remapping (the reference's
    mapNodeIds; unknown ids are dropped with a warning there — dropped here
    via inner join). -> (node, subset)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(rdd, "line string, lineno long")
    members = (
        df.filter(~F.col("line").startswith("#"))
        .filter(F.length(F.trim(F.col("line"))) > 0)
        .select(
            (F.col("lineno") + 1).alias("subset"),
            F.explode(F.split(F.trim(F.col("line")), r"\s+")).alias("tok"),
        )
        .select(F.col("tok").cast("long").alias("orig"), "subset")
    )
    if node_map is not None:
        members = members.join(node_map, "orig").select("node", "subset")
    else:
        members = members.select(F.col("orig").alias("node"), "subset")
    return members


def read_edgelist_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = "\t"
) -> DataFrame:
    """EdgeListPartitionReader (EdgeListPartitionReader.cpp:15-44): text
    lines ``node<sep>subset``, comment lines start with a literal ``#``
    token, node ids shifted down by ``first_node`` -> (node, label).

    Order-free pairs, so the parse is a plain distributed line scan —
    unlike the positional text Partition format this shards freely.
    """
    lines = spark.read.text(path)
    toks = F.split(F.col("value"), sep)
    # try_cast: ANSI mode may evaluate the projection cast before the
    # comment filter once codegen collapses them into one stage
    return (
        lines.filter(F.trim(F.col("value")) != "")
        .filter(toks.getItem(0) != "#")
        .select(
            (toks.getItem(0).try_cast("long") - first_node).alias("node"),
            toks.getItem(1).try_cast("long").alias("label"),
        )
        .filter(F.col("node").isNotNull() & F.col("label").isNotNull())
    )


def read_mat(spark: SparkSession, path: str, key: str = "G"):
    """MatReader (graphio.pyx:1388-1448): adjacency matrix stored in a
    Matlab .mat file under ``key`` -> (src, dst, weight) upper-triangle
    edges. Gated on scipy (not in this container): the .mat v5 container
    is zlib-record packed and scipy.io owns that parsing; everything after
    the load is distributed (createDataFrame over COO triples).
    """
    try:
        from scipy.io import loadmat
        from scipy.sparse import coo_matrix
    except ImportError as e:  # pragma: no cover - container has no scipy
        raise NotImplementedError(
            "read_mat needs scipy.io (unavailable in this container)"
        ) from e
    mat = loadmat(path)[key]
    coo = coo_matrix(mat)
    rows = [
        (int(r), int(c), float(v))
        for r, c, v in zip(coo.row, coo.col, coo.data)
        if r <= c
    ]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def write_mat(und_edges: DataFrame, path: str, key: str = "G", n: int | None = None) -> None:
    """MatWriter (graphio.pyx:1450-1489) twin — scipy-gated like read_mat."""
    try:
        from scipy.io import savemat
        from scipy.sparse import coo_matrix
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "write_mat needs scipy.io (unavailable in this container)"
        ) from e
    rows = und_edges.select("src", "dst").collect()
    if n is None:
        n = 1 + max((max(r["src"], r["dst"]) for r in rows), default=-1)
    import numpy as np

    src = np.array([r["src"] for r in rows] + [r["dst"] for r in rows])
    dst = np.array([r["dst"] for r in rows] + [r["src"] for r in rows])
    savemat(path, {key: coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))})
