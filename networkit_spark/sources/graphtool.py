"""graph-tool binary (`.gt`) reader / writer.

Reference: ``cpp/io/GraphToolBinaryReader.cpp`` / ``GraphToolBinaryWriter.cpp``.
Layout: 6-byte magic ``e2 9b be 20 67 74``, version byte 0x01, endianness
byte (0x00 little), u64 comment length + comment bytes, 1-byte directed
flag, u64 node count, then per node a u64 out-degree followed by that many
neighbor ids whose byte width is the smallest of 1/2/4/8 that fits the node
count (``getAdjacencyWidth``). Undirected graphs store neighbors ``v <= u``
(``GraphToolBinaryWriter.cpp:72-105``). Property maps are ignored, as in the
reference reader. Unweighted.

Spark plan: unlike nkbg003 the format has no chunk index, so record
boundaries require one sequential degree walk. The driver does that walk
(u64 reads + skips over an in-memory buffer — O(n), no neighbor decoding)
to cut the file into task slices; executors decode the m neighbor ids (the
actual bulk) in parallel. For web-scale graphs prefer nkbg003/parquet —
`.gt` is an exchange format and its sequential layout caps ingest
parallelism at this boundary-walk.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


_FMT = {1: "<B", 2: "<H", 4: "<I", 8: "<Q"}


def read_graphtool(
    spark: SparkSession, path: str, tasks: int | None = None
) -> tuple[DataFrame, DataFrame, bool]:
    """-> (nodes(id), edges(src, dst, weight=1.0), directed). Undirected
    edges come back canonical (src <= dst), each once."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:6] != MAGIC or raw[6] != 0x01:
        raise ValueError("not a graph-tool binary file")
    if raw[7] not in (0x00, 0x01):
        raise ValueError("bad endianness byte")
    bo = "<" if raw[7] == 0x00 else ">"
    (clen,) = struct.unpack_from(f"{bo}Q", raw, 8)
    pos = 16 + clen
    directed = raw[pos] == 0x01
    pos += 1
    (n,) = struct.unpack_from(f"{bo}Q", raw, pos)
    pos += 8
    width = _width(n)
    if tasks is None:
        tasks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    tasks = max(1, min(tasks, max(1, n)))
    step = -(-n // tasks) if n else 1
    # boundary walk: skip deg*width per record, cutting every `step` nodes
    specs = []
    u = 0
    while u < n:
        start, lo = pos, u
        for _ in range(min(step, n - u)):
            (deg,) = struct.unpack_from(f"{bo}Q", raw, pos)
            pos += 8 + deg * width
            u += 1
        specs.append((lo, u, start, pos))
    spec_df = spark.createDataFrame(
        specs or [(0, 0, 0, 0)], "lo long, hi long, b0 long, b1 long"
    ).repartition(max(1, len(specs)))
    fmt = _FMT[width]

    def _decode(iterator):
        import pandas as pd

        for pdf in iterator:
            ss, dd = [], []
            for row in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(row.b0)
                    buf = fh.read(row.b1 - row.b0)
                off = 0
                for uu in range(row.lo, row.hi):
                    (deg,) = struct.unpack_from(f"{bo}Q", buf, off)
                    off += 8
                    for _ in range(deg):
                        (v,) = struct.unpack_from(fmt if bo == "<" else fmt.replace("<", ">"), buf, off)
                        off += width
                        if directed:
                            ss.append(uu)
                            dd.append(v)
                        else:  # stored v <= u -> canonical (v, u)
                            ss.append(v)
                            dd.append(uu)
            yield pd.DataFrame({"src": ss, "dst": dd})

    edges = spec_df.mapInPandas(_decode, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    nodes = spark.range(n).select(F.col("id").alias("id"))
    return nodes, edges, directed


def write_graphtool(
    edges: DataFrame, n: int, path: str, directed: bool = True, comment: bytes = b""
) -> None:
    """Write a compact graph as `.gt`. ``edges``: directed rows, or canonical
    (src <= dst) undirected rows. Little-endian, property maps omitted
    (the reference writer emits none either)."""
    width = _width(n)
    fmt = _FMT[width]
    if directed:
        recs = edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    else:  # store v <= u on the larger endpoint, reference convention
        recs = edges.select(
            F.greatest("src", "dst").alias("node"), F.least("src", "dst").alias("nbr")
        )
    by_node = {}
    for row in recs.orderBy("node", "nbr").toLocalIterator():
        by_node.setdefault(row["node"], []).append(row["nbr"])
    with open(path, "wb") as f:
        f.write(MAGIC + bytes([0x01, 0x00]))
        f.write(struct.pack("<Q", len(comment)) + comment)
        f.write(bytes([0x01 if directed else 0x00]))
        f.write(struct.pack("<Q", n))
        for u in range(n):
            nbrs = by_node.get(u, [])
            f.write(struct.pack("<Q", len(nbrs)))
            for v in nbrs:
                f.write(struct.pack(fmt, v))
