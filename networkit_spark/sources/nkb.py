"""NetworkitBinary (`.nkbg003`) reader / writer.

Format: ``cpp/io/NetworkitBinaryGraph.md`` + ``NetworkitBinaryReader.cpp`` /
``NetworkitBinaryWriter.cpp`` and the prefix-varint codec of
``include/networkit/io/NetworkitBinaryGraph.hpp:76-139`` (the header byte's
trailing-zero count = number of data bytes; zigzag for signed weights).

Layout: 88-byte header (magic ``nkbg003``, feature bits: bit0 directed,
bits1-3 weight format, bit4 edge ids), base data (one flag byte per node,
``firstVertex[chunks-1]`` u64), then adjacency / transpose / weight /
weight-transpose blocks, each prefixed with per-chunk data offsets
(``u64[chunks-1]``; the adjacency blocks add a u64 edge count). Undirected
graphs store neighbor ``v <= u`` in node u's out list and ``v >= u`` in its
transpose list (``NetworkitBinaryWriter.cpp:232-246``), so the out lists
alone carry each undirected edge exactly once — the reader here decodes only
the out-adjacency block and its weights.

Spark plan: the *chunk* is the format's parallelism unit (the reference
reads chunks under OpenMP; ``NetworkitBinaryReader.cpp:289-292``). The
driver parses the 88-byte header + base data, computes each chunk's byte
range, and ships one row per chunk; executors open the file (shared
storage on a real cluster, like every distributed reader here) and decode
their slice. The writer builds per-chunk blobs with ``applyInPandas`` and
the driver assembles header + offset tables by streaming the chunk files —
no node-scale data ever lands on the driver.
"""

from __future__ import annotations

import os
import shutil
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"nkbg003\x00"
DIR_MASK = 0x1
WGHT_SHIFT = 1
WGHT_MASK = 0xE
INDEX_MASK = 0x10
W_NONE, W_VARINT, W_SIGNED, W_DOUBLE, W_FLOAT = 0, 1, 2, 3, 4
HEADER = struct.Struct("<8s11Q")  # magic + checksum/features/nodes/chunks + 7 offsets
BASE_PAD = 96  # == HEADER.size: base data starts right after the header


def varint_encode(v: int) -> bytes:
    if v == 0:
        return b"\x01"
    bits = v.bit_length()
    for d in range(8):
        if bits <= 7 + 7 * d:
            header = ((v << (d + 1)) | (1 << d)) & 0xFF
            return bytes([header]) + (v >> (7 - d)).to_bytes(d, "little")
    return b"\x00" + v.to_bytes(8, "little")


def varint_decode(buf, pos: int) -> tuple[int, int]:
    b0 = buf[pos]
    if b0 == 0:
        return int.from_bytes(buf[pos + 1 : pos + 9], "little"), pos + 9
    y = (b0 & -b0).bit_length() - 1  # trailing zeros = data byte count
    v = b0 >> (y + 1)
    if y:
        v |= int.from_bytes(buf[pos + 1 : pos + 1 + y], "little") << (7 - y)
    return v, pos + 1 + y


def zigzag_encode(v: int) -> int:
    return ((v << 1) ^ (-1 if v < 0 else 0)) & ((1 << 64) - 1)


def zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _parse_header(raw: bytes):
    fields = HEADER.unpack(raw[: HEADER.size])
    if fields[0] != MAGIC:
        raise ValueError(f"not a nkbg003 file (magic {fields[0]!r})")
    (_, _checksum, features, nodes, chunks, off_base, off_adj, off_tr,
     off_w, off_wt, _off_id, _off_idt) = fields
    return {
        "directed": bool(features & DIR_MASK),
        "wfmt": (features & WGHT_MASK) >> WGHT_SHIFT,
        "indexed": bool(features & INDEX_MASK),
        "nodes": nodes,
        "chunks": chunks,
        "off_base": off_base,
        "off_adj": off_adj,
        "off_tr": off_tr,
        "off_w": off_w,
        "off_wt": off_wt,
    }


def _chunk_starts(raw: bytes, block_off: int, chunks: int, counted: bool):
    """Absolute data-start offset per chunk inside one block."""
    tbl = [0] + [
        struct.unpack_from("<Q", raw, block_off + 8 * i)[0] for i in range(chunks - 1)
    ]
    data0 = block_off + 8 * (chunks - 1) + (8 if counted else 0)
    return [data0 + t for t in tbl]


def read_networkit_binary(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, bool]:
    """-> (nodes (id), edges (src, dst, weight), directed).

    Undirected graphs come back canonical (src <= dst), each edge once.
    """
    with open(path, "rb") as f:
        raw = f.read()  # driver holds header+tables; executors re-read slices
    h = _parse_header(raw)
    n, chunks, wfmt, directed = h["nodes"], h["chunks"], h["wfmt"], h["directed"]
    flags = raw[h["off_base"] : h["off_base"] + n]
    alive = [i for i in range(n) if flags[i] & 0x1]
    fv = [0] + [
        struct.unpack_from("<Q", raw, h["off_base"] + n + 8 * i)[0]
        for i in range(chunks - 1)
    ] + [n]
    if h["indexed"]:
        raise NotImplementedError("edge-id blocks (feature bit 4) not supported")

    adj_starts = _chunk_starts(raw, h["off_adj"], chunks, counted=True)
    adj_ends = adj_starts[1:] + [h["off_tr"]]
    w_starts = _chunk_starts(raw, h["off_w"], chunks, counted=False)
    w_ends = w_starts[1:] + [h["off_wt"]]
    specs = [
        (c, fv[c], fv[c + 1], adj_starts[c], adj_ends[c], w_starts[c], w_ends[c])
        for c in range(chunks)
    ]
    spec_df = spark.createDataFrame(
        specs, "c int, lo long, hi long, a0 long, a1 long, w0 long, w1 long"
    ).repartition(max(1, min(chunks, 64)))

    def _decode(iterator):
        import pandas as pd

        for pdf in iterator:
            out_s, out_d, out_w = [], [], []
            for row in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(row.a0)
                    abuf = fh.read(row.a1 - row.a0)
                    fh.seek(row.w0)
                    wbuf = fh.read(max(0, row.w1 - row.w0))
                apos, wpos = 0, 0
                for u in range(row.lo, row.hi):
                    deg, apos = varint_decode(abuf, apos)
                    for _ in range(deg):
                        v, apos = varint_decode(abuf, apos)
                        if wfmt == W_NONE:
                            wt = 1.0
                        elif wfmt == W_VARINT:
                            iv, wpos = varint_decode(wbuf, wpos)
                            wt = float(iv)
                        elif wfmt == W_SIGNED:
                            iv, wpos = varint_decode(wbuf, wpos)
                            wt = float(zigzag_decode(iv))
                        elif wfmt == W_DOUBLE:
                            (wt,) = struct.unpack_from("<d", wbuf, wpos)
                            wpos += 8
                        else:
                            (wt,) = struct.unpack_from("<f", wbuf, wpos)
                            wpos += 4
                            wt = float(wt)
                        if directed:
                            out_s.append(u)
                            out_d.append(v)
                        else:  # out list holds v <= u -> canonical (v, u)
                            out_s.append(v)
                            out_d.append(u)
                        out_w.append(wt)
            yield pd.DataFrame({"src": out_s, "dst": out_d, "weight": out_w})

    edges = spec_df.mapInPandas(_decode, "src long, dst long, weight double")
    nodes = spark.createDataFrame([(i,) for i in alive], "id long")
    return nodes, edges, directed


def write_networkit_binary(
    edges: DataFrame,
    n: int,
    path: str,
    directed: bool = True,
    weighted: bool = True,
    chunks: int | None = None,
) -> None:
    """Write a compact graph (node ids 0..n-1 all present) as nkbg003.

    ``edges``: directed rows, or canonical (src <= dst) undirected rows.
    Neighbor lists are written ascending. Weights use the DOUBLE format.
    """
    spark = edges.sparkSession
    if chunks is None:
        chunks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    chunks = max(1, min(chunks, n)) if n else 1
    step = -(-n // chunks) if n else 1
    tmp = path + ".tmpchunks"
    os.makedirs(tmp, exist_ok=True)

    # each record: (owner node, block 0=adj/1=transpose, neighbor, weight)
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    if directed:
        recs = e.select(
            F.col("src").alias("node"), F.lit(0).alias("blk"), F.col("dst").alias("nbr"), "weight"
        ).union(
            e.select(F.col("dst").alias("node"), F.lit(1).alias("blk"), F.col("src").alias("nbr"), "weight")
        )
    else:  # canonical a <= b: out list of b gets a; transpose of a gets b
        recs = e.select(
            F.greatest("src", "dst").alias("node"), F.lit(0).alias("blk"),
            F.least("src", "dst").alias("nbr"), "weight",
        ).union(
            e.select(F.least("src", "dst").alias("node"), F.lit(1).alias("blk"),
                     F.greatest("src", "dst").alias("nbr"), "weight")
        )
    recs = recs.withColumn("c", (F.col("node") / step).cast("int"))
    cids = spark.range(chunks).select(F.col("id").cast("int").alias("c"))
    full = cids.join(recs, "c", "left")

    def _emit(key, pdf):
        import pandas as pd

        c = int(key[0])
        lo, hi = c * step, min(n, (c + 1) * step)
        pdf = pdf.dropna(subset=["node"]).sort_values(["blk", "node", "nbr"])
        counts = [0, 0]
        for blk in (0, 1):
            sub = pdf[pdf["blk"] == blk]
            by_node = {
                int(k): list(zip(g["nbr"].astype("int64"), g["weight"]))
                for k, g in sub.groupby("node")
            }
            ab, wb = bytearray(), bytearray()
            for u in range(lo, hi):
                nbrs = by_node.get(u, [])
                counts[blk] += len(nbrs)
                ab += varint_encode(len(nbrs))
                for v, wt in nbrs:
                    ab += varint_encode(int(v))
                    if weighted:
                        wb += struct.pack("<d", float(wt))
            suffix = "adj" if blk == 0 else "tr"
            with open(os.path.join(tmp, f"{c:06d}.{suffix}"), "wb") as f:
                f.write(bytes(ab))
            with open(os.path.join(tmp, f"{c:06d}.{suffix}w"), "wb") as f:
                f.write(bytes(wb))
        return pd.DataFrame({"c": [c], "out_n": [counts[0]], "in_n": [counts[1]]})

    stats = (
        full.groupBy("c")
        .applyInPandas(_emit, "c int, out_n long, in_n long")
        .collect()
    )
    out_total = sum(r.out_n for r in stats)
    in_total = sum(r.in_n for r in stats)

    def _block(suffix: str, counted: int | None):
        sizes = [
            os.path.getsize(os.path.join(tmp, f"{c:06d}.{suffix}")) for c in range(chunks)
        ]
        tbl = bytearray()
        acc = 0
        for c in range(chunks - 1):
            acc += sizes[c]
            tbl += struct.pack("<Q", acc)
        if counted is not None:
            tbl += struct.pack("<Q", counted)
        return bytes(tbl), sizes

    wfmt = W_DOUBLE if weighted else W_NONE
    features = (DIR_MASK if directed else 0) | (wfmt << WGHT_SHIFT)
    base = bytes([0x1] * n) + b"".join(
        struct.pack("<Q", min(n, (c + 1) * step)) for c in range(chunks - 1)
    )
    adj_tbl, adj_sizes = _block("adj", out_total)
    tr_tbl, tr_sizes = _block("tr", in_total)
    aw_tbl, aw_sizes = _block("adjw", None)
    tw_tbl, tw_sizes = _block("trw", None)

    off_base = BASE_PAD
    off_adj = off_base + len(base)
    off_tr = off_adj + len(adj_tbl) + sum(adj_sizes)
    off_w = off_tr + len(tr_tbl) + sum(tr_sizes)
    off_wt = off_w + len(aw_tbl) + sum(aw_sizes)
    header = HEADER.pack(
        MAGIC, 0, features, n, chunks, off_base, off_adj, off_tr, off_w, off_wt, 0, 0
    )
    with open(path, "wb") as out:
        out.write(header)
        out.write(b"\x00" * (BASE_PAD - len(header)))
        out.write(base)
        for tbl, suffix in ((adj_tbl, "adj"), (tr_tbl, "tr"), (aw_tbl, "adjw"), (tw_tbl, "trw")):
            out.write(tbl)
            for c in range(chunks):
                with open(os.path.join(tmp, f"{c:06d}.{suffix}"), "rb") as f:
                    shutil.copyfileobj(f, out)
    shutil.rmtree(tmp)
