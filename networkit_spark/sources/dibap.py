"""DibaP binary graph reader / writer.

Reference: ``cpp/io/DibapGraphReader.cpp`` (POSIX-only, not exposed through
``graphio.pyx``). Layout — every scalar is a big-endian (network-order)
4-byte int unless noted:

    short  'GI' magic (2 bytes, ``DibapIOType::GI``)
    int    V                       (vertex count)
    int    dvw                     (vertex-weight dimension)
    int[V*dvw]   vertex weights    (if dvw > 0)
    int[V+1]     CSR offsets
    int[of[V]]   CSR neighbor ids  (symmetric: every edge stored twice)
    int    dew                     (edge-weight dimension)
    int[of[V]*dew] edge weights    (if dew > 0)
    int    dxy                     (coordinate dimension)
    float[V*dxy] coordinates       (big-endian f4, if dxy > 0)

The reference builds an undirected graph keeping the ``v <= to[e]`` half of
the symmetric CSR (``DibapGraphReader.cpp:160-180``), edge weight ``ew[e]``
when ``dew > 0`` else 1.0. Self-loops (``v == to[e]``) survive.

Spark plan: the offsets array IS a byte index, so unlike `.gt` no sequential
boundary walk is needed — the driver reads the (small) header + offsets,
cuts the node range into task slices, and each executor decodes its slice
of the neighbor/weight arrays with a single big-endian ``numpy.frombuffer``
(vectorized, no per-row Python). At web scale the offsets array itself
would be chunk-read the same way; like `.gt`, DibaP is an exchange format —
parquet/nkbg003 are the scale paths.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"GI"


def read_dibap(
    spark: SparkSession, path: str, tasks: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """-> (nodes(id), edges(src, dst, weight)) — undirected, canonical
    ``src <= dst``, each edge once (reference keeps the ``v <= to[e]``
    half of the symmetric CSR)."""
    import numpy as np

    with open(path, "rb") as f:
        head = f.read(10)
        if head[:2] != MAGIC:
            raise ValueError("not a DibaP 'GI' graph file")
        v_cnt, dvw = struct.unpack(">ii", head[2:10])
        pos = 10 + 4 * v_cnt * dvw  # skip vertex weights
        f.seek(pos)
        of = np.frombuffer(f.read(4 * (v_cnt + 1)), dtype=">i4")
    base_of = pos
    base_to = base_of + 4 * (v_cnt + 1)
    num_e2 = int(of[v_cnt]) if v_cnt else 0
    base_dew = base_to + 4 * num_e2
    with open(path, "rb") as f:
        f.seek(base_dew)
        (dew,) = struct.unpack(">i", f.read(4))
    base_ew = base_dew + 4

    if tasks is None:
        tasks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    tasks = max(1, min(tasks, max(1, v_cnt)))
    step = -(-v_cnt // tasks) if v_cnt else 1
    specs = [(lo, min(lo + step, v_cnt)) for lo in range(0, v_cnt, step)]
    spec_df = spark.createDataFrame(
        specs or [(0, 0)], "lo long, hi long"
    ).repartition(max(1, len(specs)))

    def _decode(iterator):
        import numpy as np
        import pandas as pd

        for pdf in iterator:
            for row in pdf.itertuples(index=False):
                lo, hi = int(row.lo), int(row.hi)
                with open(path, "rb") as fh:
                    fh.seek(base_of + 4 * lo)
                    of_sl = np.frombuffer(
                        fh.read(4 * (hi - lo + 1)), dtype=">i4"
                    ).astype(np.int64)
                    fh.seek(base_to + 4 * of_sl[0])
                    dst = np.frombuffer(
                        fh.read(4 * (of_sl[-1] - of_sl[0])), dtype=">i4"
                    ).astype(np.int64)
                    if dew > 0:
                        # weight of edge e is ew[e*dew] (first component)
                        fh.seek(base_ew + 4 * of_sl[0] * dew)
                        ew = np.frombuffer(
                            fh.read(4 * (of_sl[-1] - of_sl[0]) * dew), dtype=">i4"
                        ).astype(np.float64)[::dew]
                    else:
                        ew = np.ones(len(dst))
                src = np.repeat(np.arange(lo, hi), np.diff(of_sl))
                keep = src <= dst
                yield pd.DataFrame(
                    {"src": src[keep], "dst": dst[keep], "weight": ew[keep]}
                )

    edges = spec_df.mapInPandas(_decode, "src long, dst long, weight double")
    nodes = spark.range(v_cnt).select(F.col("id").alias("id"))
    return nodes, edges


def write_dibap(edges: DataFrame, n: int, path: str, weighted: bool = False) -> None:
    """Write canonical undirected edges (``src <= dst``, each once) as a
    DibaP 'GI' file: symmetric CSR, dvw=0, dew=(1 if weighted), dxy=0.
    Integer edge weights only (the format stores int weights). Driver-side
    assembly, like the reference writer-less format — exchange use only."""
    import numpy as np

    sym = edges.select("src", "dst", "weight").union(
        edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    rows = sym.orderBy("src", "dst").collect()
    src = np.array([r["src"] for r in rows], dtype=np.int64)
    dst = np.array([r["dst"] for r in rows], dtype=np.int64)
    wts = np.array([r["weight"] for r in rows], dtype=np.int64)
    counts = np.bincount(src, minlength=n) if len(src) else np.zeros(n, dtype=np.int64)
    of = np.concatenate(([0], np.cumsum(counts))).astype(">i4")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack(">ii", n, 0))
        f.write(of.tobytes())
        f.write(dst.astype(">i4").tobytes())
        f.write(struct.pack(">i", 1 if weighted else 0))
        if weighted:
            f.write(wts.astype(">i4").tobytes())
        f.write(struct.pack(">i", 0))
