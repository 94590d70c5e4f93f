"""Edge indexing and canonical edge ordering (Graph::indexEdges / sortEdges).

Reference semantics: ``networkit/cpp/graph/Graph.cpp`` ``indexEdges``
(exposed at ``networkit/graph.pyx`` ``indexEdges``/``hasEdgeIds``/``edgeId``)
assigns every edge a unique consecutive id; for an undirected graph both
orientations of an edge share one id. ``sortEdges`` (``graph.pyx``)
canonicalizes adjacency order by neighbor id.

The reference assigns ids in adjacency-insertion order (a property of its
CSR build order). That order is not reproducible under distributed ingest,
so — exactly like the dense-node-id primitive (``plans/ids.py``) — we define
the id as the **ascending (src, dst) rank**: a pure function of the edge set,
identical under any parallelism and any input partitioning.

Distributed plan (same recipe as ``plans/ids.py``, generalized to a
two-column key; no single-task global window anywhere):

1. ``repartitionByRange(P, src, dst)`` + ``sortWithinPartitions`` — Spark's
   sampled range-partitioned sort over the composite key.
2. Freeze partition assignment (``spark_partition_id()`` + localCheckpoint).
3. P-row count aggregation -> per-partition rank offsets (driver holds P
   integers, broadcast back).
4. ``row_number()`` over a *partitioned* window + offset add.

Cost: one range shuffle of the edge table — linear in executors; at 100 TB
this is the same shape as any sort-based write, and the result can be
persisted once and reused (the reference likewise indexes once and caches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked(df: DataFrame, cols: list[str], id_col: str,
            num_partitions: int | None = None) -> DataFrame:
    """-> df's distinct ``cols`` rows + ``id_col`` = ascending rank (0-based)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.select(*cols)
        .distinct()
        .repartitionByRange(num_partitions, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid").count().collect()
    offset, offsets = 0, []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], offset))
        offset += row["count"]
    offsets_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "_pid")
        .select(
            *cols,
            (F.col("_off") + F.col("_rn") - 1).cast("long").alias(id_col),
        )
    )


def index_edges(edges: DataFrame, directed: bool = True,
                id_col: str = "edge_id") -> DataFrame:
    """-> edges + ``id_col``: consecutive 0-based ids in (src, dst) rank order.

    ``directed=False`` gives the reference's undirected contract: both
    orientations (u,v)/(v,u) carry the SAME id — ids are ranks of the
    canonical (min, max) pair set.
    """
    if directed:
        ids = _ranked(edges, ["src", "dst"], id_col)
        return edges.join(ids, ["src", "dst"])
    canon = edges.select(
        F.least("src", "dst").alias("_u"), F.greatest("src", "dst").alias("_v")
    )
    ids = _ranked(canon, ["_u", "_v"], id_col)
    return (
        edges.withColumn("_u", F.least("src", "dst"))
        .withColumn("_v", F.greatest("src", "dst"))
        .join(ids, ["_u", "_v"])
        .drop("_u", "_v")
    )


def sort_edges(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Canonical (src, dst) clustering (Graph::sortEdges analog).

    A DataFrame has no adjacency arrays to reorder; the operational
    equivalent is range-partitioning + intra-partition sort so every
    downstream per-src scan (CSR block build, neighbor iteration) reads
    contiguous runs. Returns the same rows, physically clustered.
    """
    if num_partitions is None:
        num_partitions = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    return edges.repartitionByRange(
        num_partitions, F.col("src"), F.col("dst")
    ).sortWithinPartitions("src", "dst")
