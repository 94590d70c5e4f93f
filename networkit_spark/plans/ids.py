"""Distributed dense-id assignment (the dictionary-encode primitive).

Every ingest path (url -> node id, string edge-list ids, label compaction)
needs "dense ids [0, n) in ascending key order". The naive Spark spelling —
``row_number()`` over ``Window.orderBy(key)`` with no ``partitionBy`` — plans
as a SINGLE-partition global sort: every distinct key funnels through one
task, which is the scale-killer at the head of every pipeline (round-1
verdict, top item). Reference analog of the *semantics*:
``cpp/io/EdgeListReader.cpp:65-83`` (string->id insertion map) and
``GraphTools::getContinuousNodeIds`` (``cpp/graph/GraphTools.cpp:432-439``) —
we pick ascending-key order instead of insertion order so the assignment is
reproducible under any parallelism.

Distributed plan (all JVM-side, no Python in the data path):

1. ``repartitionByRange(P, key)`` + ``sortWithinPartitions(key)`` — Spark's
   range-partitioned distributed sort (sampled boundaries; partition i holds
   keys strictly below partition i+1's).
2. Materialize ``spark_partition_id()`` and localCheckpoint, so the partition
   assignment is frozen for both passes.
3. One tiny aggregation ``groupBy(_pid).count()`` -> per-partition offsets on
   the driver (P rows; P ~ thousands on a real cluster).
4. ``row_number() over (partition by _pid order by key)`` — a *partitioned*
   window, one task per range partition — plus a broadcast join of the
   offsets: ``id = offset[_pid] + rn - 1``.

The id of a key equals its global rank regardless of where the sampled range
boundaries fall, because range partitions are totally ordered. Cost: one
range shuffle + one hash shuffle of the (small, distinct-key) dictionary —
both linear in executors, no single-task stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    keys: DataFrame,
    key_col: str,
    id_col: str = "id",
    num_partitions: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """-> DataFrame(id_col long, key_col) with ids = ascending-key rank.

    ``keys`` may contain duplicates unless ``distinct=False`` (caller
    guarantees uniqueness). ``num_partitions`` defaults to the session's
    shuffle partitions (pass ~2-3x total cores on a real cluster).
    """
    spark = keys.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    df = keys.select(key_col)
    if distinct:
        df = df.distinct()
    ranged = (
        df.repartitionByRange(num_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid").count().collect()
    offset = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], offset))
        offset += row["count"]
    offsets_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(key_col)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "_pid")
        .select(
            (F.col("_off") + F.col("_rn") - 1).cast("long").alias(id_col),
            key_col,
        )
    )


def global_min_rank(
    rows: DataFrame,
    key_col: str,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``RANK() OVER (ORDER BY key)`` without the single-partition window.

    Returns ``rows`` + ``rank_col`` (1-based min-rank, ties share the rank of
    their first row — standard ``rank`` semantics). Same range-sort +
    per-partition-offset plan as :func:`dense_ids`; tie groups are never
    split across range partitions (partitioning is a pure function of the
    key), so within-partition ``rank()`` + the partition's row offset equals
    the global rank.
    """
    spark = rows.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        rows.repartitionByRange(num_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid").count().collect()
    offset = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], offset))
        offset += row["count"]
    offsets_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(key_col)
    out_cols = [c for c in rows.columns]
    return (
        ranged.withColumn("_rk", F.rank().over(w))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rk")).cast("long"))
        .select(*out_cols, rank_col)
    )


def random_dense_ids(
    keys: DataFrame, key_col: str, seed: int = 42, id_col: str = "id"
) -> DataFrame:
    """``GraphTools::getRandomContinuousNodeIds`` (graphtools.pyx:590):
    dense [0, n) ids assigned in seeded-random order — the same
    range-sort + offset plan as :func:`dense_ids`, ranked by the portable
    md5 draw of the key (draw ties broken by the key itself), so the
    permutation is deterministic under any partitioning."""
    from networkit_spark.operators.sampling import _draw

    keyed = keys.select(key_col).distinct().select(
        F.struct(
            _draw("perm", seed, F.col(key_col)).alias("d"),
            F.col(key_col).alias("k"),
        ).alias("_pk")
    )
    ranked = dense_ids(keyed, "_pk", id_col=id_col, distinct=False)
    return ranked.select(id_col, F.col("_pk.k").alias(key_col))
