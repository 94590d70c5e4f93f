"""HashingOverlapper — combine clusterings into a core partition by hashing.

Reference: ``cpp/overlap/HashingOverlapper.cpp:14-77``. The reference's
"region growing" combiner hashes each node's label tuple:

- 2 clusterings: ``key = ((first ^ 0xffff) << 16) | (second ^ 0xffff)``,
  ``core = djb2(key)`` where djb2 walks the key's little-endian bytes and
  STOPS at the first zero byte (the C string quirk at
  ``HashingOverlapper.cpp:18-26`` — faithfully reproduced, collisions and
  all);
- k > 2 clusterings: ``core = sum_c (djb2((c + 2) * label_c) & 0xffff)``
  starting from the all-zero partition (``:63-71``);
- the result is compacted to dense ids in ascending hash order
  (``Partition::compact`` iterates a std::map — ascending old-id order).

Distributed shape: the hash is a pure function of the LABELS, not the
nodes, so it is evaluated driver-side on the distinct label combinations
(#clusters rows, not #nodes) and broadcast-joined back — one narrow join
per input clustering at any scale. For ≤8-byte inputs djb2 never exceeds
2^63 (5381 grows by <5.1 bits per byte), so no unsigned-wrap emulation is
needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def djb2_bytes(value: int, width: int = 8) -> int:
    """djb2 over the little-endian bytes of ``value``, stopping at the
    first zero byte (``HashingOverlapper.cpp:18-26``)."""
    h = 5381
    for i in range(width):
        b = (value >> (8 * i)) & 0xFF
        if b == 0:
            break
        h = h * 33 + b
    return h


def _combine_key(la: int, lb: int) -> int:
    return ((la ^ 0xFFFF) << 16) | (lb ^ 0xFFFF)


def hashing_overlapper(partitions: list[DataFrame]) -> DataFrame:
    """(node, label) core partition from ``(node, label)`` inputs.

    All inputs must cover the same node set. Labels are assumed
    non-negative (< 2^16 for exact 2-clustering key parity, matching the
    reference's practical range)."""
    if not partitions:
        raise ValueError("no clustering provided")
    if len(partitions) == 1:
        return partitions[0].select("node", "label")
    if len(partitions) == 2:
        a, b = partitions
        pairs = (
            a.withColumnRenamed("label", "la")
            .join(b.withColumnRenamed("label", "lb"), "node")
        )
        distinct = [
            (r["la"], r["lb"]) for r in pairs.select("la", "lb").distinct().collect()
        ]
        spark = a.sparkSession
        hmap = spark.createDataFrame(
            [(la, lb, djb2_bytes(_combine_key(la, lb))) for la, lb in distinct],
            "la long, lb long, h long",
        )
        hashed = pairs.join(F.broadcast(hmap), ["la", "lb"]).select("node", "h")
    else:
        spark = partitions[0].sparkSession
        acc = partitions[0].select("node", F.lit(0).cast("long").alias("h"))
        for c, part in enumerate(partitions):
            labels = [r["label"] for r in part.select("label").distinct().collect()]
            hmap = spark.createDataFrame(
                [(lv, djb2_bytes((c + 2) * lv) & 0xFFFF) for lv in labels],
                "label long, hc long",
            )
            contrib = part.join(F.broadcast(hmap), "label").select("node", "hc")
            acc = (
                acc.join(contrib, "node")
                .select("node", (F.col("h") + F.col("hc")).alias("h"))
            )
        hashed = acc
    # Partition::compact — dense ids in ascending hash order. The distinct
    # hash set is cluster-sized: rank it alone, broadcast the mapping back.
    ranks = (
        hashed.select("h").distinct()
        .withColumn("label", F.dense_rank().over(Window.orderBy("h")) - 1)
    )
    return hashed.join(F.broadcast(ranks), "h").select(
        "node", F.col("label").cast("long").alias("label")
    )


def djb2_sql(key_expr: str, width: int = 8) -> str:
    """ANSI-SQL expression replaying :func:`djb2_bytes` on ``key_expr`` —
    unrolled byte steps with the early-stop flag, for DuckDB oracles."""
    h = "5381"
    alive = "TRUE"
    for i in range(width):
        b = f"(({key_expr}) // {256 ** i}) % 256"
        h = f"(CASE WHEN {alive} AND {b} <> 0 THEN ({h}) * 33 + {b} ELSE {h} END)"
        alive = f"({alive} AND {b} <> 0)"
    return h
