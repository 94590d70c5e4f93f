"""Distributed Bloom filter — reference parity for the membership sketch in
``networkit/cpp/auxiliary/BloomFilter.cpp`` (k salted hash functions over a
bit array; ``isMember`` = all k bits set), re-expressed as a two-table Spark
plan so both the build and the probe stay distributed:

* build: every element contributes k bit positions (one ``posexplode`` over
  the hash sequence), positions fold into 64-bit words with a single
  ``bit_or`` hash agg — the filter IS a tiny (word_idx, word) DataFrame
  (m/64 rows), broadcastable by construction.
* probe: re-derive the k (word, mask) pairs per probe row, broadcast-join
  the word table, and AND the masks — ``maybe = min(bit set) == 1``. No
  shuffle on the probe side beyond the final aggregation.

Hashing uses the repo's portable-draw convention (``operators/sampling.py``):
position_i = md5('bloom'|seed|i|key) folded to 60 bits, mod m — a pure
function of the row, byte-identical in DuckDB, so the correctness-gate
oracle replays the exact filter.

Bloom guarantees hold: zero false negatives always (asserted in tests);
false-positive rate ~ (1 - e^{-kn/m})^k.

At 100 TB the filter table is what you broadcast to pre-filter a huge probe
table before an expensive exact join (the classic semi-join reduction); m
scales to billions of bits = hundreds of MB of words, still a sane
broadcast, and the build is one narrow pass + one agg over n rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 64


def _pos(col: Column, i: Column, seed: int, m_bits: int) -> Column:
    key = F.concat_ws("|", F.lit("bloom"), F.lit(str(seed)), i.cast("string"),
                      col.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(m_bits))


def pos_sql(expr: str, i_expr: str, seed: int, m_bits: int) -> str:
    """The DuckDB twin of ``_pos`` for oracle SQL."""
    return (
        f"(('0x' || substr(md5(concat_ws('|', 'bloom', '{seed}', "
        f"CAST({i_expr} AS VARCHAR), CAST({expr} AS VARCHAR))), 1, 15))::BIGINT"
        f" % {m_bits} + {m_bits}) % {m_bits}"
    )


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int,
                seed: int = 42) -> DataFrame:
    """-> (word_idx long, word long): the OR-folded bit array, only the
    non-zero words (absent word_idx == all-zero word)."""
    pos = _pos(F.col("_v"), F.col("i"), seed, m_bits)
    return (
        df.select(F.posexplode(F.array_repeat(F.col(col), k)).alias("i", "_v"))
        .select(pos.alias("p"))
        .select(
            (F.col("p") / _BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BITS} AS INT))")
            .alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_contains(probes: DataFrame, bloom: DataFrame, col: str,
                   m_bits: int, k: int, seed: int = 42) -> DataFrame:
    """-> probes columns + ``maybe`` boolean. Zero false negatives; a True
    is "maybe present" with the standard Bloom false-positive rate."""
    pos = _pos(F.col(col), F.col("i"), seed, m_bits)
    exploded = (
        probes.select(col)
        .distinct()
        .select(F.col(col), F.posexplode(F.array_repeat(F.col(col), k)).alias("i", "_v"))
        .select(col, pos.alias("p"))
        .select(
            col,
            (F.col("p") / _BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BITS} AS INT))")
            .alias("mask"),
        )
    )
    hit = (
        exploded.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            col,
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))
             == F.col("mask")).cast("int").alias("bit"),
        )
        .groupBy(col)
        .agg((F.min("bit") == 1).alias("maybe"))
    )
    return probes.join(hit, col, "left")
