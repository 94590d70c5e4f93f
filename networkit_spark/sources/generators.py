"""Deterministic graph generators (hash-based, fully distributed).

Reference: ``networkit/generators.pyx`` / ``cpp/generators/`` (29 files):
ErdosRenyi (:296), ChungLu (:438), RMAT (:1431), WattsStrogatz (:1627),
ClusteredRandomGraph (:394), BarabasiAlbert (:83), PowerlawDegreeSequence
(:633) et al. The reference uses sequential PRNG state; our generators are
**pure functions of (seed, index)** via xxhash64 — reproducible under any
parallelism, generated straight from ``spark.range`` (no data motion, no
driver loops), which is the only shape that works at 10^12 edges.

- :func:`gnm` — G(n, m): m edges with hash-uniform endpoints (the scalable
  Erdos-Renyi form; G(n, p) == G(n, round(p*n*(n-1)))) in expectation).
- :func:`powerlaw_digraph` — Chung-Lu-style: endpoints drawn from a Zipf-ish
  power law by inverse-transform on hash uniforms (BarabasiAlbert /
  PowerlawDegreeSequence stand-in with closed-form sampling).
- :func:`rmat` — recursive-matrix: each of ``scale`` address bits chooses a
  quadrant by (a, b, c, d); bit choices are per-(edge, bit) hashes.
- :func:`watts_strogatz` — ring lattice + hash-decided rewiring.
- :func:`planted_partition` — k blocks, m_in intra + m_out inter edges
  (ClusteredRandomGraphGenerator analog; the PLP/PLM test substrate).

All return directed (src, dst, weight) with self-loops removed and
duplicates dropped; symmetrize() for undirected use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hash of the given columns."""
    return (F.abs(F.xxhash64(*cols)) % F.lit(1_000_000_007)) / 1_000_000_007.0


def _finish(edges: DataFrame) -> DataFrame:
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


def gnm(spark: SparkSession, n: int, m: int, seed: int = 42) -> DataFrame:
    """Erdos-Renyi G(n, m) (ErdosRenyiGenerator analog)."""
    df = spark.range(m)
    return _finish(
        df.select(
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(0))) % n).alias("src"),
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(1))) % n).alias("dst"),
        )
    )


def powerlaw_digraph(
    spark: SparkSession, n: int, m: int, gamma: float = 2.5, seed: int = 42
) -> DataFrame:
    """Chung-Lu-ish: node popularity ~ rank^(-1/(gamma-1)); endpoint =
    floor(n * u^(1/(1-gamma)+1))... implemented as the standard Zipf inverse
    transform ``node = floor(n * u^(gamma-1))`` applied to the *rank* scale
    so small ids are hubs (matches the hub-skew shape of web graphs)."""
    df = spark.range(m)
    # src: uniform (every page links out); dst: 70% uniform + 30% Zipf tail
    # (rank r = u^(-1/(gamma-1)), node r-1, capped) — the web-crawl shape:
    # uniform out-links, power-law in-degree hubs.
    ex = -1.0 / (gamma - 1.0)
    src = (F.abs(F.xxhash64("id", F.lit(seed), F.lit(0))) % n).alias("src")
    u = _u01(F.col("id"), F.lit(seed), F.lit(1))
    zipf = F.least(
        (F.floor(F.pow(F.greatest(u, F.lit(1e-12)), F.lit(ex))) - 1).cast("long"),
        F.lit(n - 1),
    )
    uniform_dst = F.abs(F.xxhash64("id", F.lit(seed), F.lit(2))) % n
    is_hub = _u01(F.col("id"), F.lit(seed), F.lit(3)) < 0.3
    dst = F.when(is_hub, zipf).otherwise(uniform_dst).alias("dst")
    return _finish(df.select(src, dst))


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> DataFrame:
    """RMAT (RmatGenerator analog): n = 2^scale, m = n * edge_factor; per
    edge, each address bit picks a quadrant from (a, b, c, d)."""
    n = 1 << scale
    m = n * edge_factor
    df = spark.range(m)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for bit in range(scale):
        u = _u01(F.col("id"), F.lit(seed), F.lit(bit))
        src_bit = (u >= a + b).cast("long")  # quadrants c, d set the src bit
        dst_bit = ((u >= a) & (u < a + b) | (u >= a + b + c)).cast("long")
        src = src + F.shiftleft(src_bit, bit)
        dst = dst + F.shiftleft(dst_bit, bit)
    return _finish(df.select(src.alias("src"), dst.alias("dst")))


def watts_strogatz(
    spark: SparkSession, n: int, k: int = 4, beta: float = 0.1, seed: int = 42
) -> DataFrame:
    """Ring lattice (each node to k/2 clockwise neighbors) + rewiring with
    probability beta (WattsStrogatzGenerator analog). Directed rows; the
    undirected graph is symmetrize() of this."""
    half = max(1, k // 2)
    df = spark.range(n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(half))).alias("off"),
    )
    ring_dst = (F.col("src") + F.col("off")) % n
    rewire = _u01(F.col("src"), F.col("off"), F.lit(seed)) < beta
    rnd_dst = F.abs(F.xxhash64("src", "off", F.lit(seed), F.lit(1))) % n
    return _finish(
        df.select("src", F.when(rewire, rnd_dst).otherwise(ring_dst).alias("dst"))
    )


def planted_partition(
    spark: SparkSession,
    blocks: int,
    block_size: int,
    m_in: int,
    m_out: int,
    seed: int = 42,
) -> DataFrame:
    """k blocks of ``block_size``; ``m_in`` intra-block edges per block +
    ``m_out`` inter-block edges total (ClusteredRandomGraphGenerator shape).
    Ground-truth community of node v = v // block_size."""
    n = blocks * block_size
    intra = spark.range(blocks * m_in).select(
        (F.col("id") % blocks).alias("b"), F.col("id").alias("i")
    ).select(
        (F.col("b") * block_size + F.abs(F.xxhash64("i", F.lit(seed), F.lit(0))) % block_size).alias("src"),
        (F.col("b") * block_size + F.abs(F.xxhash64("i", F.lit(seed), F.lit(1))) % block_size).alias("dst"),
    )
    inter = spark.range(m_out).select(
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(2))) % n).alias("src"),
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(3))) % n).alias("dst"),
    )
    return _finish(intra.union(inter))
