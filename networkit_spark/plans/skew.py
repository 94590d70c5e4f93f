"""Skew handling: explicit hot-key salting for joins on power-law keys.

Web graphs have power-law degree distributions; joining edges to a per-node
table on ``src`` sends each node's entire adjacency to one task — a
10^6-out-degree hub becomes one straggler task (the reference handles the
same skew with guided-schedule OpenMP loops, ``Graph.hpp:1875-1883``).

:func:`salted_join` is the standard two-path cure, made explicit and
reusable:

1. hot keys = keys whose row count in the big table exceeds
   ``hot_threshold`` (one agg over the big side, computed once per input);
2. hot path: big rows get ``salt = hash(payload) % n_salt``; the small side
   is replicated ``n_salt``x for hot keys only; join on (key, salt) spreads
   each hub over ``n_salt`` tasks;
3. cold path: plain join; union of both paths.

AQE's runtime skew-join splitting covers sort-merge joins adaptively; this
utility is for iterative kernels that run with AQE off (see
``aqe_disabled``) and for deterministic plan shapes at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(big: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """Keys with more than ``hot_threshold`` rows in ``big`` (one hash agg)."""
    return (
        big.groupBy(key)
        .agg(F.count("*").alias("__cnt"))
        .filter(F.col("__cnt") > hot_threshold)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    hot_threshold: int = 100_000,
    hot: DataFrame | None = None,
    salt_by: str | None = None,
) -> DataFrame:
    """Inner-join ``big`` with ``small`` on ``key``, salting hot keys.

    ``salt_by``: big-side column whose hash spreads a hot key's rows
    (defaults to a per-row random-ish hash of all big columns via
    monotonically varying input — pass an explicit column like ``"dst"``
    for deterministic spreading). Output columns = big's + small's (minus
    the duplicate key), like a plain ``join(small, key)``.
    """
    hot = hot if hot is not None else hot_keys(big, key, hot_threshold)
    big_hot = big.join(hot, key, "left_semi")
    big_cold = big.join(hot, key, "left_anti")
    small_hot = small.join(hot, key, "left_semi")
    small_cold = small.join(hot, key, "left_anti")

    spread = F.col(salt_by) if salt_by else F.monotonically_increasing_id()
    bh = big_hot.withColumn("__salt", F.pmod(F.xxhash64(spread), F.lit(n_salt)))
    sh = small_hot.join(
        big.sparkSession.range(n_salt).select(F.col("id").cast("int").alias("__salt")),
        how="cross",
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    hot_joined = bh.join(sh, [key, "__salt"]).drop("__salt")
    cold_joined = big_cold.join(small_cold, key)
    return hot_joined.unionByName(cold_joined)
