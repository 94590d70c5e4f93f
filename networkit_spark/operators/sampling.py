"""Seeded, engine-portable node / edge sampling.

Reference: ``GraphTools::randomNode/randomNodes/randomEdges``
(``networkit/cpp/graph/GraphTools.cpp``, pyx ``graphtools.pyx``) and the
link-prediction ``RandomLinkSampler`` (``linkprediction.pyx:522``). The
reference draws from a Mersenne generator whose stream depends on iteration
order; that is not reproducible across partitionings, so we use the repo's
portable-draw convention (same recipe as ``operators/mis_coloring.py:47`` and
the ForestFire burn decisions): a 60-bit integer from
``md5(tag|seed|key...)`` — a pure function of the row, byte-identical in
Spark (``conv(substring(md5(k),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(k),1,15))::BIGINT``), so the DuckDB oracle replays the
exact draw.

Scale shape: a single narrow ``filter`` over the scan — no shuffle, no
state, pushdown-friendly; the selectivity estimate is exact in expectation
(md5 is uniform over the 60-bit range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000  # draw resolution: fraction quantized to 1e-6


def _draw(tag: str, seed: int, *cols: Column) -> Column:
    key = F.concat_ws(
        "|", F.lit(tag), F.lit(str(seed)), *[c.cast("string") for c in cols]
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def seeded_edge_sample(edges: DataFrame, fraction: float, seed: int = 42,
                       tag: str = "es") -> DataFrame:
    """Keep each (src, dst) edge iff its portable draw falls under
    ``fraction`` (quantized to 1e-6). Deterministic, partitioning-free."""
    thr = int(round(fraction * _MOD))
    return edges.filter(
        _draw(tag, seed, F.col("src"), F.col("dst")) % _MOD < thr
    )


def seeded_node_sample(nodes: DataFrame, fraction: float, seed: int = 42,
                       node_col: str = "node", tag: str = "ns") -> DataFrame:
    """Same portable draw over a node table."""
    thr = int(round(fraction * _MOD))
    return nodes.filter(_draw(tag, seed, F.col(node_col)) % _MOD < thr)


def draw_sql(tag: str, seed: int, *exprs: str) -> str:
    """DuckDB twin of ``_draw`` for oracle SQL construction."""
    parts = ", ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return (
        f"('0x' || substr(md5(concat_ws('|', '{tag}', '{seed}', {parts})), 1, 15))"
        f"::BIGINT"
    )
