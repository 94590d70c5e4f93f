"""Degree assortativity (Pearson correlation of endpoint degrees).

Reference: ``cpp/correlation/Assortativity.cpp`` — r = Pearson correlation
over edges of (deg(u), deg(v)); also supports an arbitrary node attribute
instead of degree. One degree agg + two joins + ``corr`` — fully built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_assortativity(und_edges: DataFrame) -> float:
    """Over the symmetrized edge table (each undirected edge twice — the
    standard convention, making the correlation symmetric)."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e = (
        und_edges.join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
    )
    r = e.agg(F.corr("ds", "dd")).first()[0]
    return float(r) if r is not None else 0.0


def attribute_assortativity(und_edges: DataFrame, values: DataFrame) -> float:
    """values(node, value) — numeric attribute assortativity
    (Assortativity.cpp attribute mode)."""
    e = (
        und_edges.join(
            values.select(F.col("node").alias("src"), F.col("value").alias("vs")), "src"
        ).join(
            values.select(F.col("node").alias("dst"), F.col("value").alias("vd")), "dst"
        )
    )
    r = e.agg(F.corr("vs", "vd")).first()[0]
    return float(r) if r is not None else 0.0
