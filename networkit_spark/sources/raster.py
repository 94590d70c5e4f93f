"""RasterReader — ESRI ASCII grid -> 2D point cloud.

Reference: ``cpp/io/RasterReader.cpp``: 6-line header (ncols, nrows, then
four ignored lines), then ``nrows`` rows of ``ncols`` cell values; each
cell spawns ``round(value * normalizationFactor)`` points uniformly inside
its unit cell rectangle (the reference keeps xdelta = ydelta = 1.0, so
cell (row, col) spans [col, col+1] x [-row, 1-row] — quirk preserved).

Distributed shape: the 6 header lines are parsed on the driver; the data
rows stream through Spark (one row per grid line, posexplode over the
columns, one sequence-explode per point) with hash-deterministic in-cell
coordinates instead of the reference's sequential ``Aux::Random::real``
(documented divergence — any partitioning reproduces the same cloud).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_raster(
    spark: SparkSession,
    path: str,
    normalization_factor: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """-> (x double, y double) one row per generated point."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long").persist()
    head = {r["lineno"]: r["line"] for r in df.filter(F.col("lineno") < 6).collect()}
    ncols = int(float(head[0][14:].strip().split()[0]))
    nrows = int(float(head[1][14:].strip().split()[0]))
    data = df.filter((F.col("lineno") >= 6) & (F.col("lineno") < 6 + nrows)).select(
        (F.col("lineno") - 6).alias("row"),
        F.posexplode(
            F.slice(F.split(F.trim("line"), r"\s+"), 1, ncols)
        ).alias("col", "val"),
    ).select(
        "row", "col",
        F.round(F.col("val").cast("double") * normalization_factor).cast("long").alias("k"),
    ).filter(F.col("k") > 0)

    from networkit_spark.operators.sampling import _draw

    pts = data.select(
        "row", "col",
        F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("i"),
    )
    u = (_draw("raster_x", seed, F.col("row"), F.col("col"), F.col("i")) % F.lit(1 << 52)) / float(1 << 52)
    v = (_draw("raster_y", seed, F.col("row"), F.col("col"), F.col("i")) % F.lit(1 << 52)) / float(1 << 52)
    out = pts.select(
        (F.col("col") + u).alias("x"),
        (F.lit(1.0) - F.col("row") - 1 + v).alias("y"),
    )
    df.unpersist()
    return out
