"""Chart-series data producers behind the reference's plot module.

Reference: ``networkit/plot.py`` — each function there renders a
matplotlib/seaborn figure from a small aggregate it first computes
node-by-node on the driver (``degreeDistribution`` plot.py:88-116,
``connectedComponentsSizes`` :118-155, ``coreDecompositionSequence``
:156-185, ``clusteringPerDegree`` :187-207, ``hopPlot`` :209+ — the last
is already the ``hop_distribution`` gate query). This module computes the
same series as distributed aggregates and returns them as DataFrames; the
rendering itself is presentation layer and stays out of scope (SURVEY §2).

Every series is a groupBy over an existing kernel output, so the heavy
lifting (degrees, components, coreness, LCC) reuses the scale-shaped
operators; the series themselves are bounded by max-degree / #components /
max-core — chart-sized outputs even at 10^12 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _degrees(und_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, degree) undirected degree, 0 for isolated nodes. ``nodes``
    may carry its id column as either ``node`` or ``id``."""
    col = "node" if "node" in nodes.columns else "id"
    nodes = nodes.select(F.col(col).alias("node"))
    d = und_edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    )
    return nodes.join(d, "node", "left").select(
        "node", F.coalesce("degree", F.lit(0)).alias("degree")
    )


def degree_distribution(und_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(degree, num_nodes) for degree = 0..maxDegree, zero-filled — the
    exact bar series ``plot.degreeDistribution`` builds (``dd[0 ..
    graphtools.maxDegree(G)]``, plot.py:103-107)."""
    deg = _degrees(und_edges, nodes)
    hist = deg.groupBy("degree").agg(F.count("*").alias("c"))
    maxd = deg.agg(F.max("degree")).collect()[0][0]
    maxd = int(maxd) if maxd is not None else 0
    spark = und_edges.sparkSession
    grid = spark.range(maxd + 1).select(F.col("id").alias("degree"))
    return grid.join(hist, "degree", "left").select(
        "degree", F.coalesce("c", F.lit(0)).cast("long").alias("num_nodes")
    )


def component_size_distribution(labels: DataFrame) -> DataFrame:
    """(rnk, size) component sizes descending — the pie series of
    ``plot.connectedComponentsSizes`` (``sorted(csizes.values(),
    reverse=True)``, plot.py:137-138). ``labels``: (node, label).

    The rank window runs over one row per component; tie order among
    equal sizes is label-ascending (the (rnk, size) multiset is
    tie-invariant either way). At extreme component counts (10^9
    singletons) take the top-k sizes first — a pie chart beyond that is
    unreadable anyway."""
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    w = Window.orderBy(F.desc("size"), F.asc("label"))
    return sizes.select(
        F.row_number().over(w).cast("long").alias("rnk"),
        F.col("size").cast("long").alias("size"),
    )


def core_decomposition_sequence(coreness_df: DataFrame) -> DataFrame:
    """(core, size) k-shell sizes — the bar series of
    ``plot.coreDecompositionSequence`` (``CoreDecomposition...
    getPartition().subsetSizes()``, plot.py:171). ``coreness_df``:
    (node, core) from ``operators.kcore.coreness``."""
    return coreness_df.groupBy("core").agg(
        F.count("*").cast("long").alias("size")
    )


def clustering_per_degree(und_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(deg, mean_lcc) mean local clustering coefficient per degree — the
    regression-plot series of ``plot.clusteringPerDegree``
    (``DataFrame({deg, cc}).groupby("deg").mean()``, plot.py:200-205;
    degrees from DegreeCentrality, cc from LocalClusteringCoefficient)."""
    from networkit_spark.operators.triangles import local_clustering_coefficient

    lcc = local_clustering_coefficient(und_edges, nodes)
    deg = _degrees(und_edges, nodes)
    return (
        deg.join(lcc, "node")
        .groupBy(F.col("degree").alias("deg"))
        .agg(F.round(F.avg("lcc"), 7).alias("mean_lcc"))
    )
