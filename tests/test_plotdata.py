"""plot.py chart-series producers (networkit_spark/plotdata.py) vs
hand-computed series on a fixed graph: path 0-1-2 + triangle 3-4-5 +
isolated node 6."""

from pyspark.sql import functions as F

from networkit_spark.graph import nodes_range
from networkit_spark.plotdata import (
    clustering_per_degree,
    component_size_distribution,
    core_decomposition_sequence,
    degree_distribution,
)


def _uedges(spark):
    e = [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)]
    sym = e + [(b, a) for a, b in e]
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in sym], "src long, dst long, weight double"
    )


def test_degree_distribution(spark):
    out = degree_distribution(_uedges(spark), nodes_range(spark, 7))
    got = {r.degree: r.num_nodes for r in out.collect()}
    # node 6 deg 0; nodes 0,2 deg 1; nodes 1,3,4,5 deg 2 — zero-filled grid
    assert got == {0: 1, 1: 2, 2: 4}


def test_component_size_distribution(spark):
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3), (6, 6)],
        "node long, label long",
    )
    out = sorted((r.rnk, r.size) for r in
                 component_size_distribution(labels).collect())
    assert out == [(1, 3), (2, 3), (3, 1)]


def test_core_decomposition_sequence(spark):
    core = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 2), (4, 2), (5, 2), (6, 0)],
        "node long, core long",
    )
    out = {r.core: r.size for r in
           core_decomposition_sequence(core).collect()}
    assert out == {0: 1, 1: 3, 2: 3}


def test_clustering_per_degree(spark):
    out = {r.deg: r.mean_lcc for r in
           clustering_per_degree(_uedges(spark),
                                 nodes_range(spark, 7)).collect()}
    # deg 0: node 6 lcc 0; deg 1: nodes 0,2 lcc 0;
    # deg 2: node 1 (path center) lcc 0, nodes 3,4,5 lcc 1 -> mean 0.75
    assert out == {0: 0.0, 1: 0.0, 2: 0.75}
