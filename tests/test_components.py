from collections import Counter

from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range
from networkit_spark.operators.components import (
    ComponentsResult,
    ConnectedComponents,
    components_fixed,
    extract_largest_component,
    precontract,
)

from tests.fixtures import CC20_EDGES, CC20_N, CC20_N_COMPONENTS, CC20_SIZES


def labels_map(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_cc20_counts_and_membership(spark):
    """ConnectedComponentsGTest.cpp:32-78 — 5 components, co-membership, sizes."""
    e = edges_df(spark, CC20_EDGES)
    nodes = nodes_range(spark, CC20_N)
    res = ConnectedComponents().run(e, nodes)
    assert res.converged
    assert res.number_of_components() == CC20_N_COMPONENTS
    lab = labels_map(res.get_partition())
    assert lab[0] == lab[19]  # BFS chain 0..19
    assert lab[3] == lab[7]
    assert lab[15] not in [lab[0], lab[3], lab[10], lab[13]]  # isolated
    sizes = sorted(Counter(lab.values()).values())
    assert sizes == CC20_SIZES
    # label normalization: min node id per component
    assert lab[0] == 0 and lab[3] == 3 and lab[10] == 10 and lab[13] == 13 and lab[15] == 15


def test_cc20_without_precontract_matches(spark):
    e = edges_df(spark, CC20_EDGES)
    nodes = nodes_range(spark, CC20_N)
    a = labels_map(ConnectedComponents(use_precontract=True).run(e, nodes).get_partition())
    b = labels_map(ConnectedComponents(use_precontract=False).run(e, nodes).get_partition())
    assert a == b


def test_components_fixed_converges(spark):
    e = edges_df(spark, CC20_EDGES)
    nodes = nodes_range(spark, CC20_N)
    lab = labels_map(components_fixed(e, nodes, iterations=8))
    ref = labels_map(ConnectedComponents().run(e, nodes).get_partition())
    assert lab == ref


def test_precontract_preserves_connectivity(spark):
    e = edges_df(spark, CC20_EDGES).select("src", "dst")
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    contracted = precontract(und.repartition(4))
    # running CC on contracted edges must give the same partition
    nodes = nodes_range(spark, CC20_N)
    ce = contracted.withColumn("weight", F.lit(1.0))
    res = ConnectedComponents(use_precontract=False).run(ce, nodes)
    lab = labels_map(res.get_partition())
    ref = labels_map(ConnectedComponents(use_precontract=False).run(
        edges_df(spark, CC20_EDGES), nodes).get_partition())
    assert lab == ref


def test_extract_largest_component(spark):
    e = edges_df(spark, CC20_EDGES)
    nodes = nodes_range(spark, CC20_N)
    res = ConnectedComponents().run(e, nodes)
    keep, sub = extract_largest_component(e, res.get_partition())
    ids = sorted(r["id"] for r in keep.collect())
    assert ids == [0, 1, 2, 4, 8, 16, 19]
    assert sub.count() == 6  # the 6 chain edges


def test_component_sizes_api(spark):
    e = edges_df(spark, CC20_EDGES)
    nodes = nodes_range(spark, CC20_N)
    res = ConnectedComponents().run(e, nodes)
    sizes = {r["label"]: r["size"] for r in res.component_sizes().collect()}
    assert sorted(sizes.values()) == CC20_SIZES
    compacted = res.compact_labels()
    assert sorted(r["label"] for r in compacted.select("label").distinct().collect()) == [0, 1, 2, 3, 4]
