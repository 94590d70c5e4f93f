from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.overview import overview

from tests.fixtures import CC20_EDGES, CC20_N


def test_overview_cc20(spark):
    e = symmetrize(edges_df(spark, CC20_EDGES))
    ov = overview(e, nodes_range(spark, CC20_N))
    assert ov["nodes"] == 20
    assert ov["edges"] == len(CC20_EDGES)
    assert ov["connected_components"] == 5
    assert ov["largest_component_size"] == 7
    assert ov["isolated_nodes"] == 1
    assert ov["max_degree"] == 3  # node 10 has neighbors 11, 18, 12
    assert 0 <= ov["global_clustering_coefficient"] <= 1
