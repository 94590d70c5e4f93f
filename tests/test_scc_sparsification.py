from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.correlation import (
    attribute_assortativity,
    degree_assortativity,
)
from networkit_spark.operators.scc import strongly_connected_components
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    jaccard_edge_score,
    linearize_scores,
    local_degree_score,
    local_filter_sparsify,
    normalize_scores,
    random_edge_score,
)


def labels_map(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_scc_two_cycles_and_bridge(spark):
    # cycle 0-1-2, cycle 3-4, bridge 2->3, tail 5 (trivial)
    e = edges_df(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)])
    lab = labels_map(strongly_connected_components(e, nodes_range(spark, 6)))
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[3] == lab[4] == 3
    assert lab[5] == 5


def test_scc_dag_all_singletons(spark):
    e = edges_df(spark, [(0, 1), (1, 2), (0, 2)])
    lab = labels_map(strongly_connected_components(e, nodes_range(spark, 3)))
    assert lab == {0: 0, 1: 1, 2: 2}


def test_scc_one_big_cycle(spark):
    n = 8
    e = edges_df(spark, [(i, (i + 1) % n) for i in range(n)])
    lab = labels_map(strongly_connected_components(e, nodes_range(spark, n)))
    assert set(lab.values()) == {0}


def test_degree_assortativity_star_negative(spark):
    # star: hub (high deg) always paired with leaves (deg 1) -> strongly negative
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 8)]))
    r = degree_assortativity(e)
    assert r < -0.9


def test_attribute_assortativity_perfect(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (2, 3)]))
    vals = spark.createDataFrame([(0, 1.0), (1, 1.1), (2, 5.0), (3, 5.2)], "node long, value double")
    r = attribute_assortativity(e, vals)
    assert r > 0.99


def test_random_edge_score_deterministic(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    a = {(r["src"], r["dst"]): r["score"] for r in random_edge_score(e).collect()}
    b = {(r["src"], r["dst"]): r["score"] for r in random_edge_score(e).collect()}
    assert a == b
    assert all(0 <= v < 1 for v in a.values())


def test_local_degree_score_range_and_hub_preference(spark):
    # hub 0 with leaves; leaf's single edge to hub scores 1.0
    e = symmetrize(edges_df(spark, [(0, 1), (0, 2), (0, 3), (1, 2)]))
    s = {(r["src"], r["dst"]): r["score"] for r in local_degree_score(e).collect()}
    assert all(0.0 <= v <= 1.0 for v in s.values())
    assert s[(0, 3)] == 1.0  # 3's only (top-ranked) neighbor is the hub


def test_threshold_filter_and_normalize(spark):
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 3)]))
    scores = random_edge_score(e)
    norm = normalize_scores(scores)
    row = norm.agg(F.min("score"), F.max("score")).first()
    assert row[0] == 0.0 and row[1] == 1.0
    lin = linearize_scores(scores)
    assert lin.filter("score = 0").count() == 1
    kept = global_threshold_filter(e, norm, 0.5)
    assert kept.count() % 2 == 0  # symmetrized output
    assert kept.count() <= e.count()


def test_jaccard_edge_score(spark):
    # triangle: each edge's endpoints share exactly 1 of 3 total neighbors
    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (0, 2)]))
    s = {(r["src"], r["dst"]): r["score"] for r in jaccard_edge_score(e).collect()}
    assert all(abs(v - 1 / 3) < 1e-12 for v in s.values())


def test_local_filter_sparsify_keeps_connectivity_shape(spark):
    e = symmetrize(edges_df(spark, [(0, i) for i in range(1, 10)]))
    out = local_filter_sparsify(e, alpha=0.5)
    # hub deg 9 -> keeps ceil(9^0.5)=3 edges; each leaf keeps its only edge
    # edge survives if either side keeps it -> all 9 edges survive via leaves
    assert out.count() == 18
    out2 = local_filter_sparsify(symmetrize(edges_df(
        spark, [(a, b) for a in range(6) for b in range(a + 1, 6)])), alpha=0.5)
    # K6: deg 5 -> ceil(sqrt 5)=3 kept per node -> strictly fewer edges
    assert out2.count() < 30
