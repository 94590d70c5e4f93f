"""ML glue (linkprediction.pyx:985-1060): getLabels / getFeatures /
trainClassifier / prediction via pyspark.ml."""
import itertools

from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.linkprediction import (
    get_features,
    get_labels,
    predict_links,
    train_link_classifier,
)


def two_cliques(spark, k=6):
    """Two k-cliques joined by one bridge, with one intra-clique edge
    removed from each clique (the positive 'missing links')."""
    a = list(itertools.combinations(range(k), 2))
    b = list(itertools.combinations(range(k, 2 * k), 2))
    removed = [(0, 1), (k, k + 1)]
    edges = [e for e in a + b if e not in removed] + [(k - 1, k)]
    return symmetrize(edges_df(spark, edges)), removed


def test_get_labels(spark):
    g, _ = two_cliques(spark)
    pairs = spark.createDataFrame([(0, 2), (0, 1), (3, 9)], "u long, v long")
    got = {(r["u"], r["v"]): r["label"] for r in get_labels(pairs, g).collect()}
    assert got == {(0, 2): 1, (0, 1): 0, (3, 9): 0}


def test_get_features_shape(spark):
    g, _ = two_cliques(spark)
    pairs = spark.createDataFrame([(0, 1), (0, 11)], "u long, v long")
    f = get_features(pairs, g)
    assert f.columns == ["u", "v", "cn", "jaccard", "aa", "ra", "pa", "total_neighbors"]
    rows = {(r["u"], r["v"]): r for r in f.collect()}
    # intra-clique pair shares k-2=4 neighbors; cross pair shares none
    assert rows[(0, 1)]["cn"] == 4
    assert rows[(0, 11)]["cn"] == 0


def test_train_and_predict_separates_cliques(spark):
    g, removed = two_cliques(spark)
    nodes = range(12)
    all_pairs = [
        (u, v) for u, v in itertools.combinations(nodes, 2)
    ]
    pairs = spark.createDataFrame(all_pairs, "u long, v long")
    model = train_link_classifier(pairs, g)
    preds = predict_links(model, pairs, g)
    s = {(r["u"], r["v"]): r["score"] for r in preds.collect()}
    # the held-out intra-clique pairs must outscore every cross-clique pair
    cross = [s[(u, v)] for u, v in all_pairs if u < 6 <= v and (u, v) != (5, 6)]
    for u, v in removed:
        assert s[(u, v)] > max(cross)
    # and probability is a proper score in [0, 1]
    assert all(0.0 <= x <= 1.0 for x in s.values())
