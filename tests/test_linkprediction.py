import math

from networkit_spark.graph import edges_df, symmetrize
from networkit_spark.operators.linkprediction import (
    link_prediction_scores,
    missing_links,
    random_link_sample,
    wedge_pairs,
)

# square 0-1-2-3-0 plus diagonal 0-2: N(1)={0,2}, N(3)={0,2}
SQ_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]


def smap(df):
    return {(r["u"], r["v"]): r for r in df.collect()}


def test_common_neighbors_and_jaccard(spark):
    e = symmetrize(edges_df(spark, SQ_EDGES))
    s = smap(link_prediction_scores(e))
    r13 = s[(1, 3)]
    assert r13["cn"] == 2  # shares 0 and 2
    assert abs(r13["jaccard"] - 1.0) < 1e-12  # N(1)==N(3)
    assert r13["pa"] == 4
    assert r13["total_neighbors"] == 2


def test_adamic_adar_formula(spark):
    e = symmetrize(edges_df(spark, SQ_EDGES))
    s = smap(link_prediction_scores(e))
    # middles 0 and 2 both have degree 3
    expect = 2.0 / math.log(3)
    assert abs(s[(1, 3)]["aa"] - expect) < 1e-12
    assert abs(s[(1, 3)]["ra"] - 2.0 / 3.0) < 1e-12


def test_missing_links_excludes_existing(spark):
    e = symmetrize(edges_df(spark, SQ_EDGES))
    scores = link_prediction_scores(e)
    ml = smap(missing_links(e, scores))
    assert (1, 3) in ml  # the only non-edge wedge pair
    assert (0, 2) not in ml  # existing edge excluded


def test_pairs_argument(spark):
    e = symmetrize(edges_df(spark, SQ_EDGES))
    pairs = spark.createDataFrame([(1, 3), (0, 3)], "u long, v long")
    s = smap(link_prediction_scores(e, pairs=pairs))
    assert set(s) == {(1, 3), (0, 3)}
    assert s[(0, 3)]["cn"] == 1  # via node 2


def test_random_link_sample_split(spark):
    e = symmetrize(edges_df(spark, SQ_EDGES))
    train, held = random_link_sample(e, fraction=0.4, seed=7)
    n_held = held.count()
    assert train.count() / 2 + n_held == 5
    # symmetrized train
    assert train.count() % 2 == 0


def test_max_middle_degree_guard(spark):
    # star center is the only middle; filtering it removes all wedge pairs
    e = symmetrize(edges_df(spark, [(0, 1), (0, 2), (0, 3)]))
    assert wedge_pairs(e).count() == 3
    assert wedge_pairs(e, max_middle_degree=2).count() == 0
