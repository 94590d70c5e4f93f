"""stats.py vs the reference's literal sequential forms
(stats.pyx:16 gini, centrality.pyx:2691 rankPerNode,
centrality.pyx:2720 relativeRankErrors)."""
import random

from networkit_spark.stats import gini, rank_per_node, relative_rank_errors


def ref_gini(values):
    # stats.pyx:16 verbatim logic
    sorted_list = sorted(values)
    height, area = 0, 0
    for value in sorted_list:
        height += value
        area += height - value / 2.0
    fair_area = height * len(values) / 2
    return (fair_area - area) / fair_area


def ref_rank_per_node(ranking):
    # centrality.pyx:2691 verbatim logic (ranking sorted by score desc)
    n = len(ranking)
    ranking_id = [0] * n
    for index, pair in enumerate(ranking):
        ranking_id[pair[0]] = index
    for index, pair in enumerate(ranking):
        if index == 0:
            continue
        if pair[1] == ranking[index - 1][1]:
            prev_node = ranking[index - 1][0]
            ranking_id[pair[0]] = ranking_id[prev_node]
    return ranking_id


def test_gini_matches_reference_formula(spark):
    rng = random.Random(7)
    vals = [float(rng.randint(0, 30)) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    assert abs(gini(df, "x") - ref_gini(vals)) < 1e-12


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame([(3.0,)] * 50, "x double")
    assert abs(gini(df, "x")) < 1e-12


def test_gini_empty_and_zero_sum(spark):
    empty = spark.createDataFrame([], "x double")
    assert gini(empty, "x") == 0.0
    zeros = spark.createDataFrame([(0.0,)] * 5, "x double")
    assert gini(zeros, "x") == 0.0


def test_rank_per_node_ties(spark):
    rng = random.Random(3)
    scores = [(n, float(rng.randint(0, 5))) for n in range(40)]
    # reference input: list ordered by score desc (ties: node asc, any
    # stable order gives the same min-rank assignment)
    ordered = sorted(scores, key=lambda p: (-p[1], p[0]))
    expected = ref_rank_per_node(ordered)
    df = spark.createDataFrame(scores, "node long, score double")
    got = {r["node"]: r["rank"] for r in rank_per_node(df).collect()}
    assert got == {n: expected[n] for n in range(40)}


def test_relative_rank_errors(spark):
    rx = [(0, 9.0), (1, 5.0), (2, 5.0), (3, 1.0)]
    ry = [(0, 1.0), (1, 2.0), (2, 8.0), (3, 4.0)]
    dx = spark.createDataFrame(rx, "node long, score double")
    dy = spark.createDataFrame(ry, "node long, score double")
    got = {r["node"]: r["error"] for r in relative_rank_errors(dx, dy).collect()}
    # rank_x: 0:0 1:1 2:1 3:3 ; rank_y: 0:3 1:2 2:0 3:1
    assert got == {0: 1 / 4, 1: 2 / 3, 2: 2 / 1, 3: 4 / 2}


def test_relative_rank_errors_mismatch_empty(spark):
    dx = spark.createDataFrame([(0, 1.0)], "node long, score double")
    dy = spark.createDataFrame([(0, 1.0), (1, 2.0)], "node long, score double")
    assert relative_rank_errors(dx, dy).count() == 0


def test_rank_attribute(spark):
    # sparsification.pyx docstring example: [0.1, 0.05, 0.9, 0.2] -> [1,0,3,2]
    df = spark.createDataFrame(
        [(0, 0.1), (1, 0.05), (2, 0.9), (3, 0.2)], "id long, v double"
    )
    from networkit_spark.stats import rank_attribute

    got = {r["id"]: r["rank"] for r in rank_attribute(df, "id", "v").collect()}
    assert got == {0: 1, 1: 0, 2: 3, 3: 2}
    rev = {r["id"]: r["rank"] for r in rank_attribute(df, "id", "v", reverse=True).collect()}
    assert rev == {0: 2, 1: 3, 2: 0, 3: 1}


def test_random_dense_ids_permutation(spark):
    from networkit_spark.plans.ids import random_dense_ids

    nodes = spark.createDataFrame([(n,) for n in range(50)], "node long")
    a = random_dense_ids(nodes, "node", seed=5)
    rows = {r["node"]: r["id"] for r in a.collect()}
    assert sorted(rows.values()) == list(range(50))      # bijection onto [0, n)
    b = {r["node"]: r["id"] for r in random_dense_ids(nodes, "node", seed=5).collect()}
    assert rows == b                                     # deterministic
    c = {r["node"]: r["id"] for r in random_dense_ids(nodes, "node", seed=6).collect()}
    assert rows != c                                     # seed changes the permutation
    assert rows != {n: n for n in range(50)}             # actually shuffled


def test_fractional_ranks_reference_semantics(spark):
    """helpers.pyx:19 ranked(): average-tie 1-based ranks."""
    from networkit_spark.stats import fractional_ranks

    df = spark.createDataFrame(
        [(0, 5.0), (1, 3.0), (2, 5.0), (3, 1.0), (4, 5.0)], ["id", "v"]
    )
    got = dict(
        (r.id, r.frank) for r in fractional_ranks(df, "id", "v").collect()
    )
    # sorted: 1(r1), 3(r2), 5,5,5 (r3..5 -> avg 4.0)
    assert got == {3: 1.0, 1: 2.0, 0: 4.0, 2: 4.0, 4: 4.0}
