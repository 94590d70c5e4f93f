"""Distributed dense-id assignment (plans/ids.py).

Round-1 verdict top item: the single-partition ``Window.orderBy`` encoder had
to become a range-partitioned sort + per-partition offsets. These tests prove
(a) ids equal the global ascending-key rank, (b) the work is genuinely
multi-partition on a large input, (c) duplicate keys / ties behave.
"""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.plans.ids import dense_ids, global_min_rank


def test_dense_ids_small_matches_rank(spark):
    keys = spark.createDataFrame(
        [("b",), ("a",), ("d",), ("c",), ("a",)], "k string"
    )
    out = {r["k"]: r["id"] for r in dense_ids(keys, "k").collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_dense_ids_million_keys_multi_partition(spark):
    # 1M zero-padded string keys in hash-scrambled input order; lexicographic
    # rank == numeric value, so correctness is closed-form checkable.
    n = 1_000_000
    df = (
        spark.range(n)
        .repartition(16, F.col("id"))  # scrambled multi-partition input
        .select(F.format_string("%09d", F.col("id")).alias("k"))
    )
    out = dense_ids(df, "k", num_partitions=16)
    # id must equal int(k) for every row: count mismatches distributed-side
    bad = out.filter(F.col("id") != F.col("k").cast("long")).count()
    assert bad == 0
    assert out.count() == n
    # the assignment ran over >1 range partition (no single-task funnel)
    parts = (
        out.withColumn("p", F.spark_partition_id()).select("p").distinct().count()
    )
    assert parts > 1


def test_global_min_rank_ties(spark):
    rows = spark.createDataFrame(
        [(1.0,), (2.0,), (2.0,), (3.0,), (0.5,)], "score double"
    )
    got = {
        (r["score"], r["rank"])
        for r in global_min_rank(rows, "score").collect()
    }
    # rank semantics: ties share the min rank, next rank skips
    assert got == {(0.5, 1), (1.0, 2), (2.0, 3), (2.0, 3), (3.0, 5)}


def test_linearize_scores_percent_rank(spark):
    from networkit_spark.operators.sparsification import linearize_scores

    scores = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 20.0), (1, 2, 20.0), (2, 3, 40.0), (3, 4, 5.0)],
        "src long, dst long, score double",
    )
    got = {
        (r["src"], r["dst"]): r["score"] for r in linearize_scores(scores).collect()
    }
    # percent_rank = (rank-1)/(m-1), m=5
    expected = {
        (3, 4): 0.0,
        (0, 1): 0.25,
        (0, 2): 0.5,
        (1, 2): 0.5,
        (2, 3): 1.0,
    }
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)


def test_cc_vectorized_batch_kernel():
    from networkit_spark.operators.components import _cc_vectorized

    rng = np.random.RandomState(7)
    # three planted components over sparse global ids
    comp_nodes = [np.arange(0, 50) * 3, np.arange(100, 130) * 7, np.array([9999, 12345])]
    us, vs = [], []
    for nodes in comp_nodes:
        perm = rng.permutation(nodes)
        us.append(perm[:-1])
        vs.append(perm[1:])  # a path connects the component
    u = np.concatenate(us)
    v = np.concatenate(vs)
    ids, roots = _cc_vectorized(u, v)
    for nodes in comp_nodes:
        mask = np.isin(ids, nodes)
        got = np.unique(roots[mask])
        assert len(got) == 1 and got[0] == nodes.min()


def test_append_and_merge_graphs(spark):
    from networkit_spark.graph import append_graph, edges_df, merge_graphs, nodes_range

    ea = edges_df(spark, [(0, 1), (1, 2)], weighted=False)
    eb = edges_df(spark, [(0, 1)], weighted=False)
    na, nb = nodes_range(spark, 3), nodes_range(spark, 2)
    e, n = append_graph(ea, na, eb, nb)
    assert sorted((r.src, r.dst) for r in e.collect()) == [(0, 1), (1, 2), (3, 4)]
    assert sorted(r.id for r in n.collect()) == [0, 1, 2, 3, 4]

    # merge: shared id space, A's rows win on conflict
    from pyspark.sql import functions as F

    ea2 = ea.withColumn("weight", F.lit(2.0))
    eb2 = edges_df(spark, [(0, 1), (2, 0)], weighted=False).withColumn(
        "weight", F.lit(9.0)
    )
    em, nm = merge_graphs(ea2, na, eb2, nodes_range(spark, 3))
    rows = {(r.src, r.dst): r.weight for r in em.collect()}
    assert rows == {(0, 1): 2.0, (1, 2): 2.0, (2, 0): 9.0}
    assert nm.count() == 3
