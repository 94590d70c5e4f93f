"""DynSSSP (DynBFS/DynDijkstra semantics): incremental insertion updates
equal a full recompute."""

from pyspark.sql import functions as F

from networkit_spark.operators.distance import sssp_distances
from networkit_spark.streaming.dyn_sssp import update_sssp_insert


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def _as_dict(df):
    return {r.node: r.dist for r in df.collect()}


def test_insertions_match_full_recompute_weighted(spark):
    base = [
        (0, 1, 4.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 2.0), (3, 4, 3.0),
        (2, 5, 7.0), (5, 6, 1.0),
    ]
    new = [(1, 5, 1.0), (0, 4, 2.5), (4, 6, 0.5)]
    e0 = _wedges(spark, base)
    e1 = _wedges(spark, base + new)
    d0 = sssp_distances(e0, 0)
    got = _as_dict(update_sssp_insert(e1, d0, _wedges(spark, new)))
    want = _as_dict(sssp_distances(e1, 0))
    assert got == want


def test_insertion_reaches_new_component(spark):
    base = [(0, 1, 1.0), (1, 2, 1.0), (7, 8, 1.0), (8, 9, 1.0)]
    new = [(2, 7, 2.0)]
    e1 = _wedges(spark, base + new)
    d0 = sssp_distances(_wedges(spark, base), 0)
    assert 7 not in _as_dict(d0)
    got = _as_dict(update_sssp_insert(e1, d0, _wedges(spark, new)))
    want = _as_dict(sssp_distances(e1, 0))
    assert got == want
    assert got[9] == 6.0


def test_bfs_hop_variant_and_noop_batch(spark):
    base = [(i, i + 1, 1.0) for i in range(6)]
    e0 = _wedges(spark, base)
    d0 = sssp_distances(e0, 0)
    # inserting a uselessly long edge changes nothing
    new = [(0, 5, 99.0)]
    got = _as_dict(update_sssp_insert(_wedges(spark, base + new), d0, _wedges(spark, new)))
    assert got == _as_dict(d0)
    # a shortcut rewrites the tail of the path
    new2 = [(0, 4, 1.0)]
    got2 = _as_dict(
        update_sssp_insert(_wedges(spark, base + new2), d0, _wedges(spark, new2))
    )
    want2 = _as_dict(sssp_distances(_wedges(spark, base + new2), 0))
    assert got2 == want2 and got2[5] == 2.0
