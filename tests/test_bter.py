"""BTER generator: block-rule layout unit tests, generated-graph
invariants (simple, deterministic, degree mass in range), planted
community structure (clustering far above a same-degree Chung-Lu), and the
fit -> replicate loop."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.bter import (
    _block_rules,
    bter_fit,
    bter_generate,
    bter_replicate,
)


def test_block_rules_layout():
    # 10 degree-2 nodes -> 3 full blocks of size 3 + 1 trailing fill
    rules = _block_rules([(2, 10, 0.5)])
    assert rules[0] == {
        "lo": 0, "hi": 9, "kind": "run", "base": 0, "d": 2, "s": 3,
        "rho": pytest.approx(0.5 ** (1 / 3)),
    }
    assert rules[1]["kind"] == "fill" and rules[1]["lo"] == 9 and rules[1]["hi"] == 10
    assert rules[1]["block"] == 3
    # spill across classes: 2 degree-2 nodes then 4 degree-3 nodes:
    # block 0 (size 3) takes both degree-2 nodes + one degree-3 node,
    # then 3 degree-3 nodes leave no complete size-4 block -> fill block 1
    rules = _block_rules([(2, 2, 0.0), (3, 4, 0.8)])
    kinds = [(r["kind"], r["lo"], r["hi"]) for r in rules]
    assert kinds[0] == ("fill", 0, 2)
    assert kinds[1] == ("fill", 2, 3)  # degree-3 node completing block 0
    assert rules[1]["block"] == rules[0]["block"] == 0
    assert rules[1]["d"] == 2  # leader degree stays the origin class
    assert kinds[2] == ("fill", 3, 6)
    assert rules[2]["block"] == 1 and rules[2]["d"] == 3


def _nd(spark, pairs):
    return spark.createDataFrame(pairs, "degree long, cnt long")


def _ccd(spark, pairs):
    return spark.createDataFrame(pairs, "degree long, cc double")


def test_bter_invariants_and_determinism(spark):
    nd = _nd(spark, [(1, 20), (4, 40), (10, 11)])
    ccd = _ccd(spark, [(4, 0.5), (10, 0.3)])
    g = bter_generate(spark, nd, ccd, seed=3)
    rows = [(r["src"], r["dst"]) for r in g.collect()]
    # simple + symmetric
    assert all(u != v for u, v in rows)
    assert set(rows) == {(v, u) for u, v in rows}
    canon = {(u, v) for u, v in rows if u < v}
    assert len(rows) == 2 * len(canon)
    # node universe respected
    assert all(0 <= u < 71 and 0 <= v < 71 for u, v in rows)
    # total degree mass within a factor of the target (erased duplicates +
    # rho excess clipping shave some)
    target = 20 * 1 + 40 * 4 + 11 * 10
    assert 0.4 * target < len(rows) < 1.6 * target
    rows2 = [(r["src"], r["dst"]) for r in bter_generate(spark, nd, ccd, seed=3).collect()]
    assert sorted(rows) == sorted(rows2)


def test_bter_plants_clustering_vs_chung_lu(spark):
    from networkit_spark.operators.triangles import global_clustering_coefficient
    from networkit_spark.sources.generators import chung_lu

    nd = _nd(spark, [(6, 70)])
    ccd = _ccd(spark, [(6, 0.6)])
    g = bter_generate(spark, nd, ccd, seed=7)
    cc_bter = global_clustering_coefficient(g)
    cl = chung_lu(
        spark.range(70).select(F.col("id").alias("node"), F.lit(6.0).alias("w")),
        seed=7,
    )
    cc_cl = global_clustering_coefficient(cl)
    assert cc_bter > max(2 * cc_cl, 0.15)


def test_bter_fit_and_replicate(spark):
    # two 6-cliques + a sparse bridge: fit must see degree-5 nodes with
    # high clustering, and the replica must reproduce strong clustering
    triples = []
    for base in (0, 6):
        triples += [(base + a, base + b) for a in range(6) for b in range(a + 1, 6)]
    triples.append((0, 6))
    und = spark.createDataFrame(
        [(a, b, 1.0) for a, b in triples] + [(b, a, 1.0) for a, b in triples],
        "src long, dst long, weight double",
    )
    nd, ccd = bter_fit(und)
    nd_map = {r["degree"]: r["cnt"] for r in nd.collect()}
    assert nd_map[5] == 10 and nd_map[6] == 2
    cc5 = {r["degree"]: r["cc"] for r in ccd.collect()}[5]
    assert cc5 > 0.8
    from networkit_spark.operators.triangles import global_clustering_coefficient

    rep = bter_replicate(und, seed=5)
    assert global_clustering_coefficient(rep) > 0.3
