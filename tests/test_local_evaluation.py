"""Local partition evaluation family + permanence centrality.

Hand-computed goldens on the bridged-two-cliques fixture (two 4-cliques,
bridge 0-4), matching the reference semantics of
``IntrapartitionDensity.cpp``, ``IsolatedInterpartitionConductance.cpp``,
``IsolatedInterpartitionExpansion.cpp``, ``StablePartitionNodes.cpp``,
``PartitionFragmentation.cpp`` and ``PermanenceCentrality.cpp``.
"""

import pytest

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.centrality import permanence
from networkit_spark.operators.community import (
    local_partition_evaluation,
    one_partition,
    partition_fragmentation,
    stable_partition_nodes,
)
from networkit_spark.operators.components import ConnectedComponents

from tests.fixtures import clique_edges


def _bridged_cliques(spark):
    """Two 4-cliques {0..3}, {4..7} plus bridge 0-4 (symmetrized)."""
    return symmetrize(edges_df(spark, clique_edges(2, 4) + [(0, 4)]))


def _labels(spark, mapping):
    return spark.createDataFrame(
        [(int(n), int(l)) for n, l in mapping.items()], "node long, label long"
    )


CLIQUE_LABELS = {n: 0 for n in range(4)} | {n: 1 for n in range(4, 8)}


def test_local_partition_evaluation_bridged_cliques(spark):
    e = _bridged_cliques(spark)
    rows = {
        r["label"]: r
        for r in local_partition_evaluation(e, _labels(spark, CLIQUE_LABELS)).collect()
    }
    # 6 intra edges over C(4,2)=6 possible; cut 1; volume 13 each (node 0/4
    # have degree 4); totalVolume 26; n = 8
    for lbl in (0, 1):
        assert rows[lbl]["size"] == 4
        assert rows[lbl]["intra_density"] == pytest.approx(1.0)
        assert rows[lbl]["iso_conductance"] == pytest.approx(1 / 13)
        assert rows[lbl]["iso_expansion"] == pytest.approx(1 / 4)


def test_local_partition_evaluation_singleton_and_one_community(spark):
    e = _bridged_cliques(spark)
    # one community spanning everything: density = 13/C(8,2) (6+6+1 edges),
    # cut 0, conductance/expansion denominators degenerate -> 0
    one = one_partition(nodes_range(spark, 8))
    r = local_partition_evaluation(e, one).collect()[0]
    assert r["intra_density"] == pytest.approx(13 / 28)
    assert r["iso_conductance"] == 0.0
    assert r["iso_expansion"] == 0.0
    # a community holding only an isolated node: density 1 by definition
    e2 = symmetrize(edges_df(spark, [(0, 1)]))
    labels = _labels(spark, {0: 0, 1: 0, 2: 2})
    rows = {x["label"]: x for x in local_partition_evaluation(e2, labels).collect()}
    assert rows[2]["size"] == 1
    assert rows[2]["intra_density"] == pytest.approx(1.0)
    assert rows[2]["iso_conductance"] == 0.0


def test_stable_partition_nodes(spark):
    e = _bridged_cliques(spark)
    rows = {
        r["label"]: r for r in stable_partition_nodes(e, _labels(spark, CLIQUE_LABELS)).collect()
    }
    assert rows[0]["stable_frac"] == pytest.approx(1.0)
    assert rows[1]["stable_frac"] == pytest.approx(1.0)
    # mislabel node 3 into community 1: node 3 has ownWeight 0 (unstable),
    # node 0 sees 2 own vs 2 foreign (>= -> unstable), nodes 1,2 stay stable
    # (2 own vs 1 foreign); in community 1, nodes 4..7 all stable
    shifted = CLIQUE_LABELS | {3: 1}
    rows = {r["label"]: r for r in stable_partition_nodes(e, _labels(spark, shifted)).collect()}
    assert rows[0]["size"] == 3 and rows[0]["stable_frac"] == pytest.approx(2 / 3)
    assert rows[1]["size"] == 5 and rows[1]["stable_frac"] == pytest.approx(4 / 5)


def test_stable_isolated_node_is_stable(spark):
    e = symmetrize(edges_df(spark, [(0, 1)]))
    labels = _labels(spark, {0: 0, 1: 0, 5: 3})
    rows = {r["label"]: r for r in stable_partition_nodes(e, labels).collect()}
    assert rows[3]["stable_frac"] == pytest.approx(1.0)


def test_partition_fragmentation(spark):
    # two disjoint 4-cliques, no bridge: the all-in-one community splits in
    # two CC pieces -> fragmentation 0.5; per-clique communities -> 0
    e = symmetrize(edges_df(spark, clique_edges(2, 4)))
    nodes = nodes_range(spark, 8)
    cc = ConnectedComponents().run(e, nodes).get_partition()
    r = partition_fragmentation(one_partition(nodes), cc).collect()[0]
    assert r["size"] == 8 and r["fragmentation"] == pytest.approx(0.5)
    rows = partition_fragmentation(_labels(spark, CLIQUE_LABELS), cc).collect()
    assert all(x["fragmentation"] == pytest.approx(0.0) for x in rows)


def test_permanence_bridged_cliques(spark):
    e = _bridged_cliques(spark)
    rows = {r["node"]: r["permanence"] for r in permanence(e, _labels(spark, CLIQUE_LABELS)).collect()}
    # node 0: intra 3, maxExt 1, deg 4, intraCC 1 -> 3/4; interior nodes:
    # intra 3 = deg, maxExt -> 1 default, intraCC 1 -> 1.0
    assert rows[0] == pytest.approx(0.75)
    assert rows[4] == pytest.approx(0.75)
    for n in (1, 2, 3, 5, 6, 7):
        assert rows[n] == pytest.approx(1.0)


def test_permanence_no_intra_neighbors(spark):
    # star center labeled alone: intra 0, maxExt 3 (all leaves one foreign
    # community), deg 3, intraCC 0 -> 0/(3*3) - 1 = -1
    e = symmetrize(edges_df(spark, [(0, 1), (0, 2), (0, 3)]))
    labels = _labels(spark, {0: 9, 1: 1, 2: 1, 3: 1})
    rows = {r["node"]: r["permanence"] for r in permanence(e, labels).collect()}
    assert rows[0] == pytest.approx(-1.0)
