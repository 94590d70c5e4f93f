"""Round-4 operators: NodeDistance family (Jaccard / Adamic-Adar edge
distances, Volume, bounded + bidirectional Dijkstra, ReverseBFS), remaining
community comparison measures, LocalPartitionCoverage, HashingOverlapper.

Pins: brute-force Python replicas / networkx where available — independent
of the DuckDB gate oracles.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    nx = None


# small undirected test graph: two triangles joined by a bridge + a pendant
UND = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5), (5, 6)]


def _und_df(spark, edges=UND, weights=None):
    rows = []
    for i, (a, b) in enumerate(edges):
        w = 1.0 if weights is None else float(weights[i])
        rows += [(a, b, w), (b, a, w)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _adj(edges=UND):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_jaccard_distance_bruteforce(spark):
    from networkit_spark.operators.node_distance import jaccard_distance

    adj = _adj()
    got = {
        (r["src"], r["dst"]): (r["score"], r["distance"])
        for r in jaccard_distance(_und_df(spark)).collect()
    }
    assert set(got) == {tuple(sorted(e)) for e in UND}
    for (u, v), (score, dist) in got.items():
        t = len(adj[u] & adj[v])
        expect = t / (len(adj[u]) + len(adj[v]) - t)
        assert score == pytest.approx(expect)
        assert dist == pytest.approx(1.0 - expect)


def test_adamic_adar_distance_bruteforce(spark):
    from networkit_spark.operators.node_distance import adamic_adar_distance

    adj = _adj()
    got = {
        (r["src"], r["dst"]): (r["aa"], r["distance"])
        for r in adamic_adar_distance(_und_df(spark)).collect()
    }
    for (u, v), (aa, dist) in got.items():
        expect = sum(1.0 / math.log(len(adj[w])) for w in adj[u] & adj[v])
        assert aa == pytest.approx(expect)
        if expect > 0:
            assert dist == pytest.approx(1.0 / expect)
        else:
            assert dist is None


def test_volume_ball_sizes_bruteforce(spark):
    from networkit_spark.operators.node_distance import ball_sizes, volume

    e = _und_df(spark)
    adj = _adj()
    rows = ball_sizes(e, 1.0, 6, seed=7, n=7).collect()
    assert len(rows) == 6  # one row per sample, even when sources repeat
    for r in rows:
        assert r["ball"] == 1 + len(adj[r["source"]])
    v = volume(e, 1.0, 6, seed=7)
    assert v == pytest.approx(sum(r["ball"] for r in rows) / 6)


def test_volume_multi_radii(spark):
    from networkit_spark.operators.node_distance import volume_multi

    e = _und_df(spark)
    v1, v2 = volume_multi(e, [1.0, 2.0], samples=5, seed=3)
    assert v2 >= v1 >= 1.0


@pytest.mark.skipif(nx is None, reason="networkx unavailable")
def test_bounded_sssp_matches_networkx_cutoff(spark):
    from networkit_spark.operators.node_distance import bounded_sssp

    weights = [1, 2, 2, 3, 1, 2, 1, 4]
    e = _und_df(spark, weights=weights)
    g = nx.Graph()
    for (a, b), w in zip(UND, weights):
        g.add_edge(a, b, weight=float(w))
    expect = nx.single_source_dijkstra_path_length(g, 0, cutoff=4.0, weight="weight")
    got = {r["node"]: r["dist"] for r in bounded_sssp(e, 0, 4.0).collect()}
    assert got == pytest.approx(expect)


@pytest.mark.skipif(nx is None, reason="networkx unavailable")
def test_bidirectional_dijkstra_matches_networkx(spark):
    from networkit_spark.operators.node_distance import bidirectional_dijkstra

    weights = [1, 2, 2, 3, 1, 2, 1, 4]
    e = _und_df(spark, weights=weights)
    g = nx.Graph()
    for (a, b), w in zip(UND, weights):
        g.add_edge(a, b, weight=float(w))
    for s, t in [(0, 6), (1, 5), (4, 0), (2, 2)]:
        expect = nx.shortest_path_length(g, s, t, weight="weight")
        assert bidirectional_dijkstra(e, s, t) == pytest.approx(expect)


def test_bidirectional_dijkstra_unreachable(spark):
    from networkit_spark.operators.node_distance import bidirectional_dijkstra

    e = spark.createDataFrame(
        [(0, 1, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    assert bidirectional_dijkstra(e, 0, 3) is None


def test_reverse_bfs_directed_path(spark):
    from networkit_spark.operators.node_distance import reverse_bfs

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    got = {r["node"]: r["dist"] for r in reverse_bfs(e, 3).collect()}
    assert got == {3: 0, 2: 1, 1: 2, 0: 3}


# -- community comparison measures ------------------------------------------


def _labels_df(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), "node long, label long")


def test_node_structural_rand_identical_and_opposite(spark):
    from networkit_spark.operators.community import (
        node_structural_rand,
        rand_index,
    )

    a = _labels_df(spark, {i: i % 2 for i in range(8)})
    b = _labels_df(spark, {i: i % 2 for i in range(8)})
    assert node_structural_rand(a, b) == pytest.approx(0.0)
    c = _labels_df(spark, {i: i % 4 for i in range(8)})
    assert node_structural_rand(a, c) == pytest.approx(1.0 - rand_index(a, c))


def test_sampled_node_structural_rand_deterministic(spark):
    from networkit_spark.operators.community import sampled_node_structural_rand

    a = _labels_df(spark, {i: i % 2 for i in range(10)})
    b = _labels_df(spark, {i: i % 5 for i in range(10)})
    d1 = sampled_node_structural_rand(a, b, n=10, samples=40, seed=9)
    d2 = sampled_node_structural_rand(a, b, n=10, samples=40, seed=9)
    assert d1 == d2
    assert 0.0 <= d1 <= 1.0
    # identical partitions agree on every sampled pair
    assert sampled_node_structural_rand(a, a, n=10, samples=40, seed=9) == 0.0


def test_sampled_graph_structural_rand_identical_zero(spark):
    from networkit_spark.operators.community import sampled_graph_structural_rand

    e = _und_df(spark)
    a = _labels_df(spark, {i: i % 3 for i in range(7)})
    assert sampled_graph_structural_rand(e, a, a, n=7, samples=32, seed=4) == 0.0


def test_conductance_2partition_bruteforce(spark):
    from networkit_spark.operators.community import conductance_2partition

    e = _und_df(spark)
    labels = _labels_df(spark, {i: (0 if i <= 2 else 1) for i in range(7)})
    # cut edge: (2,3) only; vol(C0) = deg0+deg1+deg2 = 2+2+3, vol(C1) = 2*8-7
    cond = conductance_2partition(e, labels)
    assert cond == pytest.approx(1.0 / min(7, 9))


def test_dynamic_nmi_bounds(spark):
    from networkit_spark.operators.community import dynamic_nmi

    a = _labels_df(spark, {i: i % 2 for i in range(8)})
    assert dynamic_nmi(a, a) == pytest.approx(0.0)
    b = _labels_df(spark, {i: i % 4 for i in range(8)})
    d = dynamic_nmi(a, b)
    assert 0.0 <= d <= 1.0
    # restriction to common nodes: extra nodes in `b` are ignored
    b_ext = _labels_df(spark, {**{i: i % 4 for i in range(8)}, 100: 1, 101: 2})
    assert dynamic_nmi(a, b_ext) == pytest.approx(d)


# -- HashingOverlapper --------------------------------------------------------


def test_djb2_bytes_early_stop():
    from networkit_spark.operators.overlap import djb2_bytes

    # plain one-byte key
    assert djb2_bytes(7) == 5381 * 33 + 7
    # zero LOW byte stops immediately (the reference's C-string quirk)
    assert djb2_bytes(0x100) == 5381
    # two bytes little-endian: 0x0201 -> b0=1, b1=2
    assert djb2_bytes(0x0201) == (5381 * 33 + 1) * 33 + 2


def test_hashing_overlapper_two_partitions(spark):
    from networkit_spark.operators.overlap import (
        _combine_key,
        djb2_bytes,
        hashing_overlapper,
    )

    a = _labels_df(spark, {i: i % 2 for i in range(6)})
    b = _labels_df(spark, {i: i % 3 for i in range(6)})
    got = {r["node"]: r["label"] for r in hashing_overlapper([a, b]).collect()}
    # expected: compact(djb2(key)) in ascending-hash order
    hashes = {i: djb2_bytes(_combine_key(i % 2, i % 3)) for i in range(6)}
    order = {h: i for i, h in enumerate(sorted(set(hashes.values())))}
    assert got == {i: order[hashes[i]] for i in range(6)}


def test_hashing_overlapper_single_and_many(spark):
    from networkit_spark.operators.overlap import djb2_bytes, hashing_overlapper

    a = _labels_df(spark, {i: i % 2 for i in range(6)})
    got1 = {r["node"]: r["label"] for r in hashing_overlapper([a]).collect()}
    assert got1 == {i: i % 2 for i in range(6)}

    b = _labels_df(spark, {i: i % 3 for i in range(6)})
    c = _labels_df(spark, {i: i // 3 for i in range(6)})
    got3 = {r["node"]: r["label"] for r in hashing_overlapper([a, b, c]).collect()}
    raw = {
        i: sum(
            djb2_bytes((ci + 2) * lab) & 0xFFFF
            for ci, lab in enumerate([i % 2, i % 3, i // 3])
        )
        for i in range(6)
    }
    order = {h: k for k, h in enumerate(sorted(set(raw.values())))}
    assert got3 == {i: order[raw[i]] for i in range(6)}


# -- LocalPartitionCoverage / LocalCoverEvaluation ----------------------------


def test_local_partition_coverage_bruteforce(spark):
    from networkit_spark.operators.centrality import local_partition_coverage

    e = _und_df(spark)
    part = {i: (0 if i <= 2 else 1) for i in range(7)}
    adj = _adj()
    got = {
        r["node"]: r["score"]
        for r in local_partition_coverage(e, _labels_df(spark, part)).collect()
    }
    for u in range(7):
        same = sum(1 for v in adj[u] if part[v] == part[u])
        assert got[u] == pytest.approx(same / len(adj[u]))


def test_local_cover_evaluation_matches_partition_eval_on_partition(spark):
    from networkit_spark.operators.community import (
        local_cover_evaluation,
        local_partition_evaluation,
    )

    e = _und_df(spark)
    part = _labels_df(spark, {i: (0 if i <= 2 else 1) for i in range(7)})
    by_cover = {
        r["label"]: (r["size"], r["intra_density"], r["iso_conductance"], r["iso_expansion"])
        for r in local_cover_evaluation(e, part).collect()
    }
    by_part = {
        r["label"]: (r["size"], r["intra_density"], r["iso_conductance"], r["iso_expansion"])
        for r in local_partition_evaluation(e, part).collect()
    }
    assert set(by_cover) == set(by_part)
    for k in by_part:
        assert by_cover[k] == pytest.approx(by_part[k])


def test_estimate_betweenness_star_center(spark):
    from networkit_spark.operators.betweenness import estimate_betweenness

    star = [(0, i) for i in range(1, 7)]
    e = _und_df(spark, edges=star)
    scores = {r["node"]: r["score"] for r in estimate_betweenness(e, 4, seed=1).collect()}
    assert scores[0] == max(scores.values())
    assert all(scores[i] == 0.0 for i in range(1, 7))


def test_top_harmonic_closeness_ranking(spark):
    from networkit_spark.operators.closeness import closeness, top_harmonic_closeness

    e = _und_df(spark)
    full = {
        r["node"]: r["score"] for r in closeness(e, harmonic=True).collect()
    }
    top = top_harmonic_closeness(e, k=3).collect()
    expect = sorted(full, key=lambda u: (-full[u], u))[:3]
    assert [r["node"] for r in top] == expect
