"""Round-4d tests: GraphClusteringTools battery, CoverHubDominance,
Kruskal/Prim minimum spanning forest, ChibaNishizeki triangle edge score,
the distributed Bloom filter, the SNAP cover reader, and the Postscript
writer — each against a brute-force / networkx / hand-computed oracle.
"""

import os
import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.community import (
    communication_graph,
    cover_hub_dominance,
    equal_clusterings,
    get_imbalance,
    is_one_clustering,
    is_proper_clustering,
    is_singleton_clustering,
    weighted_degree_with_cluster,
)


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _und(spark, triples):
    sym = triples + [(b, a, w) for a, b, w in triples]
    return _edges_df(spark, sym)


def _labels_df(spark, lab):
    return spark.createDataFrame(
        [(int(n), int(c)) for n, c in lab.items()], "node long, label long"
    )


def _gnp(n, p, seed):
    rng = random.Random(seed)
    return [
        (a, b, float(rng.randint(1, 9)))
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]


# ---------------------------------------------------------------------------
# GraphClusteringTools
# ---------------------------------------------------------------------------


def test_communication_graph_brute(spark):
    triples = _gnp(40, 0.15, 7)
    lab = {n: n % 5 for n in range(40)}
    got = {
        (r["ca"], r["cb"]): r["weight"]
        for r in communication_graph(_und(spark, triples), _labels_df(spark, lab)).collect()
    }
    exp: dict = {}
    for a, b, w in triples:
        ca, cb = lab[a], lab[b]
        if ca == cb:
            continue
        key = (min(ca, cb), max(ca, cb))
        exp[key] = exp.get(key, 0.0) + w
    # labels 0..4 all occur -> compact ids == labels
    assert got == pytest.approx(exp)


def test_communication_graph_compacts_sparse_labels(spark):
    triples = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    lab = {0: 100, 1: 100, 2: 7, 3: 42}  # ascending order: 7->0, 42->1, 100->2
    got = {
        (r["ca"], r["cb"]): r["weight"]
        for r in communication_graph(_und(spark, triples), _labels_df(spark, lab)).collect()
    }
    assert got == {(0, 2): 1.0, (0, 1): 1.0}


def test_imbalance_and_predicates(spark):
    lab = {0: 0, 1: 0, 2: 0, 3: 1}  # sizes 3,1; n=4, k=2, ceil(4/2)=2 -> 1.5
    labels = _labels_df(spark, lab)
    nodes = spark.range(4).select(F.col("id").alias("node"))
    assert get_imbalance(labels) == pytest.approx(1.5)
    assert is_proper_clustering(nodes, labels)
    assert not is_singleton_clustering(labels)
    assert not is_one_clustering(labels)
    singleton = _labels_df(spark, {i: i + 10 for i in range(4)})
    assert is_singleton_clustering(singleton)
    one = _labels_df(spark, {i: 3 for i in range(4)})
    assert is_one_clustering(one)
    # missing node 3 -> not proper
    part = _labels_df(spark, {0: 0, 1: 0, 2: 1})
    assert not is_proper_clustering(nodes, part)


def test_equal_clusterings(spark):
    a = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 1})
    b = _labels_df(spark, {0: 9, 1: 9, 2: 4, 3: 4})  # same grouping, renamed
    c = _labels_df(spark, {0: 0, 1: 1, 2: 1, 3: 0})  # different grouping
    d = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 2})  # refinement, not equal
    assert equal_clusterings(a, b)
    assert not equal_clusterings(a, c)
    assert not equal_clusterings(a, d)


def test_weighted_degree_with_cluster_brute(spark):
    triples = _gnp(30, 0.2, 11)
    lab = {n: n % 4 for n in range(30)}
    und = _und(spark, triples)
    got = {
        (r["node"], r["cid"]): r["wdeg"]
        for r in weighted_degree_with_cluster(und, _labels_df(spark, lab)).collect()
    }
    exp: dict = {}
    for a, b, w in triples:
        exp[(a, lab[b])] = exp.get((a, lab[b]), 0.0) + w
        exp[(b, lab[a])] = exp.get((b, lab[a]), 0.0) + w
    assert got == pytest.approx(exp)


def test_cover_hub_dominance_brute(spark):
    triples = _gnp(36, 0.18, 3)
    g = nx.Graph()
    g.add_nodes_from(range(36))
    g.add_edges_from((a, b) for a, b, _ in triples)
    # overlapping cover: node%3, plus 10+node%2 for nodes < 12
    cover = [(n, n % 3) for n in range(36)] + [(n, 10 + n % 2) for n in range(12)]
    cov_df = spark.createDataFrame(cover, "node long, label long")
    got = {
        r["label"]: (r["size"], r["hub_dominance"])
        for r in cover_hub_dominance(_und(spark, triples), cov_df).collect()
    }
    subsets: dict = {}
    for n, c in cover:
        subsets.setdefault(c, set()).add(n)
    for c, members in subsets.items():
        size, hd = got[c]
        assert size == len(members)
        if len(members) == 1:
            assert hd == pytest.approx(1.0)
        else:
            mx = max(len(set(g.neighbors(u)) & members) for u in members)
            assert hd == pytest.approx(mx / (len(members) - 1))


# ---------------------------------------------------------------------------
# Kruskal / Prim minimum spanning forest
# ---------------------------------------------------------------------------


def test_kruskal_prim_min_forest_vs_networkx(spark):
    from networkit_spark.operators.spanning import kruskal_msf, prim_msf

    rng = random.Random(5)
    pairs = [(a, b) for a in range(50) for b in range(a + 1, 50) if rng.random() < 0.1]
    ws = rng.sample(range(1, 10 * len(pairs) + 1), len(pairs))
    triples = [(a, b, float(w)) for (a, b), w in zip(pairs, ws)]
    g = nx.Graph()
    g.add_nodes_from(range(50))
    for a, b, w in triples:
        g.add_edge(a, b, weight=w)
    exp = {
        (min(a, b), max(a, b))
        for a, b in nx.minimum_spanning_edges(g, algorithm="kruskal", data=False)
    }
    res = kruskal_msf(_und(spark, triples))
    got = {(r["src"], r["dst"]) for r in res.forest_df.collect()}
    assert got == exp
    res2 = prim_msf(_und(spark, triples))
    assert {(r["src"], r["dst"]) for r in res2.forest_df.collect()} == exp


# ---------------------------------------------------------------------------
# ChibaNishizeki triangle edge score == TriangleEdgeScore
# ---------------------------------------------------------------------------


def test_chiba_nishizeki_equals_triangle_edge_score(spark):
    from networkit_spark.operators.triangles import (
        chiba_nishizeki_triangle_score,
        triangle_edge_score,
    )

    triples = _gnp(40, 0.2, 13)
    und = _und(spark, triples)
    a = sorted(map(tuple, chiba_nishizeki_triangle_score(und).collect()))
    b = sorted(map(tuple, triangle_edge_score(und).collect()))
    assert a == b
    # spot-check one edge against networkx triangle membership
    g = nx.Graph()
    g.add_edges_from((x, y) for x, y, _ in triples)
    scores = {(r[0], r[1]): r[2] for r in a}
    for (u, v), s in list(scores.items())[:20]:
        assert s == len(set(g.neighbors(u)) & set(g.neighbors(v)))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp(spark):
    from networkit_spark.functions.bloom import bloom_build, bloom_contains

    members = spark.range(0, 400, 2).select(F.col("id").alias("v"))
    probes = spark.range(0, 400).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=8192, k=3)
    out = bloom_contains(probes, bloom, "v", m_bits=8192, k=3).collect()
    res = {r["v"]: r["maybe"] for r in out}
    assert all(res[v] for v in range(0, 400, 2))  # zero false negatives
    fps = sum(1 for v in range(1, 400, 2) if res[v])
    # k=3, n=200, m=8192 -> fp ~ (1-e^(-600/8192))^3 ~ 3.5e-4; 200 probes
    assert fps <= 3


def test_bloom_word_table_is_small(spark):
    from networkit_spark.functions.bloom import bloom_build

    members = spark.range(100).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=1024, k=4)
    assert bloom.count() <= 1024 // 64


# ---------------------------------------------------------------------------
# SNAP cover reader
# ---------------------------------------------------------------------------


def test_read_snap_cover_raw_line_ids(spark, tmp_path):
    from networkit_spark.sources.partitions import read_snap_cover

    p = tmp_path / "c.txt"
    p.write_text("# header\n1 2 3\n\n4 5\n")
    rows = {(r["node"], r["subset"]) for r in read_snap_cover(spark, str(p)).collect()}
    # comment line consumes id 1, members line -> 2, blank -> 3, next -> 4
    assert rows == {(1, 2), (2, 2), (3, 2), (4, 4), (5, 4)}


def test_read_snap_cover_node_map_drops_unknown(spark, tmp_path):
    from networkit_spark.sources.partitions import read_snap_cover

    p = tmp_path / "c.txt"
    p.write_text("10 20 99\n")
    nm = spark.createDataFrame([(10, 0), (20, 1)], "orig long, node long")
    rows = {(r["node"], r["subset"]) for r in read_snap_cover(spark, str(p), nm).collect()}
    assert rows == {(0, 1), (1, 1)}


# ---------------------------------------------------------------------------
# Postscript writer
# ---------------------------------------------------------------------------


def test_postscript_writer_structure(spark, tmp_path):
    from networkit_spark.sources.postscript import write_postscript

    triples = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)]
    coords = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 1.0), (3, 0.0, 1.0)],
        "node long, x double, y double",
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "node long, label long"
    )
    path = os.path.join(tmp_path, "g.eps")
    write_postscript(_und(spark, triples), coords, path, labels)
    text = open(path).read()
    assert text.startswith("%!PS-Adobe-1.0")
    assert text.rstrip().endswith("grestore")
    lines = text.splitlines()
    edge_lines = [ln for ln in lines if ln.endswith("l s")]
    node_lines = [ln for ln in lines if ln.endswith("a s")]
    assert len(edge_lines) == 4  # one per undirected edge
    assert len(node_lines) == 4
    # same-cluster edge (0,1) colored, cut edge (1,2) black
    e01 = edge_lines[0]
    assert not e01.startswith("0.000 0.000 0.000")
    e12 = edge_lines[2]
    assert e12.startswith("0.000 0.000 0.000")
    # deterministic: second write byte-identical
    path2 = os.path.join(tmp_path, "g2.eps")
    write_postscript(_und(spark, triples), coords, path2, labels)
    assert open(path2).read() == text


# ---------------------------------------------------------------------------
# Extended link prediction battery
# ---------------------------------------------------------------------------


def test_extended_link_prediction_brute(spark):
    from networkit_spark.operators.linkprediction import extended_link_prediction

    triples = _gnp(25, 0.25, 17)
    g = nx.Graph()
    g.add_nodes_from(range(25))
    g.add_edges_from((a, b) for a, b, _ in triples)
    pairs = [(u, v) for u in range(25) for v in range(u + 1, 25)]
    pdf = spark.createDataFrame(pairs, "u long, v long")
    lab = {n: n % 3 for n in range(25)}
    got = {
        (r["u"], r["v"]): r
        for r in extended_link_prediction(
            _und(spark, triples), pdf, _labels_df(spark, lab), n_nodes=25
        ).collect()
    }
    import math

    for u, v in pairs:
        nu, nv = set(g.neighbors(u)), set(g.neighbors(v))
        cn = len(nu & nv)
        du, dv = g.degree(u), g.degree(v)
        r = got[(u, v)]
        exp_nd = cn / math.sqrt(du * dv) if du and dv else 0.0
        assert r["nbhd_distance"] == pytest.approx(exp_nd, abs=1e-6)
        nm = sum(1 for a in nu for b in nv if a == b or g.has_edge(a, b))
        assert r["neighbors_measure"] == nm
        # reference quirk: b = c = |union|
        a_, un = float(cn), float(du + dv - cn)
        d_ = 25.0 - un
        den = a_ * un + a_ * un + 2 * a_ * d_ + un * un + un * d_ + un * un + un * d_
        exp_ar = 0.0 if den == 0 else 2 * (a_ * d_ - un * un) / den
        assert r["adjusted_rand"] == pytest.approx(exp_ar, abs=1e-6)
        assert r["same_community"] == int(lab[u] == lab[v])
        assert (r["u_deg"], r["v_deg"]) == (du, dv)


def test_link_thresholders(spark):
    from networkit_spark.operators.linkprediction import (
        threshold_by_count,
        threshold_by_percentage,
        threshold_by_score,
    )

    scores = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 3.0), (1, 2, 3.0), (2, 3, 1.0)],
        "u long, v long, s double",
    )
    assert {(r["u"], r["v"]) for r in threshold_by_score(scores, "s", 3.0).collect()} == {
        (0, 1), (0, 2), (1, 2)
    }
    top2 = [(r["u"], r["v"]) for r in threshold_by_count(scores, "s", 2).collect()]
    assert top2 == [(0, 1), (0, 2)]  # score desc, then pair asc; output pair-sorted
    assert threshold_by_percentage(scores, "s", 0.5).count() == 2


# ---------------------------------------------------------------------------
# PowerlawDegreeSequence
# ---------------------------------------------------------------------------


def test_powerlaw_degree_sequence_contract(spark):
    from networkit_spark.sources.generators import (
        _powerlaw_cumprob,
        _powerlaw_expected_avg,
        _powerlaw_gamma_from_avg,
        powerlaw_degree_sequence,
    )

    df = powerlaw_degree_sequence(spark, 2000, 2, 16, -2.2, seed=3)
    rows = df.collect()
    degs = [r["degree"] for r in rows]
    assert len(rows) == 2000
    assert min(degs) >= 1  # 2, minus possibly the even-sum decrement
    assert max(degs) <= 16
    assert sum(degs) % 2 == 0  # even-sum repair
    # empirical average ~ expected average
    cum = _powerlaw_cumprob(2, 16, -2.2)
    exp_avg = _powerlaw_expected_avg(cum, 16)
    assert abs(sum(degs) / 2000 - exp_avg) < 0.25
    # deterministic
    degs2 = [r["degree"] for r in powerlaw_degree_sequence(spark, 2000, 2, 16, -2.2, seed=3).collect()]
    assert sorted(degs) == sorted(degs2)
    # gamma search brackets the requested average
    g = _powerlaw_gamma_from_avg(4.0, 2, 16)
    got_avg = _powerlaw_expected_avg(_powerlaw_cumprob(2, 16, g), 16)
    assert abs(got_avg - 4.0) < 0.1


# ---------------------------------------------------------------------------
# NeighborhoodUtility / PredictionsSorter / TotalNeighborsIndex
# ---------------------------------------------------------------------------


def test_neighborhood_utility_and_sorter(spark):
    from networkit_spark.operators.linkprediction import (
        common_neighbors,
        neighbors_union,
        sort_predictions,
    )

    # path 0-1-2-3 plus edge 0-3: N(0)={1,3} N(2)={1,3}
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    und = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    pairs = spark.createDataFrame([(0, 2)], "u long, v long")
    cn = sorted(r["neighbor"] for r in common_neighbors(und, pairs).collect())
    assert cn == [1, 3]
    un = sorted(r["neighbor"] for r in neighbors_union(und, pairs).collect())
    assert un == [1, 3]
    scores = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 5.0), (1, 2, 5.0)], "u long, v long, s double"
    )
    got = [(r["u"], r["v"]) for r in sort_predictions(scores, "s").collect()]
    assert got == [(0, 2), (1, 2), (0, 1)]


def test_total_neighbors_column(spark):
    from networkit_spark.operators.linkprediction import extended_link_prediction

    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    und = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    pairs = spark.createDataFrame([(0, 2), (1, 3)], "u long, v long")
    rows = {(r["u"], r["v"]): r["total_neighbors"]
            for r in extended_link_prediction(und, pairs, n_nodes=4).collect()}
    assert rows == {(0, 2): 2, (1, 3): 2}  # N(0)uN(2)={1,3}; N(1)uN(3)={0,2}


# ---------------------------------------------------------------------------
# EdgeListPartitionReader / LineFileReader / Mat IO gate
# ---------------------------------------------------------------------------


def test_read_edgelist_partition(spark, tmp_path):
    from networkit_spark.sources.partitions import read_edgelist_partition

    p = tmp_path / "part.tsv"
    p.write_text("# a comment line\n1\t3\n2\t3\n4\t7\n")
    got = {(r["node"], r["label"])
           for r in read_edgelist_partition(spark, str(p)).collect()}
    assert got == {(0, 3), (1, 3), (3, 7)}  # firstNode=1 shift


def test_read_lines(spark, tmp_path):
    from networkit_spark.sources.edgelist import read_lines

    p = tmp_path / "lines.txt"
    p.write_text("alpha\n\nbeta\n")
    rows = sorted(
        (r["line_no"], r["line"]) for r in read_lines(spark, str(p)).collect()
    )
    assert rows == [(0, "alpha"), (1, ""), (2, "beta")]


def test_mat_io_gate(spark, tmp_path):
    import pytest

    from networkit_spark.sources.partitions import read_mat, write_mat

    try:
        import scipy.io  # noqa: F401
        have_scipy = True
    except ImportError:
        have_scipy = False
    und = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    if not have_scipy:
        with pytest.raises(NotImplementedError):
            read_mat(spark, str(tmp_path / "x.mat"))
        with pytest.raises(NotImplementedError):
            write_mat(und, str(tmp_path / "x.mat"))
    else:  # pragma: no cover - scipy absent in this container
        write_mat(und, str(tmp_path / "x.mat"), n=3)
        got = {(r["src"], r["dst"]) for r in read_mat(spark, str(tmp_path / "x.mat")).collect()}
        assert got == {(0, 1), (1, 2)}


# ---------------------------------------------------------------------------
# SpectralPartitioner
# ---------------------------------------------------------------------------


def _grouping(rows):
    groups = {}
    for r in rows:
        groups.setdefault(r["label"], set()).add(r["node"])
    return sorted(groups.values(), key=lambda s: min(s))


def test_spectral_partition_two_cliques(spark):
    from networkit_spark.operators.spectral import spectral_partition

    # two 8-cliques joined by one bridge edge
    triples = []
    for base in (0, 8):
        triples += [(base + a, base + b, 1.0)
                    for a in range(8) for b in range(a + 1, 8)]
    triples.append((0, 8, 1.0))
    und = _und(spark, triples)
    groups = _grouping(spectral_partition(und, 16, 2).collect())
    assert groups == [set(range(8)), set(range(8, 16))]
    # deterministic
    groups2 = _grouping(spectral_partition(und, 16, 2).collect())
    assert groups == groups2


def test_spectral_partition_counts_and_balance(spark):
    from networkit_spark.operators.spectral import spectral_partition

    rng = random.Random(2)
    triples = [(a, b, 1.0) for a in range(24) for b in range(a + 1, 24)
               if rng.random() < 0.3]
    # make sure it's connected: add a ring
    triples += [(i, (i + 1) % 24, 1.0) for i in range(24)]
    und = _und(spark, list(set(triples)))
    for count in (2, 3, 4, 5):
        rows = spectral_partition(und, 24, count).collect()
        assert len(rows) == 24
        groups = _grouping(rows)
        assert len(groups) == count
    # balanced bisection = floor-median split -> sizes 12/12
    sizes = sorted(len(g) for g in _grouping(
        spectral_partition(und, 24, 2, balanced=True).collect()))
    assert sizes == [12, 12]


def test_powerlaw_reference_anchor():
    """Mirrors the reference's own testPowerLawDegreeSequence
    (test_generators.py:163-175): PowerlawDegreeSequence(2, 100),
    setMinimumFromAverageDegree(12.0) -> minDeg 4, then gamma = 5.0 gives
    expected average degree 86.139 (3 decimals)."""
    from networkit_spark.sources.generators import (
        _powerlaw_cumprob,
        _powerlaw_expected_avg,
        _powerlaw_min_from_avg,
    )

    m = _powerlaw_min_from_avg(12.0, 100, -2.0)
    assert m == 4
    avg = _powerlaw_expected_avg(_powerlaw_cumprob(m, 100, 5.0), 100)
    assert abs(avg - 86.139) < 5e-4
