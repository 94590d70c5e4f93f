from networkit_spark.sources.edgelist import (
    guess_format,
    read_edge_list,
    read_konect,
    read_metis,
    read_partition,
    read_snap,
    write_edge_list,
)


def edges_set(df):
    return {(r["src"], r["dst"], r["weight"]) for r in df.collect()}


def test_read_edge_list_tab_zero(spark, tmp_path):
    p = tmp_path / "g.el"
    p.write_text("# comment\n0\t1\n1\t2\n2\t0\n")
    nodes, edges = read_edge_list(spark, str(p), directed=True)
    assert nodes.count() == 3
    assert edges_set(edges) == {(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)}


def test_read_edge_list_weighted_one_based(spark, tmp_path):
    p = tmp_path / "g1.el"
    p.write_text("1 2 2.5\n2 3 0.5\n")
    _, edges = read_edge_list(spark, str(p), sep=" ", first_node=1, directed=True)
    assert edges_set(edges) == {(0, 1, 2.5), (1, 2, 0.5)}


def test_read_edge_list_string_ids(spark, tmp_path):
    p = tmp_path / "gs.el"
    p.write_text("alice\tbob\nbob\tcarol\n")
    nodes, edges = read_edge_list(spark, str(p), continuous=False, directed=True)
    m = {r["raw"]: r["id"] for r in nodes.collect()}
    assert m == {"alice": 0, "bob": 1, "carol": 2}  # lexicographic dense rank
    assert edges_set(edges) == {(0, 1, 1.0), (1, 2, 1.0)}


def test_read_edge_list_undirected_symmetrizes(spark, tmp_path):
    p = tmp_path / "gu.el"
    p.write_text("0\t1\n")
    _, edges = read_edge_list(spark, str(p), directed=False)
    assert edges_set(edges) == {(0, 1, 1.0), (1, 0, 1.0)}


def test_read_snap_and_konect(spark, tmp_path):
    s = tmp_path / "wiki.txt"
    s.write_text("# Directed graph\n# FromNodeId\tToNodeId\n0\t1\n1\t2\n")
    _, es = read_snap(spark, str(s))
    assert edges_set(es) == {(0, 1, 1.0), (1, 2, 1.0)}
    k = tmp_path / "g.konect"
    k.write_text("% sym unweighted\n1 2\n2 3\n")
    _, ek = read_konect(spark, str(k), directed=True)
    assert edges_set(ek) == {(0, 1, 1.0), (1, 2, 1.0)}


def test_read_metis(spark, tmp_path):
    # triangle 1-2-3 in METIS: header "3 3", line i lists neighbors of node i
    p = tmp_path / "tri.graph"
    p.write_text("3 3\n2 3\n1 3\n1 2\n")
    nodes, edges = read_metis(spark, str(p))
    assert nodes.count() == 3
    assert edges_set(edges) == {
        (0, 1, 1.0), (0, 2, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 1, 1.0)
    }


def test_read_metis_comments_dont_shift_ids(spark, tmp_path):
    # '%' comments before the header and between body lines must not consume
    # node indices (round-2 advice fix)
    p = tmp_path / "tric.graph"
    p.write_text("% a comment first\n3 3\n2 3\n% interleaved\n1 3\n1 2\n")
    nodes, edges = read_metis(spark, str(p))
    assert nodes.count() == 3
    assert edges_set(edges) == {
        (0, 1, 1.0), (0, 2, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 1, 1.0)
    }


def test_read_metis_weighted_fmt1(spark, tmp_path):
    # fmt=1: neighbor/weight pairs per line
    p = tmp_path / "triw.graph"
    p.write_text("3 3 1\n2 5 3 7\n1 5 3 2\n1 7 2 2\n")
    _, edges = read_metis(spark, str(p))
    assert edges_set(edges) == {
        (0, 1, 5.0), (0, 2, 7.0), (1, 0, 5.0), (1, 2, 2.0), (2, 0, 7.0), (2, 1, 2.0)
    }


def test_read_metis_vertex_weights_fmt10(spark, tmp_path):
    # fmt=10, ncon=1: one vertex weight prefixed per line, skipped
    p = tmp_path / "trivw.graph"
    p.write_text("3 2 10 1\n9 2\n4 1 3\n1 2\n")
    _, edges = read_metis(spark, str(p))
    assert edges_set(edges) == {
        (0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)
    }


def test_read_metis_isolated_node_line(spark, tmp_path):
    # an empty body line is a node with no neighbors and must keep its index
    p = tmp_path / "iso.graph"
    p.write_text("3 1\n2\n1\n\n")
    nodes, edges = read_metis(spark, str(p))
    assert nodes.count() == 3
    assert edges_set(edges) == {(0, 1, 1.0), (1, 0, 1.0)}


def test_read_metis_bad_fmt_raises(spark, tmp_path):
    p = tmp_path / "bad.graph"
    p.write_text("2 1 3\n2\n1\n")
    try:
        read_metis(spark, str(p))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_write_read_roundtrip(spark, tmp_path):
    from networkit_spark.graph import edges_df

    e = edges_df(spark, [(0, 1, 1.5), (1, 2, 2.0)], weighted=True)
    out = str(tmp_path / "out")
    write_edge_list(e, out)
    _, back = read_edge_list(spark, out, directed=True)
    assert edges_set(back) == edges_set(e)


def test_read_partition(spark, tmp_path):
    p = tmp_path / "part.txt"
    p.write_text("0\n0\n1\n")
    labels = {r["node"]: r["label"] for r in read_partition(spark, str(p)).collect()}
    assert labels == {0: 0, 1: 0, 2: 1}


def test_guess_format():
    assert guess_format("astro-ph.graph") == "metis"
    assert guess_format("wiki-Vote.txt") == "snap"
    assert guess_format("x.konect") == "konect"
    assert guess_format("foo.edgelist") == "edgelist-tab-zero"


def test_read_gml(spark, tmp_path):
    from networkit_spark.sources.edgelist import read_gml

    p = tmp_path / "g.gml"
    p.write_text(
        "graph [\n  directed 1\n  node [\n    id 0\n  ]\n  node [\n    id 1\n  ]\n"
        "  node [\n    id 2\n  ]\n  edge [\n    source 0\n    target 1\n  ]\n"
        "  edge [\n    source 1\n    target 2\n    weight 2.5\n  ]\n]\n"
    )
    nodes, edges, directed = read_gml(spark, str(p))
    assert directed
    assert nodes.count() == 3
    assert edges_set(edges) == {(0, 1, 1.0), (1, 2, 2.5)}


def test_read_graphml(spark, tmp_path):
    from networkit_spark.sources.edgelist import read_graphml

    p = tmp_path / "g.graphml"
    p.write_text(
        '<?xml version="1.0"?><graphml><graph edgedefault="undirected">'
        '<node id="a"/><node id="b"/><node id="c"/>'
        '<edge source="a" target="b"/><edge source="b" target="c"/>'
        "</graph></graphml>"
    )
    nodes, edges, directed = read_graphml(spark, str(p))
    assert not directed
    m = {r["raw"]: r["id"] for r in nodes.collect()}
    assert m == {"a": 0, "b": 1, "c": 2}
    assert edges_set(edges) == {
        (0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)
    }


def test_read_mtx(spark, tmp_path):
    from networkit_spark.sources.edgelist import read_mtx

    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% a comment\n"
        "3 3 2\n1 2 1.5\n2 3 1.0\n"
    )
    nodes, edges = read_mtx(spark, str(p))
    assert nodes.count() == 3
    assert edges_set(edges) == {
        (0, 1, 1.5), (1, 0, 1.5), (1, 2, 1.0), (2, 1, 1.0)
    }


def test_read_gexf_static_fixture(spark):
    """Golden: reference fixture input/staticTest.gexf (celegans) — 306
    node elements, 2345 edge elements = 2148 distinct undirected pairs
    (test_graphio.py:14 reads the same file)."""
    from networkit_spark.sources.edgelist import read_gexf

    nodes, edges, directed = read_gexf(spark, "/root/reference/input/staticTest.gexf")
    assert not directed
    assert nodes.count() == 306
    # symmetrized distinct directed rows = 2 * undirected edges
    und = edges.filter("src < dst").count()
    assert und == 2148
    assert edges.count() == 2 * und


def test_gexf_roundtrip(tmp_path, spark):
    from networkit_spark.sources.edgelist import read_gexf, write_gexf
    from networkit_spark.graph import edges_df, symmetrize

    e = symmetrize(edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], weighted=False))
    out = str(tmp_path / "g.gexf")
    write_gexf(e, out, directed=False)
    nodes, edges, directed = read_gexf(spark, out)
    assert not directed
    got = sorted((r["src"], r["dst"]) for r in edges.filter("src < dst").collect())
    # ids re-encoded by lexicographic rank of the string id: '0','1','2','3'
    assert got == [(0, 1), (0, 2), (1, 2), (2, 3)]


def test_read_rb_tiny05(spark):
    """RBGraphReader parity on the reference's own fixture: RUA 5x5, 11
    explicit entries, CSC order — exact (row, col, value) set."""
    from networkit_spark.sources.edgelist import read_rb

    nodes, edges = read_rb(spark, "/root/reference/input/tiny_05.rb")
    assert nodes.count() == 5
    got = {(r.src, r.dst, r.weight) for r in edges.collect()}
    want = {
        (0, 0, 1.0), (2, 0, 2.0), (4, 0, 3.0),
        (0, 1, -4.0), (3, 1, 5.0),
        (1, 2, -6.0), (4, 2, -7.0),
        (0, 3, -8.0), (3, 3, -9.0),
        (1, 4, 10.0), (4, 4, 11.0),
    }
    assert got == want


def test_read_rb_symmetric_pattern(spark, tmp_path):
    """'psa' format: pattern-only (weight 1.0) + symmetrize (no doubled
    self-loops). 3x3 lower triangle: (1,0),(2,0),(2,2)."""
    from networkit_spark.sources.edgelist import read_rb

    p = tmp_path / "sym.rb"
    p.write_text(
        "tiny symmetric pattern                                      T1\n"
        "             3             1             1             0\n"
        "PSA                        3             3             3\n"
        "(4I6)           (3I6)\n"
        "  1  3  3  4\n"
        "  2  3  3\n"
    )
    nodes, edges = read_rb(spark, str(p))
    assert nodes.count() == 3
    got = {(r.src, r.dst, r.weight) for r in edges.collect()}
    want = {
        (1, 0, 1.0), (2, 0, 1.0), (2, 2, 1.0),
        (0, 1, 1.0), (0, 2, 1.0),
    }
    assert got == want


def test_read_graphs_directory(spark, tmp_path):
    from networkit_spark.sources.edgelist import read_graphs

    (tmp_path / "a.txt").write_text("# snap\n0\t1\n1\t2\n")
    (tmp_path / "b.txt").write_text("# snap\n0\t1\n")
    (tmp_path / "skip.csv").write_text("x\n")
    got = read_graphs(spark, str(tmp_path), "*.txt")
    assert sorted(got) == ["a.txt", "b.txt"]
    assert got["a.txt"][1].count() == 2
    only_one = read_graphs(spark, str(tmp_path), "*.txt", some=1)
    assert list(only_one) == ["a.txt"]
    excl = read_graphs(spark, str(tmp_path), "*.txt", exclude="b*")
    assert sorted(excl) == ["a.txt"]
