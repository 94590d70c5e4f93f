"""BidirectionalBFS / APSP / SPSP vs networkx oracles."""

import networkx as nx

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.distance import apsp, bidirectional_bfs, spsp


def _digraph(n=30):
    pairs = [(i, (i * 2 + 1) % n) for i in range(n)] + [
        (i, (i * 5 + 2) % n) for i in range(n)
    ]
    return sorted({(a, b) for a, b in pairs if a != b})


def test_bidirectional_bfs_matches_networkx(spark):
    n = 30
    pairs = _digraph(n)
    e = edges_df(spark, pairs)
    g = nx.DiGraph(pairs)
    for s, t in [(0, 0), (0, 7), (3, 19), (11, 2), (5, 28)]:
        try:
            want = nx.shortest_path_length(g, s, t)
        except nx.NetworkXNoPath:
            want = -1
        assert bidirectional_bfs(e, s, t) == want, (s, t)


def test_bidirectional_bfs_unreachable(spark):
    e = edges_df(spark, [(0, 1), (1, 2), (4, 3)])
    assert bidirectional_bfs(e, 0, 4) == -1
    assert bidirectional_bfs(e, 0, 2) == 2


def test_apsp_spsp_match_networkx(spark):
    n = 20
    pairs = _digraph(n)
    e = symmetrize(edges_df(spark, pairs))
    g = nx.Graph(pairs)
    want = {
        (s, v): d for s, lens in nx.all_pairs_shortest_path_length(g) for v, d in lens.items()
    }
    got = {(r.source, r.node): r.dist for r in apsp(e, nodes_range(spark, n)).collect()}
    assert got == want
    srcs = spark.range(4).select("id")
    tgts = spark.range(10).select("id")
    got2 = {
        (r.source, r.node): r.dist
        for r in spsp(e, srcs, tgts).collect()
    }
    want2 = {(s, v): d for (s, v), d in want.items() if s < 4 and v < 10}
    assert got2 == want2
