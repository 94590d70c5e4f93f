"""Event-granular DynBetweenness (pair-state closed-form single-edge
inserts) vs full recompute — the equality contract of DynBetweenness.cpp
(update() leaves scores identical to run() on the updated graph)."""

from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.streaming.dyn_centrality import (
    pair_betweenness_init,
    pair_betweenness_insert,
)


def _scores(df):
    return {r["node"]: round(r["score"], 9) for r in df.collect()}


def _apsp(spark, pairs, n):
    from networkit_spark.operators.approx_betweenness import bfs_with_sigma

    e = symmetrize(edges_df(spark, pairs))
    dist, _ = bfs_with_sigma(e, nodes_range(spark, n).select("id"))
    return {
        (r["source"], r["node"]): (r["dist"], r["sigma"]) for r in dist.collect()
    }


def test_init_matches_brandes(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3)]
    e = symmetrize(edges_df(spark, pairs))
    nodes = nodes_range(spark, 5)
    st = pair_betweenness_init(e, nodes)
    assert _scores(st.scores) == _scores(betweenness(e, nodes))


def test_insert_sequence_matches_recompute(spark):
    """Grow a graph edge by edge; after every event both the pair state and
    the scores equal a from-scratch run (includes a tie-creating insert —
    sigma changes, dist unchanged — and a shortcut insert)."""
    n = 7
    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    events = [(0, 3), (2, 5), (0, 6), (1, 4)]
    st = pair_betweenness_init(
        symmetrize(edges_df(spark, base)), nodes_range(spark, n)
    )
    cur = list(base)
    for u, v in events:
        stats = {}
        st = pair_betweenness_insert(st, u, v, stats=stats)
        cur.append((u, v))
        e2 = symmetrize(edges_df(spark, cur))
        assert _scores(st.scores) == _scores(
            betweenness(e2, nodes_range(spark, n))
        ), (u, v)
        got_pairs = {
            (r["s"], r["t"]): (r["dist"], r["sigma"]) for r in st.pairs.collect()
        }
        assert got_pairs == _apsp(spark, cur, n), (u, v)
        assert stats["affected_pairs"] > 0


def test_insert_joins_components(spark):
    """New-connectivity insert: previously unreachable pairs appear."""
    n = 6
    base = [(0, 1), (1, 2), (3, 4), (4, 5)]
    st = pair_betweenness_init(
        symmetrize(edges_df(spark, base)), nodes_range(spark, n)
    )
    st = pair_betweenness_insert(st, 2, 3)
    cur = base + [(2, 3)]
    e2 = symmetrize(edges_df(spark, cur))
    assert _scores(st.scores) == _scores(betweenness(e2, nodes_range(spark, n)))
    assert {
        (r["s"], r["t"]): (r["dist"], r["sigma"]) for r in st.pairs.collect()
    } == _apsp(spark, cur, n)


def test_readd_existing_edge_is_noop(spark):
    base = [(0, 1), (1, 2)]
    st = pair_betweenness_init(
        symmetrize(edges_df(spark, base)), nodes_range(spark, 3)
    )
    st2 = pair_betweenness_insert(st, 0, 1)
    assert st2 is st


def test_affected_pairs_localized(spark):
    """A shortcut inside one 'arm' of a long path leaves far pairs
    untouched: |affected| well below n^2 — the point of event granularity."""
    n = 12
    base = [(i, i + 1) for i in range(n - 1)]
    st = pair_betweenness_init(
        symmetrize(edges_df(spark, base)), nodes_range(spark, n)
    )
    stats = {}
    st = pair_betweenness_insert(st, 0, 2, stats=stats)  # shortcut at the end
    # pairs whose distance/sigma changed: only those routing through 0-2
    assert 0 < stats["affected_pairs"] < n * n / 2
    e2 = symmetrize(edges_df(spark, base + [(0, 2)]))
    assert _scores(st.scores) == _scores(betweenness(e2, nodes_range(spark, n)))


def test_harmonic_topk_event_updates(spark):
    """DynTopHarmonicCloseness on the pair state: every insert leaves
    harmonic scores equal to a from-scratch run; top-k tracks."""
    from networkit_spark.operators.closeness import closeness
    from networkit_spark.streaming.dyn_centrality import (
        harmonic_topk,
        harmonic_topk_init,
        harmonic_topk_insert,
    )

    n = 8
    base = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 7)]
    st = harmonic_topk_init(
        symmetrize(edges_df(spark, base)), nodes_range(spark, n), k=3
    )
    cur = list(base)
    for u, v in [(3, 4), (0, 7), (2, 6)]:
        st = harmonic_topk_insert(st, u, v)
        cur.append((u, v))
        e2 = symmetrize(edges_df(spark, cur))
        exact = {
            r["node"]: round(r["score"], 9)
            for r in closeness(e2, nodes_range(spark, n), harmonic=True).collect()
        }
        got = {r["node"]: round(r["score"], 9) for r in st.harmonic.collect()}
        assert got == exact, (u, v)
        # top-k contract under float ties: the returned nodes' (rounded)
        # scores are exactly the 3 best rounded scores (tie ORDER between
        # equal scores is not pinned — incremental accumulation differs
        # from scratch recompute in the last ulp)
        topk = [r["node"] for r in harmonic_topk(st).collect()]
        best3 = sorted((round(s, 9) for s in exact.values()), reverse=True)[:3]
        assert sorted((exact[x] for x in topk), reverse=True) == best3


def test_one_node_tracking_matches_bruteforce(spark):
    """DynBetweennessOneNode contract: bcx = sum over pairs (s,t), s,t != x,
    of sigma_x(s,t)/sigma(s,t) — brute-forced with networkx shortest paths,
    before and after an insertion event."""
    import networkx as nx

    from networkit_spark.streaming.dyn_centrality import pair_betweenness_of_node

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3)]
    n, x = 5, 2

    def brute(pairs):
        G = nx.Graph(pairs)
        bcx = 0.0
        for s in G:
            for t in G:
                if s == t or s == x or t == x or not nx.has_path(G, s, t):
                    continue
                paths = list(nx.all_shortest_paths(G, s, t))
                bcx += sum(1 for p in paths if x in p[1:-1]) / len(paths)
        return bcx

    st = pair_betweenness_init(
        symmetrize(edges_df(spark, base)), nodes_range(spark, n)
    )
    assert abs(pair_betweenness_of_node(st, x) - brute(base)) < 1e-9
    st = pair_betweenness_insert(st, 0, 4)
    assert abs(pair_betweenness_of_node(st, x) - brute(base + [(0, 4)])) < 1e-9
