"""DynApproxBetweenness (event-granular RK sample maintenance)."""

import networkx as nx
from pyspark.sql import functions as F

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.approx_betweenness import approx_betweenness
from networkit_spark.streaming.dyn_centrality import (
    dyn_approx_betweenness_init,
    dyn_approx_betweenness_update,
    dyn_approx_scores,
)

BASE = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (1, 3)]
N = 8  # nodes 6, 7 in a separate component pair
BASE2 = BASE + [(6, 7)]


def _ev(spark, pairs):
    return symmetrize(edges_df(spark, pairs))


def test_init_equals_static_sampler(spark):
    e = _ev(spark, BASE2)
    nodes = nodes_range(spark, N)
    st = dyn_approx_betweenness_init(e, nodes, eps=0.15, delta=0.2, seed=11)
    stat, r = approx_betweenness(e, nodes, eps=0.15, delta=0.2, seed=11)
    assert st.r == r
    dyn = {x["node"]: round(x["score"], 12) for x in dyn_approx_scores(st).collect()}
    ref = {x["node"]: round(x["score"], 12) for x in stat.collect() if x["score"] > 0}
    assert dyn == ref


def test_update_covers_every_changed_pair_and_stays_valid(spark):
    """(a) every sample whose pair distance changed is in the re-walked
    set (affectedness is a superset of pair changes — the soundness
    requirement); (b) post-event scores remain a valid eps estimator."""
    e = _ev(spark, BASE2)
    nodes = nodes_range(spark, N)
    st = dyn_approx_betweenness_init(e, nodes, eps=0.15, delta=0.2, seed=11)
    stats = {}
    st2 = dyn_approx_betweenness_update(st, _ev(spark, [(5, 6)]), stats=stats)

    G, G2 = nx.Graph(BASE2), nx.Graph(BASE2 + [(5, 6)])

    def d(g, a, b):
        return nx.shortest_path_length(g, a, b) if nx.has_path(g, a, b) else None

    changed = {
        r["sid"] for r in st.samples.collect()
        if d(G, r["u"], r["v"]) != d(G2, r["u"], r["v"])
    }
    assert len(changed) > 0  # the event connects the components
    assert stats["affected_samples"] >= len(changed)

    from networkit_spark.operators.betweenness import betweenness

    exact = {
        r["node"]: r["score"]
        for r in betweenness(_ev(spark, BASE2 + [(5, 6)]), nodes).collect()
    }
    got = {r["node"]: r["score"] for r in dyn_approx_scores(st2).collect()}
    for v in range(N):
        expect = exact.get(v, 0.0) / (N * (N - 1))
        assert abs(got.get(v, 0.0) - expect) < 3 * 0.15, v


def test_update_noop_on_existing_edge(spark):
    e = _ev(spark, BASE2)
    st = dyn_approx_betweenness_init(e, nodes_range(spark, N), eps=0.2, delta=0.2, seed=4)
    st2 = dyn_approx_betweenness_update(st, _ev(spark, [(0, 1)]))
    assert st2 is st


def test_unaffected_samples_keep_paths(spark):
    """Insert an edge in the {6,7} component: no sample with source in the
    big component is re-walked (their contribs rows survive verbatim)."""
    pairs = BASE + [(6, 7), (7, 0)]  # connect so samples can span; then add inside
    e = _ev(spark, pairs)
    st = dyn_approx_betweenness_init(e, nodes_range(spark, N), eps=0.2, delta=0.2, seed=9)
    stats = {}
    st2 = dyn_approx_betweenness_update(st, _ev(spark, [(2, 4)]), stats=stats)
    G, G2 = nx.Graph(pairs), nx.Graph(pairs + [(2, 4)])
    aff_sources = {
        s for s in {r["u"] for r in st.samples.collect()}
        if any(
            nx.has_path(G, s, a)
            and (
                not nx.has_path(G, s, b)
                or nx.shortest_path_length(G, s, a) + 1
                <= nx.shortest_path_length(G, s, b)
            )
            for a, b in [(2, 4), (4, 2)]
        )
    }
    keep_sids = {r["sid"] for r in st.samples.collect() if r["u"] not in aff_sources}
    old = {(x["sid"], x["node"]) for x in st.contribs.collect() if x["sid"] in keep_sids}
    new = {(x["sid"], x["node"]) for x in st2.contribs.collect() if x["sid"] in keep_sids}
    assert old == new
    assert stats["affected_samples"] == st.samples.count() - len(keep_sids)
