"""ComplexPathAlgorithm (ComplexPaths.cpp) vs a from-scratch replica.

Replica follows the deterministic helper-seed rule documented in the
operator (smallest-id neighbors, then smallest-id distinct distance-2
nodes) and the reference's synchronous spread: influence snapshots are
taken per round (ComplexPaths.cpp:146-168)."""

from collections import defaultdict

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.complexpaths import (
    complex_path_graphs,
    complex_path_lengths,
)


def _replica(pairs, seed, threshold, max_rounds=100):
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    need = threshold - 1
    helpers = sorted(adj[seed])[:need]
    if len(helpers) < need:
        pool = sorted(
            {x for nb in adj[seed] for x in adj[nb] if x != seed} - set(helpers)
        )
        helpers += pool[: need - len(helpers)]
    activated = {seed, *helpers}
    adopters = {u: 0 for u in activated}
    cg = {(min(u, v), max(u, v)) for u in activated for v in adj[u]}
    for rnd in range(1, max_rounds + 1):
        deg = defaultdict(int)
        for a, b in cg:
            deg[a] += 1
            deg[b] += 1
        fresh = {x for x, d in deg.items() if d >= threshold and x not in activated}
        if not fresh:
            break
        for x in fresh:
            adopters[x] = rnd
        activated |= fresh
        cg |= {(min(u, v), max(u, v)) for u in fresh for v in adj[u]}
    return cg, adopters


TOY = sorted(
    {(min(i, (i * 3 + 1) % 15), max(i, (i * 3 + 1) % 15)) for i in range(15)}
    | {(min(i, (i * 7 + 2) % 15), max(i, (i * 7 + 2) % 15)) for i in range(15)}
)
TOY = [(a, b) for a, b in TOY if a != b]


def test_single_seed_matches_replica(spark):
    e = symmetrize(edges_df(spark, TOY))
    for seed, t in [(0, 2), (0, 3), (5, 3)]:
        seeds = spark.createDataFrame([(seed,)], "id long")
        cg, ad = complex_path_graphs(e, seeds, threshold=t)
        got_cg = {(r["src"], r["dst"]) for r in cg.collect()}
        got_ad = {(r["node"], r["round"]) for r in ad.collect()}
        exp_cg, exp_ad = _replica(TOY, seed, t)
        assert got_cg == exp_cg, (seed, t)
        assert got_ad == set(exp_ad.items()), (seed, t)


def test_batched_all_seeds_consistent(spark):
    """The batched all-seeds build equals per-seed runs."""
    e = symmetrize(edges_df(spark, TOY))
    nodes = nodes_range(spark, 15)
    cg, _ = complex_path_graphs(e, nodes.select("id"), threshold=3)
    per_sid = defaultdict(set)
    for r in cg.collect():
        per_sid[r["sid"]].add((r["src"], r["dst"]))
    for seed in range(15):
        exp_cg, _ = _replica(TOY, seed, 3)
        assert per_sid.get(seed, set()) == exp_cg, seed


def test_plci_matches_replica_bfs(spark):
    e = symmetrize(edges_df(spark, TOY))
    nodes = nodes_range(spark, 15)
    got = {r["node"]: r["plci"] for r in
           complex_path_lengths(e, nodes, threshold=3).collect()}
    for seed in range(15):
        cg, _ = _replica(TOY, seed, 3)
        adj = defaultdict(set)
        for a, b in cg:
            adj[a].add(b)
            adj[b].add(a)
        dist = {seed: 0}
        frontier = [seed]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        expect = sum(dist.values()) / 15.0
        assert abs(got[seed] - expect) < 1e-12, seed


def test_plci_normalized_range(spark):
    e = symmetrize(edges_df(spark, TOY))
    out = complex_path_lengths(e, nodes_range(spark, 15), threshold=3, normalize=True)
    vals = [r["plci"] for r in out.collect()]
    assert min(vals) == 0.0 and max(vals) == 1.0
