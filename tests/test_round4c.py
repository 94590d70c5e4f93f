"""Round-4 WIP operators vs independent sequential replicas.

* two_phase_l        — TwoPhaseL.cpp replica (same pinned tie-breaks:
                       smallest-id on equal L, ascending-id phase-2 sweep).
* random_spanning_forest — spanning-forest invariants + seed determinism
                       (RandomSpanningForest.cpp Aldous-Broder walk).
* dyn_apsp_*         — DynAPSP.cpp insertion semantics vs full BFS recompute.
* affected_nodes     — AffectedNodes.cpp replica (plain-dict BFS, the same
                       level-histogram convolution recomputed from scratch).
"""

import math
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

INF = float("inf")


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _adj(pairs, directed=False):
    adj = defaultdict(dict)
    for t in pairs:
        a, b, w = t if len(t) == 3 else (*t, 1.0)
        adj[a][b] = w
        if not directed:
            adj[b][a] = w
        else:
            adj.setdefault(b, {})
    return adj


def _bfs(adj, src):
    dist = {src: 0}
    q = deque([src])
    while q:
        x = q.popleft()
        for y in adj.get(x, {}):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def _sym_df(spark, pairs):
    rows = []
    for t in pairs:
        a, b, w = t if len(t) == 3 else (*t, 1.0)
        rows.append((a, b, w))
        rows.append((b, a, w))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _toy(n=20):
    pairs = sorted(
        {(min(i, (i * 3 + 1) % n), max(i, (i * 3 + 1) % n)) for i in range(n)}
        | {(min(i, (i * 7 + 2) % n), max(i, (i * 7 + 2) % n)) for i in range(n)}
    )
    return [(a, b, 1.0) for a, b in pairs if a != b]


# ---------------------------------------------------------------------------
# TwoPhaseL
# ---------------------------------------------------------------------------

def _two_phase_l_replica(pairs, seed):
    """Sequential TwoPhaseL.cpp:13-114 with pinned tie-breaks."""
    adj = _adj(pairs)
    wd = {v: sum(adj[v].values()) for v in adj}
    com = {seed}

    def intdeg(x):
        return sum(w for y, w in adj[x].items() if y in com)

    def stats():
        W = sum(intdeg(x) for x in com) / 2.0
        C = sum(wd[x] - intdeg(x) for x in com)
        B = sum(1 for x in com if wd[x] - intdeg(x) > 1e-12)
        return W, C, B

    # phase 1
    while True:
        W, C, B = stats()
        cur_lin = 2.0 * W / len(com)
        cur_lex = C / B if B else 0.0
        cur_l = cur_lin / cur_lex if cur_lex > 0 else INF
        shell = {y for x in com for y in adj[x]} - com
        best = None
        for v in sorted(shell):
            idg = intdeg(v)
            edg = wd[v] - idg
            uniq = sum(
                1
                for m in com
                if {y for y in adj[m] if y not in com} == {v}
            )
            bc = (1 if edg > 0 else 0) - uniq
            n_lin = 2.0 * (W + idg) / (len(com) + 1)
            den = B + bc
            if den > 0:
                n_lex = (C - idg + edg) / den
                n_l = n_lin / n_lex if n_lex > 0 else INF
            else:
                n_l = -INF
            if n_lin > cur_lin and n_l > cur_l and (
                best is None or n_l > best[0] or (n_l == best[0] and v < best[1])
            ):
                if best is None or n_l > best[0]:
                    best = (n_l, v)
        if best is None:
            break
        com.add(best[1])

    # phase 2: ascending-id sweep over the phase-1 membership
    for x in sorted(com):
        if x not in com or len(com) <= 1:
            continue
        W, C, B = stats()
        cur_lin = 2.0 * W / len(com)
        cur_lex = C / B if B else 0.0
        com.discard(x)
        nW, nC, nB = stats()
        n_lin = 2.0 * nW / len(com) if com else 0.0
        n_lex = nC / nB if nB else 0.0
        if cur_lin > n_lin and cur_lex < n_lex:
            com.add(x)  # keep
    if seed not in com:
        return set()
    return com


CLIQUE_TAIL = [(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)] + [
    (0, 6, 1.0), (6, 7, 1.0), (7, 8, 1.0)
]


def test_two_phase_l_clique_tail(spark):
    from networkit_spark.operators.scd import two_phase_l

    e = _sym_df(spark, CLIQUE_TAIL)
    got = two_phase_l(e, [2])
    mem = {r["node"] for r in got.collect()}
    assert mem == _two_phase_l_replica(CLIQUE_TAIL, 2)
    # phase 2 evicts node 0 (it carries the tail edge, which keeps Lex flat)
    assert mem == {1, 2, 3, 4, 5}


def test_two_phase_l_matches_replica_toy(spark):
    from networkit_spark.operators.scd import two_phase_l

    pairs = _toy()
    e = _sym_df(spark, pairs)
    seeds = [0, 5, 13]
    got = two_phase_l(e, seeds)
    by_seed = defaultdict(set)
    for r in got.collect():
        by_seed[r["seed"]].add(r["node"])
    for s in seeds:
        assert by_seed.get(s, set()) == _two_phase_l_replica(pairs, s), s


def test_two_phase_l_weighted(spark):
    from networkit_spark.operators.scd import two_phase_l

    pairs = [(a, b, 1.0 + ((a * 7 + b) % 3)) for a, b, _ in _toy(16)]
    e = _sym_df(spark, pairs)
    got = two_phase_l(e, [3])
    mem = {r["node"] for r in got.collect()}
    assert mem == _two_phase_l_replica(pairs, 3)


# ---------------------------------------------------------------------------
# RandomSpanningForest
# ---------------------------------------------------------------------------

def test_random_spanning_forest_invariants(spark):
    from networkit_spark.operators.spanning import random_spanning_forest

    # two components: toy(14) plus a disjoint triangle
    pairs = [(a, b) for a, b, _ in _toy(14)] + [(100, 101), (101, 102), (100, 102)]
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs])
    got = random_spanning_forest(e, seed=7)
    rows = [(r["src"], r["dst"]) for r in got.collect()]
    # determinism
    rows2 = [(r["src"], r["dst"])
             for r in random_spanning_forest(e, seed=7).collect()]
    assert rows == rows2
    # forest sizes: n - #components
    adj = _adj(pairs)
    comps = []
    seen = set()
    for v in adj:
        if v in seen:
            continue
        c = set(_bfs(adj, v))
        seen |= c
        comps.append(c)
    assert len(rows) == sum(len(c) - 1 for c in comps)
    # every edge is a real edge; forest is acyclic and spans each component
    eset = {(min(a, b), max(a, b)) for a, b in pairs}
    fadj = defaultdict(set)
    for a, b in rows:
        assert (a, b) in eset
        fadj[a].add(b)
        fadj[b].add(a)
    for c in comps:
        d = _bfs({k: dict.fromkeys(v, 1.0) for k, v in fadj.items()},
                 min(c))
        assert set(d) == c  # spans the component; acyclic by edge count


def test_random_spanning_forest_seed_varies(spark):
    from networkit_spark.operators.spanning import random_spanning_forest

    pairs = [(a, b) for a, b, _ in _toy(18)]
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs])
    r1 = {(r["src"], r["dst"]) for r in random_spanning_forest(e, 1).collect()}
    r2 = {(r["src"], r["dst"]) for r in random_spanning_forest(e, 2).collect()}
    assert r1 != r2  # overwhelmingly likely for a non-tree graph


# ---------------------------------------------------------------------------
# DynAPSP
# ---------------------------------------------------------------------------

def test_dyn_apsp_insert_matches_recompute(spark):
    from networkit_spark.streaming.dyn_centrality import (
        dyn_apsp_distances,
        dyn_apsp_init,
        dyn_apsp_insert,
    )

    pairs = [(a, b) for a, b, _ in _toy(16)]
    nodes = sorted({x for ab in pairs for x in ab})
    ndf = spark.createDataFrame([(v,) for v in nodes], "id long")
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    P = dyn_apsp_init(e, ndf)
    # insert two edges not present
    eset = {(min(a, b), max(a, b)) for a, b in pairs}
    to_add = [t for t in [(0, 9), (2, 13), (1, 14)]
              if (min(t), max(t)) not in eset][:2]
    cur = list(pairs)
    for (u, v) in to_add:
        P = dyn_apsp_insert(P, u, v, directed=False)
        cur.append((u, v))
        got = {
            (r["s"], r["t"]): r["dist"]
            for r in dyn_apsp_distances(P).collect()
        }
        adj = _adj(cur)
        for s in nodes:
            d = _bfs(adj, s)
            for t, dv in d.items():
                assert got.get((s, t)) == dv, (s, t)
        assert len(got) == sum(len(_bfs(adj, s)) for s in nodes)


# ---------------------------------------------------------------------------
# AffectedNodes
# ---------------------------------------------------------------------------

def _hist(dist):
    h = defaultdict(int)
    for v, d in dist.items():
        if 0 < d < INF:
            h[int(d)] += 1
    return dict(h)


def _li(hist_new, hist_prev, max_level):
    jm = max(hist_new, default=0)
    return {
        i: sum(
            (hist_new.get(j, 0) - hist_prev.get(j, 0)) / (i + j)
            for j in range(1, jm + 1)
        )
        for i in range(1, max_level + 1)
    }


def _affected_replica_undirected(pairs_post, u, v, add):
    """AffectedNodes.cpp:31-174 (addition) / :253-287 (removal)."""
    post = _adj(pairs_post)
    old = {k: dict(vv) for k, vv in post.items()}
    if add:
        old[u].pop(v, None)
        old[v].pop(u, None)
    else:
        old.setdefault(u, {})[v] = 1.0
        old.setdefault(v, {})[u] = 1.0
    nodes_all = set(post) | set(old) | {u, v}
    ou, ov = _bfs(old, u), _bfs(old, v)
    nu, nv = _bfs(post, u), _bfs(post, v)

    def g(d, x):
        return d.get(x, INF)

    if add:
        aff_u = {x for x in nodes_all if g(nu, x) < g(ou, x)}
        aff_v = {x for x in nodes_all if g(nv, x) < g(ov, x)}
        dist = {
            x: min(g(ou, x), g(ov, x)) for x in aff_u | aff_v
        }
        comp_u = {x: min(g(ou, x), g(nu, x)) for x in nodes_all}
        comp_v = {x: min(g(ov, x), g(nv, x)) for x in nodes_all}
        li_u = _li(_hist(comp_u), _hist(ou), max(_hist(comp_u), default=0))
        li_v = _li(_hist(comp_v), _hist(ov), max(_hist(comp_v), default=0))
        # swapped: improvement for U-affected nodes indexes by dist-from-V
        li_u_for = _li(_hist(comp_v), _hist(ov), max(_hist(comp_u), default=0))
        li_v_for = _li(_hist(comp_u), _hist(ou), max(_hist(comp_v), default=0))
        imp = {}
        for x in aff_u:
            imp[x] = li_u_for.get(comp_v.get(x, INF), 0.0)
        for x in aff_v:
            imp[x] = li_v_for.get(comp_u.get(x, INF), 0.0)
        return dist, imp
    aff_u = {x for x in nodes_all if g(nu, x) > g(ou, x)}
    aff_v = {x for x in nodes_all if g(nv, x) > g(ov, x)}
    dist = {x: min(g(nu, x), g(nv, x)) for x in aff_u | aff_v}
    return dist, {}


def _check_affected(spark, pairs_post, ev, u, v):
    from networkit_spark.operators.affected import affected_nodes

    post = _sym_df(spark, [(a, b, 1.0) for a, b in pairs_post]).select("src", "dst")
    nodes_df, imp = affected_nodes(post, ev, u, v, directed=False)
    got = {r["node"]: r["dist"] for r in nodes_df.collect()}
    want, want_imp = _affected_replica_undirected(
        pairs_post, u, v, add=(ev == "EDGE_ADDITION")
    )
    assert got == want
    if ev == "EDGE_ADDITION":
        assert set(imp) == set(want_imp)
        for k in imp:
            assert imp[k] == pytest.approx(want_imp[k]), k
    else:
        assert imp == {}


def test_affected_nodes_addition(spark):
    base = [(a, b) for a, b, _ in _toy(16)]
    post = base + [(0, 9)] if (0, 9) not in base else base + [(0, 11)]
    u, v = post[-1]
    _check_affected(spark, post, "EDGE_ADDITION", u, v)


def test_affected_nodes_removal(spark):
    base = [(a, b) for a, b, _ in _toy(16)]
    u, v = base[0]
    post = [t for t in base if t != (u, v)]
    _check_affected(spark, post, "EDGE_REMOVAL", u, v)


def test_affected_nodes_directed_addition(spark):
    from networkit_spark.operators.affected import affected_nodes

    # small directed graph: chain with extra arcs
    arcs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (5, 0), (2, 6)]
    u, v = 0, 3  # new arc
    post = arcs + [(u, v)]
    df = spark.createDataFrame(post, "src long, dst long")
    nodes_df, imp = affected_nodes(df, "EDGE_ADDITION", u, v, directed=True)
    got = {r["node"]: r["dist"] for r in nodes_df.collect()}

    radj_old = defaultdict(dict)
    radj_new = defaultdict(dict)
    fadj_old = defaultdict(dict)
    fadj_new = defaultdict(dict)
    for a, b in arcs:
        radj_old[b][a] = 1.0
        fadj_old[a][b] = 1.0
    for a, b in post:
        radj_new[b][a] = 1.0
        fadj_new[a][b] = 1.0
    nodes_all = {x for ab in post for x in ab}
    ov = _bfs(radj_old, v)
    nv = _bfs(radj_new, v)
    ou_r = _bfs(radj_old, u)
    aff = {x for x in nodes_all if nv.get(x, INF) < ov.get(x, INF)}
    want = {
        x: min(ov.get(x, INF), ou_r.get(x, INF)) for x in aff
    }
    assert got == want
    # improvements: forward from u
    ofu = _bfs(fadj_old, u)
    nfu = _bfs(fadj_new, u)
    comp_u = {x: min(ofu.get(x, INF), nfu.get(x, INF)) for x in nodes_all}
    lvl_v = int(max((nv[x] for x in aff), default=0))
    li_v = _li(_hist(comp_u), _hist(ofu), lvl_v)
    want_imp = {x: li_v.get(int(nv[x]) - 1, 0.0) for x in aff}
    assert set(imp) == set(want_imp)
    for k in imp:
        assert imp[k] == pytest.approx(want_imp[k]), k


def test_affected_nodes_directed_removal(spark):
    from networkit_spark.operators.affected import affected_nodes

    arcs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (5, 0), (0, 3)]
    u, v = 0, 3
    post = [t for t in arcs if t != (u, v)]
    df = spark.createDataFrame(post, "src long, dst long")
    nodes_df, imp = affected_nodes(df, "EDGE_REMOVAL", u, v, directed=True)
    got = {r["node"]: r["dist"] for r in nodes_df.collect()}

    radj_old = defaultdict(dict)
    radj_new = defaultdict(dict)
    for a, b in arcs:
        radj_old[b][a] = 1.0
    for a, b in post:
        radj_new[b][a] = 1.0
    nodes_all = {x for ab in arcs for x in ab}
    ov = _bfs(radj_old, v)
    nv = _bfs(radj_new, v)
    aff = {x for x in nodes_all if nv.get(x, INF) > ov.get(x, INF)}
    want = {x: nv.get(x, INF) for x in aff}
    assert got == want
    assert imp == {}


# ---------------------------------------------------------------------------
# NeighborhoodFunctionHeuristic
# ---------------------------------------------------------------------------

def test_neighborhood_function_heuristic_endpoints(spark):
    from networkit_spark.operators.anf import neighborhood_function_heuristic

    pairs = [(a, b) for a, b, _ in _toy(20)]
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    n = len({x for ab in pairs for x in ab})
    m = len({(min(a, b), max(a, b)) for a, b in pairs})
    # exact diameter
    adj = _adj(pairs)
    dia = max(max(_bfs(adj, s).values()) for s in adj)
    for strategy in ("split", "random"):
        nf = neighborhood_function_heuristic(e, strategy=strategy)
        assert [h for h, _ in nf] == list(range(1, dia + 1))
        assert nf[0][1] == 2 * m
        assert nf[-1][1] == n * (n - 1)
        vals = [v for _, v in nf]
        assert vals[:-1] == sorted(vals[:-1])  # cumulative section monotone


def test_neighborhood_function_heuristic_full_sample_exact(spark):
    """With n_samples = n (every node sampled), interior values must equal
    the exact neighborhood function."""
    from networkit_spark.operators.anf import neighborhood_function_heuristic

    pairs = [(a, b) for a, b, _ in _toy(14)]
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    adj = _adj(pairs)
    n = len(adj)
    nf = neighborhood_function_heuristic(e, n_samples=n)
    # exact: #ordered pairs at distance exactly d, cumulative from 2m
    hist = defaultdict(int)
    for s in adj:
        for t, d in _bfs(adj, s).items():
            if d >= 1:
                hist[d] += 1
    dia = max(hist)
    acc = hist[1]
    for h, v in nf[:-1]:
        if h == 1:
            assert v == hist[1]
        else:
            acc += hist[h]
            assert v == acc, h


# ---------------------------------------------------------------------------
# ChungLu + StochasticBlockmodel
# ---------------------------------------------------------------------------

def test_chung_lu_degree_concentration(spark):
    from networkit_spark.sources.generators import chung_lu

    # 300 nodes in three weight classes
    wts = [(i, 6.0 if i % 3 == 0 else (12.0 if i % 3 == 1 else 24.0))
           for i in range(300)]
    wdf = spark.createDataFrame(wts, "node long, w double")
    g = chung_lu(wdf, seed=11)
    rows = g.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    pairs = {(r["src"], r["dst"]) for r in rows}
    assert all((b, a) in pairs for a, b in pairs)  # symmetric
    # determinism
    assert {(r["src"], r["dst"]) for r in chung_lu(wdf, seed=11).collect()} == pairs
    # per-class mean degree ~ class weight (seeded draw -> fixed outcome,
    # generous +-30% window)
    deg = defaultdict(int)
    for a, _b in pairs:
        deg[a] += 1
    wmap = dict(wts)
    for w in (6.0, 12.0, 24.0):
        cls_nodes = [i for i, ww in wts if ww == w]
        mean = sum(deg.get(i, 0) for i in cls_nodes) / len(cls_nodes)
        assert abs(mean - w) / w < 0.30, (w, mean)
    # total edges ~ S/2
    S = sum(w for _, w in wts)
    assert abs(len(pairs) / 2 - S / 2) / (S / 2) < 0.25


def test_chung_lu_probability_cap(spark):
    from networkit_spark.sources.generators import chung_lu

    # two heavy nodes whose w_u*w_v/S > 1 -> p capped at 1, edge certain
    wts = [(0, 50.0), (1, 50.0)] + [(i, 1.0) for i in range(2, 52)]
    wdf = spark.createDataFrame(wts, "node long, w double")
    pairs = {(r["src"], r["dst"]) for r in chung_lu(wdf, seed=3).collect()}
    assert (0, 1) in pairs


def test_stochastic_blockmodel_block_densities(spark):
    from networkit_spark.sources.generators import stochastic_blockmodel

    n, k = 240, 3
    mem = spark.createDataFrame(
        [(i, i % k) for i in range(n)], "node long, block long"
    )
    aff = [[0.5, 0.02, 0.02], [0.02, 0.5, 0.02], [0.02, 0.02, 0.5]]
    g = stochastic_blockmodel(mem, aff, seed=5)
    rows = [(r["src"], r["dst"]) for r in g.collect() if r["src"] < r["dst"]]
    nb = n // k
    intra_pairs = k * nb * (nb - 1) // 2
    cross_pairs = (n * (n - 1) // 2) - intra_pairs
    intra = sum(1 for a, b in rows if a % k == b % k)
    cross = len(rows) - intra
    assert abs(intra / intra_pairs - 0.5) < 0.08, intra / intra_pairs
    assert abs(cross / cross_pairs - 0.02) < 0.01, cross / cross_pairs
    # determinism
    again = [(r["src"], r["dst"])
             for r in stochastic_blockmodel(mem, aff, seed=5).collect()
             if r["src"] < r["dst"]]
    assert sorted(again) == sorted(rows)


# ---------------------------------------------------------------------------
# DynPrunedLandmarkLabeling
# ---------------------------------------------------------------------------

def test_dyn_pll_insert_exact_distances(spark):
    from networkit_spark.operators.hublabels import (
        dyn_pll_insert,
        hub_distances,
        pll_order,
        pruned_landmark_labels,
    )

    pairs = [(a, b) for a, b, _ in _toy(18)]
    inserts = [t for t in [(0, 9), (2, 15), (4, 11)]
               if (min(t), max(t)) not in {(min(a, b), max(a, b)) for a, b in pairs}][:2]
    base = [t for t in pairs]
    nodes = sorted({x for ab in pairs for x in ab} | {x for ab in inserts for x in ab})
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    bdf = spark.createDataFrame(base, "src long, dst long")
    labels = pruned_landmark_labels(bdf, ndf, batch=8)
    order = pll_order(
        bdf.union(bdf.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct(),
        ndf,
    )
    cur = list(base)
    for (a, b) in inserts:
        cur.append((a, b))
        post = spark.createDataFrame(cur, "src long, dst long")
        labels = dyn_pll_insert(labels, order, post, a, b)
        # every pair answered exactly
        allpairs = (
            spark.createDataFrame([(x,) for x in nodes], "u long")
            .crossJoin(spark.createDataFrame([(x,) for x in nodes], "v long"))
            .filter(F.col("u") < F.col("v"))
        )
        got = {(r["u"], r["v"]): r["dist"]
               for r in hub_distances(labels, allpairs).collect()}
        adj = _adj(cur)
        for s in nodes:
            d = _bfs(adj, s)
            for t, dv in d.items():
                if s < t:
                    assert got.get((s, t)) == dv, (s, t, got.get((s, t)), dv)


# ---------------------------------------------------------------------------
# ApproxGroupBetweenness
# ---------------------------------------------------------------------------

def _md5_draw(tag, seed, *vals):
    import hashlib

    key = "|".join([tag, str(seed)] + [str(v) for v in vals])
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _agb_replica(pairs, n, group_size, L, seed):
    adj = _adj(pairs)
    hyper = []  # (l, node)
    for l in range(L):
        s = _md5_draw("agb_s", seed, l) % n
        t = (s + 1 + _md5_draw("agb_t", seed, l) % (n - 1)) % n
        ds = _bfs(adj, s)
        if t not in ds or ds[t] < 2:
            continue
        cur, lev = t, ds[t]
        while lev >= 2:
            preds = [p for p in adj[cur] if ds.get(p, -9) == lev - 1]
            cur = min(preds, key=lambda p: (_md5_draw("agb_pick", seed, l, lev, p), p))
            lev -= 1
            hyper.append((l, cur))
    group = []
    H = list(hyper)
    for _ in range(group_size):
        if not H:
            break
        cnt = defaultdict(int)
        for _l, x in H:
            cnt[x] += 1
        v = min(cnt, key=lambda x: (-cnt[x], x))
        group.append(v)
        covered = {l for l, x in H if x == v}
        H = [(l, x) for l, x in H if l not in covered]
    i = 0
    while len(group) < group_size and i < n:
        if i not in group:
            group.append(i)
        i += 1
    return group


def test_approx_group_betweenness_matches_replica(spark):
    from networkit_spark.operators.group_centrality import approx_group_betweenness

    pairs = [(a, b) for a, b, _ in _toy(16)]
    n = len({x for ab in pairs for x in ab})
    assert sorted({x for ab in pairs for x in ab}) == list(range(n))
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = approx_group_betweenness(e, ndf, group_size=3, samples=40, seed=9)
    want = _agb_replica(pairs, n, group_size=3, L=40, seed=9)
    assert got == want


def test_approx_group_betweenness_barbell_bridge(spark):
    from networkit_spark.operators.group_centrality import approx_group_betweenness

    # two 5-cliques joined through bridge node 10
    left = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    right = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    bridge = [(4, 10), (10, 5)]
    pairs = left + right + bridge
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    ndf = spark.createDataFrame([(i,) for i in range(11)], "id long")
    got = approx_group_betweenness(e, ndf, group_size=2, samples=120, seed=2)
    assert got == _agb_replica(pairs, 11, group_size=2, L=120, seed=2)
    # every sampled inter-clique path routes through the separator {4,10,5};
    # the greedy must pick from it (4 covers ~everything 10 does, so exact
    # membership depends on the sample draw)
    assert set(got) <= {4, 5, 10}


# ---------------------------------------------------------------------------
# GroupClosenessLocalSearch
# ---------------------------------------------------------------------------

def _group_farness(adj, S):
    tot = 0
    for x in adj:
        d = min((_bfs(adj, m).get(x, 10**9) for m in S), default=10**9)
        if d < 10**9:
            tot += d
    return tot


def test_group_closeness_local_search_improves_and_local_opt(spark):
    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
    )

    pairs = [(a, b) for a, b, _ in _toy(18)]
    adj = _adj(pairs)
    nodes = sorted(adj)
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    start = [0, 1]
    S, far = group_closeness_local_search(e, ndf, start, batch=16)
    assert len(S) == 2 and len(set(S)) == 2
    assert far == _group_farness(adj, S)
    assert far <= _group_farness(adj, start)
    # 1-swap local optimum among shell candidates (the searched move set)
    shell = {y for m in S for y in adj[m]} - set(S)
    for u in S:
        for v in shell:
            S2 = [v if m == u else m for m in S]
            assert _group_farness(adj, S2) >= far, (u, v)


# ---------------------------------------------------------------------------
# PivotMDS
# ---------------------------------------------------------------------------

def test_pivot_mds_matches_numpy_replica(spark):
    import numpy as np

    from networkit_spark.operators.layout import pivot_mds

    pairs = [(a, b) for a, b, _ in _toy(16)]
    adj = _adj(pairs)
    nodes = sorted(adj)
    n = len(nodes)
    k, dim, seed = 6, 2, 4
    e = _sym_df(spark, [(a, b, 1.0) for a, b in pairs]).select("src", "dst")
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {r["node"]: (r["x0"], r["x1"])
           for r in pivot_mds(e, ndf, dim=dim, num_pivots=k, seed=seed).collect()}

    piv = sorted(nodes, key=lambda v: (_md5_draw("pmds_pivot", seed, v), v))[:k]
    D = np.zeros((n, k))
    for j, p in enumerate(piv):
        dd = _bfs(adj, p)
        for i, x in enumerate(nodes):
            D[i, j] = dd.get(x, 0.0)
    rm = D.sum(axis=1) / k
    cm = D.sum(axis=0) / n
    grand = rm.sum() / (2.0 * n) + cm.sum() / (2.0 * k)
    C = D - rm[:, None] - cm[None, :] + grand
    G = C.T @ C
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1][:dim]
    E = vecs[:, order]
    for c in range(dim):
        lead = int(np.argmax(np.abs(E[:, c])))
        if E[lead, c] < 0:
            E[:, c] = -E[:, c]
    want = C @ E
    for i, x in enumerate(nodes):
        assert got[x][0] == pytest.approx(want[i, 0], abs=1e-6), x
        assert got[x][1] == pytest.approx(want[i, 1], abs=1e-6), x


# ---------------------------------------------------------------------------
# SNAP writer + DOT partition writer
# ---------------------------------------------------------------------------

def test_write_snap_roundtrip(spark, tmp_path):
    from networkit_spark.sources.edgelist import write_snap

    pairs = sorted({(min(a, b), max(a, b)) for a, b, _ in _toy(14)})
    e = spark.createDataFrame(pairs, "src long, dst long")
    n = len({x for ab in pairs for x in ab})
    out = str(tmp_path / "snap_out")
    write_snap(e, n, out)
    import glob

    f = glob.glob(out + "/part-*")[0]
    lines = open(f).read().strip().split("\n")
    # DIMACS-style problem line, then "u v" per edge (SNAPGraphWriter.cpp:20)
    assert lines[0] == f"p {n} {len(pairs)} u u 0"
    got = sorted(tuple(int(t) for t in ln.split()) for ln in lines[1:])
    assert got == pairs


def test_write_dot_partition(spark, tmp_path):
    from networkit_spark.sources.partitions import write_dot_partition

    pairs = sorted({(min(a, b), max(a, b)) for a, b, _ in _toy(12)})
    e = spark.createDataFrame(pairs, "src long, dst long")
    nodes = sorted({x for ab in pairs for x in ab})
    labels = spark.createDataFrame([(x, x % 3) for x in nodes], "node long, label long")
    out = str(tmp_path / "dotp_out")
    write_dot_partition(e, labels, out)
    import glob

    f = glob.glob(out + "/part-*")[0]
    txt = open(f).read()
    lines = txt.strip().split("\n")
    assert lines[0] == "graph {" and lines[-1] == "}"
    # every non-isolated node gets a filled/hue line; every edge one line
    assert sum(1 for x in lines if "style=filled" in x) == len(nodes)
    assert sum(1 for x in lines if " -- " in x) == len(pairs)
    # 3 clusters -> hues 0, 1/3, 2/3
    assert 'color="0.0,0.99,0.99"' in txt
    assert f'color="{1/3},0.99,0.99"' in txt


# ---------------------------------------------------------------------------
# Dynamic generators (event streams)
# ---------------------------------------------------------------------------

def test_dynamic_path_events(spark):
    from networkit_spark.sources.dynamic_generators import dynamic_path_events

    ev = dynamic_path_events(spark, 5).collect()
    types = [r["etype"] for r in ev]
    assert types.count("TIME_STEP") == 5
    assert types.count("NODE_ADDITION") == 6
    adds = [(r["u"], r["v"]) for r in ev if r["etype"] == "EDGE_ADDITION"]
    assert adds == [(i, i + 1) for i in range(5)]
    # seq strictly increasing in emit order
    assert [r["seq"] for r in ev] == sorted(r["seq"] for r in ev)


def test_dynamic_dorogovtsev_mendes_events(spark):
    from networkit_spark.sources.dynamic_generators import (
        dynamic_dorogovtsev_mendes_events,
        events_to_edges,
    )

    ev = dynamic_dorogovtsev_mendes_events(spark, 10, seed=3)
    rows = ev.collect()
    assert sum(1 for r in rows if r["etype"] == "TIME_STEP") == 11
    edges = [(r["src"], r["dst"]) for r in events_to_edges(ev).collect()]
    assert len(edges) == 3 + 2 * 10  # triangle + 2 per step
    # each step's new node attaches to both endpoints of an existing edge
    eset = {(0, 1), (1, 2), (2, 0)}
    eset |= {(min(a, b), max(a, b)) for a, b in eset}
    by_node = defaultdict(list)
    for a, b in edges[3:]:
        by_node[a].append(b)
    prev = {(min(a, b), max(a, b)) for a, b in edges[:3]}
    for u in sorted(by_node):
        s, t = by_node[u]
        assert (min(s, t), max(s, t)) in prev, u
        prev |= {(min(u, s), max(u, s)), (min(u, t), max(u, t))}
    # determinism
    again = [(r["src"], r["dst"]) for r in events_to_edges(
        dynamic_dorogovtsev_mendes_events(spark, 10, seed=3)).collect()]
    assert again == edges


def test_dynamic_forest_fire_events(spark):
    from networkit_spark.sources.dynamic_generators import (
        dynamic_forest_fire_events,
        events_to_edges,
    )

    ev = dynamic_forest_fire_events(spark, 12, p=0.4, seed=6)
    rows = ev.collect()
    assert sum(1 for r in rows if r["etype"] == "TIME_STEP") == 12
    edges = [(r["src"], r["dst"]) for r in events_to_edges(ev).collect()]
    # every new node connects to at least its ambassador, to OLDER nodes only
    seen_nodes = {0}
    by_node = defaultdict(set)
    for a, b in edges:
        by_node[a].add(b)
    for v in range(1, 12):
        assert by_node[v], v
        assert all(w < v for w in by_node[v]), v
    # determinism
    again = [(r["src"], r["dst"]) for r in events_to_edges(
        dynamic_forest_fire_events(spark, 12, p=0.4, seed=6)).collect()]
    assert again == edges


# ---------------------------------------------------------------------------
# DynamicBSuitorMatcher
# ---------------------------------------------------------------------------

def test_dyn_b_suitor_matches_recompute(spark):
    from networkit_spark.operators.bmatching import (
        b_suitor_matching,
        dyn_b_suitor_update,
    )

    # distinct weights via a hash-ish formula
    pairs = [(a, b, 1.0 + ((a * 131 + b * 17) % 97) + 0.01 * a + 0.001 * b)
             for a, b, _ in _toy(16)]
    df = spark.createDataFrame(pairs, "src long, dst long, weight double")
    cur = b_suitor_matching(df, 2)
    eset = {(a, b) for a, b, _ in pairs}

    def canon(rows):
        return sorted((r["u"], r["v"], round(r["weight"], 6)) for r in rows)

    # insertion
    ins = next((a, b) for a in range(16) for b in range(a + 1, 16)
               if (a, b) not in eset and (b, a) not in eset)
    w_new = 55.5555
    pairs2 = pairs + [(*ins, w_new)]
    df2 = spark.createDataFrame(pairs2, "src long, dst long, weight double")
    got = dyn_b_suitor_update(cur, df2, 2, w_new)
    want = b_suitor_matching(df2, 2)
    assert canon(got.collect()) == canon(want.collect())

    # removal of a currently-matched edge
    cur2 = got
    rm = canon(cur2.collect())[0]
    pairs3 = [t for t in pairs2 if not (t[0] == rm[0] and t[1] == rm[1])]
    df3 = spark.createDataFrame(pairs3, "src long, dst long, weight double")
    got3 = dyn_b_suitor_update(cur2.filter(
        ~((F.col("u") == rm[0]) & (F.col("v") == rm[1]))), df3, 2, rm[2])
    want3 = b_suitor_matching(df3, 2)
    assert canon(got3.collect()) == canon(want3.collect())


# ---------------------------------------------------------------------------
# AlgebraicDistanceIndex (link-prediction pair scores)
# ---------------------------------------------------------------------------

def test_algebraic_distance_pairs_matches_replica(spark):
    import hashlib

    from networkit_spark.operators.algebraic import algebraic_distance_pairs

    pairs = [(a, b, 1.0) for a, b, _ in _toy(12)]
    adj = _adj(pairs)
    nodes = sorted(adj)
    K, IT, OM, SEED = 3, 5, 0.5, 9
    e = _sym_df(spark, pairs)
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    qp = [(0, 5), (1, 7), (2, 2), (3, 9)]
    qdf = spark.createDataFrame(qp, "u long, v long")
    got = {(r["u"], r["v"]): r["score"]
           for r in algebraic_distance_pairs(e, ndf, qdf, K, IT, OM, SEED).collect()}

    def u01(node, sysi):
        key = f"ad{SEED}|{node}|{sysi}"
        return int(hashlib.md5(key.encode()).hexdigest()[:13], 16) / float(1 << 52)

    loads = {(x, s): u01(x, s) for x in nodes for s in range(K)}
    wd = {x: sum(adj[x].values()) for x in nodes}
    for _ in range(IT):
        new = {}
        for x in nodes:
            for s in range(K):
                acc = sum(w * loads[(y, s)] for y, w in adj[x].items())
                new[(x, s)] = (1 - OM) * loads[(x, s)] + OM * acc / wd[x]
        loads = new
    for (a, b) in qp:
        want = sum(abs(loads[(a, s)] - loads[(b, s)]) ** 2 for s in range(K)) ** 0.5
        assert got[(a, b)] == pytest.approx(want, rel=1e-9), (a, b)


# ---------------------------------------------------------------------------
# PubWebGenerator
# ---------------------------------------------------------------------------

def test_pubweb_graph_matches_bruteforce(spark):
    from networkit_spark.sources.generators import pubweb_graph, pubweb_points

    n, areas, rad, maxn, seed = 120, 3, 0.15, 4, 5
    pts = {r["node"]: (r["x"], r["y"])
           for r in pubweb_points(spark, n, areas, seed).collect()}
    assert len(pts) == n
    assert all(0.0 <= x <= 1.0 and 0.0 <= y <= 1.0 for x, y in pts.values())

    def sqd(a, b):
        dx = abs(pts[a][0] - pts[b][0])
        dy = abs(pts[a][1] - pts[b][1])
        dx = min(dx, 1.0 - dx)
        dy = min(dy, 1.0 - dy)
        return dx * dx + dy * dy

    sel = {}
    for u in pts:
        cands = sorted(
            ((sqd(u, v), v) for v in pts if v != u and sqd(u, v) <= rad * rad)
        )
        sel[u] = {v for _, v in cands[:maxn]}
    want = {}
    for u in pts:
        for v in sel[u]:
            if u in sel[v] and u < v:
                want[(u, v)] = 0.01 / sqd(u, v)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in pubweb_graph(spark, n, areas, rad, maxn, seed).collect()
        if r["src"] < r["dst"]
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    assert len(got) > 0


def test_mocnik_graph_matches_bruteforce(spark):
    from networkit_spark.sources.generators import mocnik_graph, mocnik_points

    n, k, seed = 100, 2.5, 8
    pts = {r["node"]: (r["x"], r["y"])
           for r in mocnik_points(spark, n, seed).collect()}
    assert len(pts) == n
    assert all((x - .5) ** 2 + (y - .5) ** 2 < .25 for x, y in pts.values())

    def dist(a, b):
        return ((pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2) ** .5

    want = set()
    for u in pts:
        dmin = min(dist(u, v) for v in pts if v != u)
        for v in pts:
            if v != u and dist(u, v) <= k * dmin:
                want.add((u, v))
    got = {(r["src"], r["dst"]) for r in mocnik_graph(spark, n, k, seed).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# LeftRightPlanarityCheck
# ---------------------------------------------------------------------------

def test_lr_planarity_core_vs_networkx():
    import random

    nx = pytest.importorskip("networkx")
    from networkit_spark.operators.planarity import _lr_planar_component

    def check(G):
        for comp in nx.connected_components(G):
            sub = G.subgraph(comp)
            adj = {v: sorted(sub.neighbors(v)) for v in sub.nodes}
            if not _lr_planar_component(adj):
                return False
        return True

    fixed = [nx.complete_graph(5), nx.complete_bipartite_graph(3, 3),
             nx.grid_2d_graph(5, 6), nx.petersen_graph(), nx.wheel_graph(9),
             nx.dodecahedral_graph(), nx.balanced_tree(2, 4)]
    for G in fixed:
        G = nx.convert_node_labels_to_integers(G)
        assert check(G) == nx.check_planarity(G)[0], G
    rng = random.Random(7)
    for _ in range(80):
        n = rng.randint(5, 30)
        m = rng.randint(n - 1, min(3 * n, n * (n - 1) // 2))
        G = nx.gnm_random_graph(n, m, seed=rng.randint(0, 10 ** 9))
        assert check(G) == nx.check_planarity(G)[0], sorted(G.edges)


def test_is_planar_spark_paths(spark):
    from networkit_spark.operators.planarity import is_planar

    # dense -> Euler bound rejects without collecting
    dense = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    e = spark.createDataFrame(dense, "src long, dst long")
    assert is_planar(e) is False
    # grid -> planar
    grid = []
    W = 5
    for i in range(W):
        for j in range(W):
            v = i * W + j
            if j + 1 < W:
                grid.append((v, v + 1))
            if i + 1 < W:
                grid.append((v, v + W))
    assert is_planar(spark.createDataFrame(grid, "src long, dst long")) is True
    # K5 (passes Euler bound, LR rejects)
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    assert is_planar(spark.createDataFrame(k5, "src long, dst long")) is False


# ---------------------------------------------------------------------------
# RasterReader
# ---------------------------------------------------------------------------

def test_read_raster(spark, tmp_path):
    from networkit_spark.sources.raster import read_raster

    content = "\n".join([
        "ncols         3",
        "nrows         2",
        "xllcorner     0.0",
        "yllcorner     0.0",
        "cellsize      1.0",
        "NODATA_value  -9999",
        "2 0 1",
        "0 3 0",
    ])
    p = tmp_path / "grid.asc"
    p.write_text(content)
    pts = read_raster(spark, str(p), normalization_factor=1.0).collect()
    assert len(pts) == 6  # 2 + 1 + 3
    # cell (0,0): x in [0,1), y in [0,1); cell (0,2): x in [2,3)
    in00 = [r for r in pts if 0 <= r["x"] < 1 and 0 <= r["y"] < 1]
    in02 = [r for r in pts if 2 <= r["x"] < 3 and 0 <= r["y"] < 1]
    in11 = [r for r in pts if 1 <= r["x"] < 2 and -1 <= r["y"] < 0]
    assert len(in00) == 2 and len(in02) == 1 and len(in11) == 3
    # normalization halves the counts (round)
    pts2 = read_raster(spark, str(p), normalization_factor=0.5).collect()
    # std::round semantics (half away from zero): round(1)=1, round(.5)=1,
    # round(1.5)=2 -> 4 points
    assert len(pts2) == 4
