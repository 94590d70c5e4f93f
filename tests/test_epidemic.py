"""SEIR epidemic simulation vs a sequential Python replica of the synchronous
semantics (EpidemicSimulationSEIR.cpp dynamics, deterministic md5 draws)."""

import hashlib
from collections import Counter, defaultdict

from networkit_spark.graph import edges_df, nodes_range, symmetrize
from networkit_spark.operators.epidemic import seir_simulation


def _replica(edges, n, t_max, trans_p, e_time, i_time, zero, seed=42):
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    state = {v: 0 for v in range(n)}
    ts = {v: 0 for v in range(n)}
    state[zero] = 2
    thr = int(trans_p * 1_000_000)

    def draw(s, d, t):
        h = int(hashlib.md5(f"seir{seed}|{s}|{d}|{t}".encode()).hexdigest()[:15], 16)
        return h % 1_000_000 < thr

    out = []
    for t in range(t_max):
        exposed = {
            v
            for u in range(n)
            if state[u] == 2
            for v in adj[u]
            if state[v] == 0 and draw(u, v, t)
        }
        ns, nts = dict(state), dict(ts)
        for v in range(n):
            if state[v] == 0 and v in exposed:
                ns[v], nts[v] = 1, t
            elif state[v] == 1 and t - ts[v] >= e_time:
                ns[v], nts[v] = 2, t
            elif state[v] == 2 and t - ts[v] >= i_time:
                ns[v], nts[v] = 3, t
        state, ts = ns, nts
        c = Counter(state.values())
        for s in range(4):
            out.append((zero, t, s, c.get(s, 0)))
    return out


def test_seir_path_deterministic_spread(spark):
    # directed path 0->1->2->3->4, transP=1: with eTime=1, iTime=1 the wave
    # advances one hop every 2 steps (expose, incubate, infect next).
    n, t_max = 5, 8
    pairs = [(i, i + 1) for i in range(n - 1)]
    e = edges_df(spark, pairs)
    got = sorted(
        tuple(r)
        for r in seir_simulation(
            e, nodes_range(spark, n), t_max, 1.0, 1, 1, zero=0
        ).collect()
    )
    want = sorted(_replica(pairs, n, t_max, 1.0, 1, 1, 0))
    assert got == want
    # removed population is monotone non-decreasing
    rem = [c for (_, t, s, c) in sorted(want, key=lambda r: r[1]) if s == 3]
    assert rem == sorted(rem)


def test_seir_matches_replica_probabilistic(spark):
    # small random-ish undirected graph, 0 < transP < 1
    n, t_max = 20, 10
    pairs = [(i, (i * 3 + 1) % n) for i in range(n)] + [
        (i, (i * 5 + 2) % n) for i in range(n)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    sym = pairs + [(b, a) for a, b in pairs]
    e = symmetrize(edges_df(spark, pairs))
    got = sorted(
        tuple(r)
        for r in seir_simulation(
            e, nodes_range(spark, n), t_max, 0.4, 2, 3, zero=1, seed=7
        ).collect()
    )
    want = sorted(_replica(set(sym), n, t_max, 0.4, 2, 3, 1, seed=7))
    assert got == want
    # populations always sum to n
    by_t = defaultdict(int)
    for (_, t, _, c) in got:
        by_t[t] += c
    assert all(v == n for v in by_t.values())
