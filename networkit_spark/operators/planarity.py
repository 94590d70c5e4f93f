"""Left-Right planarity test.

Reference: ``cpp/planarity/LeftRightPlanarityCheck.cpp`` (Brandes' LR
algorithm, public: "The Left-Right Planarity Test", Brandes 2009).  The
test is two DFS passes with a conflict-pair stack — inherently sequential
pointer machinery, so it runs driver-side on the collected adjacency
(guarded), after the distributed O(1) Euler-bound pre-checks:
``m > 3n - 6`` rejects immediately without collecting anything, and each
connected component is tested independently (planarity is per-component).

Only the boolean verdict is computed (the reference likewise exposes
``isPlanar()``; no embedding is extracted).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INF = float("inf")


class _Interval:
    __slots__ = ("low", "high")

    def __init__(self, low=None, high=None):
        self.low = low
        self.high = high

    def empty(self):
        return self.low is None and self.high is None

    def copy(self):
        return _Interval(self.low, self.high)


class _ConflictPair:
    __slots__ = ("L", "R")

    def __init__(self, L=None, R=None):
        self.L = L if L is not None else _Interval()
        self.R = R if R is not None else _Interval()

    def swap(self):
        self.L, self.R = self.R, self.L


def _lr_planar_component(adj: dict[int, list[int]]) -> bool:
    """LR test on ONE connected component given as a symmetric adjacency."""
    nodes = sorted(adj)
    n = len(nodes)
    m = sum(len(v) for v in adj.values()) // 2
    if n < 5 or m < 9:
        return True
    if m > 3 * n - 6:
        return False

    height = {v: None for v in nodes}
    lowpt: dict = {}
    lowpt2: dict = {}
    nesting: dict = {}
    parent_edge = {v: None for v in nodes}
    oriented: set = set()

    sys.setrecursionlimit(max(10000, 4 * n + 1000))

    def dfs1(v):
        e = parent_edge[v]
        for w in adj[v]:
            if (v, w) in oriented or (w, v) in oriented:
                continue
            ei = (v, w)
            oriented.add(ei)
            lowpt[ei] = height[v]
            lowpt2[ei] = height[v]
            if height[w] is None:  # tree edge
                parent_edge[w] = ei
                height[w] = height[v] + 1
                dfs1(w)
            else:  # back edge
                lowpt[ei] = height[w]
            nesting[ei] = 2 * lowpt[ei]
            if lowpt2[ei] < height[v]:
                nesting[ei] += 1  # chordal
            if e is not None:
                if lowpt[ei] < lowpt[e]:
                    lowpt2[e] = min(lowpt[e], lowpt2[ei])
                    lowpt[e] = lowpt[ei]
                elif lowpt[ei] > lowpt[e]:
                    lowpt2[e] = min(lowpt2[e], lowpt[ei])
                else:
                    lowpt2[e] = min(lowpt2[e], lowpt2[ei])

    root = nodes[0]
    height[root] = 0
    dfs1(root)

    # ordered adjacency by nesting depth
    ordered = {
        v: sorted(
            [w for w in adj[v] if (v, w) in oriented],
            key=lambda w: nesting[(v, w)],
        )
        for v in nodes
    }

    S: list[_ConflictPair] = []
    stack_bottom: dict = {}
    lowpt_edge: dict = {}
    ref: dict = {}
    side: dict = {}

    def top_pair():
        return S[-1] if S else None

    def conflicting(I, b):
        return (not I.empty()) and lowpt[I.high] > lowpt[b]

    def lowest(P):
        if P.L.empty():
            return lowpt[P.R.low]
        if P.R.empty():
            return lowpt[P.L.low]
        return min(lowpt[P.L.low], lowpt[P.R.low])

    def add_constraints(ei, e):
        P = _ConflictPair()
        # merge return edges of ei into P.R
        while True:
            Q = S.pop()
            if not Q.L.empty():
                Q.swap()
            if not Q.L.empty():
                return False
            if lowpt[Q.R.low] > lowpt[e]:
                if P.R.empty():
                    P.R.high = Q.R.high
                else:
                    ref[P.R.low] = Q.R.high
                P.R.low = Q.R.low
            else:
                ref[Q.R.low] = lowpt_edge[e]
            if top_pair() is stack_bottom[ei]:
                break
        # merge conflicting return edges of e_1..e_{i-1} into P.L
        while conflicting(S[-1].L, ei) or conflicting(S[-1].R, ei):
            Q = S.pop()
            if conflicting(Q.R, ei):
                Q.swap()
            if conflicting(Q.R, ei):
                return False
            # merge below-lowpt(ei) interval of Q.R into P.R
            if P.R.low is not None:
                ref[P.R.low] = Q.R.high
            if Q.R.low is not None:
                P.R.low = Q.R.low
            if P.L.empty():
                P.L.high = Q.L.high
            else:
                ref[P.L.low] = Q.L.high
            P.L.low = Q.L.low
        if not (P.L.empty() and P.R.empty()):
            S.append(P)
        return True

    def trim_back_edges(u):
        # drop entries whose lowest return point is u
        while S and lowest(S[-1]) == height[u]:
            P = S.pop()
            if P.L.low is not None:
                side[P.L.low] = -1
        if S:
            P = S.pop()
            while P.L.high is not None and P.L.high[1] == u:
                P.L.high = ref.get(P.L.high)
            if P.L.high is None and P.L.low is not None:
                ref[P.L.low] = P.R.low
                side[P.L.low] = -1
                P.L.low = None
            while P.R.high is not None and P.R.high[1] == u:
                P.R.high = ref.get(P.R.high)
            if P.R.high is None and P.R.low is not None:
                ref[P.R.low] = P.L.low
                side[P.R.low] = -1
                P.R.low = None
            S.append(P)

    def dfs2(v):
        e = parent_edge[v]
        first = True
        for w in ordered[v]:
            ei = (v, w)
            stack_bottom[ei] = top_pair()
            if ei == parent_edge.get(w):  # tree edge
                if not dfs2(w):
                    return False
            else:  # back edge
                lowpt_edge[ei] = ei
                S.append(_ConflictPair(R=_Interval(ei, ei)))
            if lowpt[ei] < height[v]:  # ei has a return edge
                if first:
                    lowpt_edge[e] = lowpt_edge[ei]
                else:
                    if not add_constraints(ei, e):
                        return False
            first = False
        if e is not None:
            u = e[0]
            trim_back_edges(u)
            if lowpt[e] < height[u]:  # e has a return edge
                hl = S[-1].L.high
                hr = S[-1].R.high
                if hl is not None and (hr is None or lowpt[hl] > lowpt[hr]):
                    ref[e] = hl
                else:
                    ref[e] = hr
        return True

    return dfs2(root)


def euler_precheck(und_edges: DataFrame) -> tuple[int, int, bool]:
    """(n, m, reject): the distributed O(1)-aggregate Euler-bound pre-check
    ``m > 3n - 6`` shared by :func:`is_planar` — two aggregates over the
    canonicalized simple edge set, no collect."""
    e = und_edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    m = canon.count()
    n = (
        canon.select(F.col("a").alias("n"))
        .union(canon.select(F.col("b").alias("n")))
        .distinct()
        .count()
    )
    return n, m, bool(n > 2 and m > 3 * n - 6)


def is_planar(und_edges: DataFrame, max_nodes: int = 200_000) -> bool:
    """LR planarity of the whole graph (``LeftRightPlanarityCheck.cpp``).

    Distributed pre-checks first: the Euler bound ``m > 3n - 6`` rejects
    from two aggregates without collecting; otherwise the graph is at most
    ~3n rows, collected per connected component and tested sequentially
    (the conflict-pair stack machinery is inherently sequential — but the
    Euler bound caps the collected volume at O(n)).
    """
    n, m, reject = euler_precheck(und_edges)
    if reject:
        return False
    if n > max_nodes:
        raise ValueError(
            f"is_planar collects the (Euler-bounded) edge list to the "
            f"driver; guarded at {max_nodes} nodes, got {n}"
        )
    e = und_edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    rows = canon.collect()
    adj: dict[int, list[int]] = {}
    for r in rows:
        adj.setdefault(r["a"], []).append(r["b"])
        adj.setdefault(r["b"], []).append(r["a"])
    for v in adj:
        adj[v].sort()
    # per-component
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp = [start]
        cset = {start}
        qi = 0
        while qi < len(comp):
            for y in adj[comp[qi]]:
                if y not in cset:
                    cset.add(y)
                    comp.append(y)
            qi += 1
        seen |= cset
        sub = {v: adj[v] for v in comp}
        if not _lr_planar_component(sub):
            return False
    return True
