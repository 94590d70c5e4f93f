"""Distributed maximal-clique enumeration.

Reference: ``cpp/clique/MaximalCliques.cpp`` — degeneracy-ordered
Bron-Kerbosch with pivoting (Eppstein-Löffler-Strash), single-machine over
a CSR "out graph" of higher-ordered neighbors.

The ELS decomposition is naturally distributed: with ANY total order on
nodes, every maximal clique C is emitted exactly once — by its lowest node
v, from BKPivot(R={v}, P=N(v) later in the order, X=N(v) earlier). Each
node's subproblem only needs its own neighborhood plus the adjacency among
those neighbors, so the plan is:

  1. rank nodes by (degree, id) — the parallel stand-in for degeneracy
     order (bounds |P| by O(degeneracy)-ish, the same reason the reference
     orders by core number),
  2. per center v, gather P/X neighbor lists (two ranked joins),
  3. gather intra-neighborhood adjacency (P-P and P-X pairs only — BK never
     intersects X with X): the oriented wedge join + semi-join close, i.e.
     exactly the triangle-enumeration cost sum_v |P_v|*|N_v| <= O(alpha*m),
  4. ``applyInPandas`` per center: BK with Tomita max-|P∩N(pivot)| pivoting
     over the (tiny) local neighborhood graph.

Hubs: with degree-ascending ranks a hub is the LOW-rank endpoint of most of
its edges, so it lands in X (cheap) rather than P; its own center
subproblem has P = higher-degree neighbors only. This is the same hub
asymmetry the triangle kernel exploits (operators/triangles.py).

Output: one row per maximal clique, ``clique array<long>`` sorted asc, plus
``size``. Isolated nodes are size-1 cliques.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges


def _bk_pivot(P, X, R, adj, out):
    """Classic BK with Tomita pivoting on python sets (neighborhood-local:
    |P|+|X| <= deg(center), so this never sees the global graph)."""
    if not P and not X:
        out.append(sorted(R))
        return
    pivot, best = None, -1
    for u in P | X:
        c = len(P & adj.get(u, frozenset()))
        if c > best:
            pivot, best = u, c
    for v in list(P - adj.get(pivot, frozenset())):
        nv = adj.get(v, frozenset())
        _bk_pivot(P & nv, X & nv, R + [v], adj, out)
        P.discard(v)
        X.add(v)


def maximal_cliques(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    min_size: int = 1,
) -> DataFrame:
    """All maximal cliques of the undirected simple graph ``edges``.

    ``edges`` may be directed input; it is symmetrized and self-loops
    dropped. Returns (clique array<long>, size int)."""
    spark = edges.sparkSession
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    # total order: (degree, id) — encode as one sortable long rank key
    rank = deg.select(
        F.col("a").alias("node"),
        (F.col("deg") * F.lit(1 << 40) + F.col("a")).alias("rank"),
    )
    re = (
        sym.join(rank.select(F.col("node").alias("a"), F.col("rank").alias("ra")), "a")
        .join(rank.select(F.col("node").alias("b"), F.col("rank").alias("rb")), "b")
        .select("a", "b", "ra", "rb")
    )
    # P/X membership lists per center
    plist = (
        re.filter(F.col("rb") > F.col("ra"))
        .groupBy(F.col("a").alias("center"))
        .agg(F.sort_array(F.collect_list("b")).alias("p"))
    )
    xlist = (
        re.filter(F.col("rb") < F.col("ra"))
        .groupBy(F.col("a").alias("center"))
        .agg(F.sort_array(F.collect_list("b")).alias("x"))
    )
    # intra-neighborhood adjacency: wedges center-(u in P)-(w in N), closed
    # by a join with the edge set. Only u in P (rank > center) — X-X pairs
    # are never intersected by BK.
    pu = re.filter(F.col("rb") > F.col("ra")).select(
        F.col("a").alias("center"), F.col("b").alias("u")
    )
    nw = re.select(F.col("a").alias("center"), F.col("b").alias("w"))
    wedges = (
        pu.join(nw, "center")
        .filter(F.col("u") != F.col("w"))
        .join(
            sym.select(F.col("a").alias("u"), F.col("b").alias("w")),
            ["u", "w"],
            "left_semi",
        )
    )
    pairs = wedges.groupBy("center").agg(
        F.collect_list(F.struct("u", "w")).alias("nbr_pairs")
    )
    centers = (
        plist.join(xlist, "center", "full")
        .join(pairs, "center", "left")
        .select(
            "center",
            F.coalesce("p", F.array().cast("array<long>")).alias("p"),
            F.coalesce("x", F.array().cast("array<long>")).alias("x"),
            F.coalesce(
                "nbr_pairs",
                F.array().cast("array<struct<u:long,w:long>>"),
            ).alias("nbr_pairs"),
        )
    )

    def run_bk(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            adj = {}
            for pr in r["nbr_pairs"]:
                u, w = int(pr["u"]), int(pr["w"])
                adj.setdefault(u, set()).add(w)
                adj.setdefault(w, set()).add(u)
            adj = {k: frozenset(v) for k, v in adj.items()}
            out = []
            _bk_pivot(set(int(v) for v in r["p"]),
                      set(int(v) for v in r["x"]),
                      [int(r["center"])], adj, out)
            for c in out:
                rows.append((c, len(c)))
        return pd.DataFrame(rows, columns=["clique", "size"])

    cliques = centers.repartition("center").groupBy("center").applyInPandas(
        run_bk, "clique array<long>, size int"
    )
    # isolated nodes: maximal 1-cliques
    isolated = nodes.join(
        sym.select(F.col("a").alias("id")).distinct(), "id", "left_anti"
    ).select(F.array(F.col("id")).cast("array<long>").alias("clique"),
             F.lit(1).alias("size"))
    res = cliques.union(isolated)
    if min_size > 1:
        res = res.filter(F.col("size") >= min_size)
    return res


def maximal_triangles(edges: DataFrame) -> DataFrame:
    """Size-3 maximal cliques — triangles with NO common neighbor of all
    three corners. SQL-expressible closed form used as the driver oracle for
    the clique machinery (entry_queries_graph.q_maximal_cliques_size3)."""
    return maximal_cliques(edges).filter(F.col("size") == 3).select(
        F.col("clique")[0].alias("a"),
        F.col("clique")[1].alias("b"),
        F.col("clique")[2].alias("c"),
    )
