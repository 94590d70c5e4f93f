"""Maximal (weighted) matching — distributed handshake / local-max.

Reference: ``cpp/matching/`` (``SuitorMatcher``, ``LocalMaxMatcher``,
``PathGrowingMatcher``, ``BMatcher``). The local-max / Suitor idea has a
clean distributed dual (Manne-Bisseling handshake; Preis local-max —
published, public algorithms):

repeat:
  1. every unmatched node points to its heaviest unmatched neighbor
     (ties -> smallest id) — one agg over the live edge table;
  2. mutual pointers (u -> v and v -> u) become matched pairs;
  3. drop all edges incident to matched nodes;
until no edges remain or no new matches.

Produces a maximal matching whose weight is a 1/2-approximation of the
maximum — the same guarantee as the reference's LocalMaxMatcher. Expected
O(log m) rounds; every round is two shuffles (argmax agg + self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import truncate_lineage


def local_max_matching(und_edges: DataFrame, max_rounds: int = 100) -> DataFrame:
    """(u, v, weight) matched pairs with u < v. Input symmetrized."""
    spark = und_edges.sparkSession
    live = truncate_lineage(und_edges.select("src", "dst", "weight"))
    matched = spark.createDataFrame([], "u long, v long, weight double")
    for _ in range(max_rounds):
        if live.isEmpty():
            break
        # heaviest neighbor per node (tie -> smallest partner id)
        pref = (
            live.groupBy("src")
            .agg(
                F.max(
                    F.struct(F.col("weight"), (-F.col("dst")).alias("nd"))
                ).alias("top")
            )
            .select(
                F.col("src").alias("node"),
                (-F.col("top.nd")).alias("partner"),
                F.col("top.weight").alias("w"),
            )
        )
        # mutual handshake: node.partner == partner.node (emit once, u < v)
        other = pref.select(
            F.col("node").alias("partner"), F.col("partner").alias("node")
        )
        pairs = (
            pref.join(other, ["node", "partner"], "left_semi")
            .filter(F.col("node") < F.col("partner"))
            .select(F.col("node").alias("u"), F.col("partner").alias("v"), F.col("w").alias("weight"))
        )
        pairs = truncate_lineage(pairs)
        if pairs.isEmpty():
            break
        matched = truncate_lineage(matched.unionByName(pairs))
        hit = pairs.select(F.col("u").alias("node")).union(pairs.select("v"))
        live = truncate_lineage(
            live.join(hit.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(hit.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
        )
    return matched


def local_max_matching_fixed(und_edges: DataFrame, rounds: int = 6) -> DataFrame:
    """Fixed-round variant of :func:`local_max_matching` — deterministic and
    ANSI-SQL-expressible (the handshake recurrence unrolls to a CTE chain,
    like the fixed-iteration CC/PLP gate variants). Same per-round rule:
    heaviest neighbor, ties -> smallest partner id, mutual pointers match.
    With ``rounds`` >= the convergence round count the result equals the
    converged matching (pytest asserts that on the gate graph)."""
    live = truncate_lineage(und_edges.select("src", "dst", "weight"))
    matched = und_edges.sparkSession.createDataFrame([], "u long, v long, weight double")
    for _ in range(rounds):
        if live.isEmpty():
            break
        pref = (
            live.groupBy("src")
            .agg(F.max(F.struct(F.col("weight"), (-F.col("dst")).alias("nd"))).alias("top"))
            .select(
                F.col("src").alias("node"),
                (-F.col("top.nd")).alias("partner"),
                F.col("top.weight").alias("w"),
            )
        )
        other = pref.select(F.col("node").alias("partner"), F.col("partner").alias("node"))
        pairs = (
            pref.join(other, ["node", "partner"], "left_semi")
            .filter(F.col("node") < F.col("partner"))
            .select(F.col("node").alias("u"), F.col("partner").alias("v"), F.col("w").alias("weight"))
        )
        pairs = truncate_lineage(pairs)
        matched = truncate_lineage(matched.unionByName(pairs))
        hit = pairs.select(F.col("u").alias("node")).union(pairs.select("v"))
        live = truncate_lineage(
            live.join(hit.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(hit.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
        )
    return matched


def path_growing_matching(und_edges: DataFrame, max_edges: int = 2_000_000) -> DataFrame:
    """Drake-Hougardy path-growing 1/2-approx weighted matching — exact
    replica of ``cpp/matching/PathGrowingMatcher.cpp:33-147``: repeatedly
    take an alive vertex of maximum degree (the reference's BucketPQ on
    -degree; ties pinned here to the smallest id), grow a path by the
    heaviest alive incident edge (ties -> smallest neighbor id), assign
    path edges alternately to matchings M1/M2, delete each visited vertex,
    and return the heavier of the two matchings.

    The path growth is inherently sequential, so this runs on the driver
    behind an edge-count guard — the *distributed* 1/2-approximation twin
    (same guarantee, O(log m) shuffle rounds) is
    :func:`local_max_matching` / the ``max_matching`` gate query.

    Input: symmetrized (src, dst, weight). Output: (u, v, weight), u < v.
    """
    import heapq

    rows = und_edges.select("src", "dst", "weight").collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"path_growing_matching is a driver-side sequential replica; "
            f"{len(rows)} symmetrized edges > guard {max_edges}. "
            f"Use local_max_matching (distributed, same 1/2-approx bound)."
        )
    adj: dict[int, dict[int, float]] = {}
    for r in rows:
        u, v, w = int(r[0]), int(r[1]), float(r[2])
        if u == v:
            continue  # reference rejects self-loops; we drop them
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w

    degree = {u: len(nbrs) for u, nbrs in adj.items()}
    alive = {u for u, d in degree.items() if d > 0}
    num_edges = sum(degree.values()) // 2
    # lazy-decrease-key max-degree PQ: (-deg, node) — equal degree pops
    # the smallest id first (pins the reference's unspecified bucket order)
    pq = [(-d, u) for u, d in degree.items() if d > 0]
    heapq.heapify(pq)
    m1: list[tuple[int, int, float]] = []
    m2: list[tuple[int, int, float]] = []
    take_m1 = True

    while num_edges > 0:
        negd, v = heapq.heappop(pq)
        if v not in alive or -negd != degree[v]:
            continue  # stale PQ entry
        while degree.get(v, 0) > 0:
            # heaviest alive incident edge; tie -> smallest neighbor id
            best_u, best_w = None, float("-inf")
            for u, w in adj[v].items():
                if u in alive and (w > best_w or (w == best_w and u < best_u)):
                    best_u, best_w = u, w
            (m1 if take_m1 else m2).append(
                (min(v, best_u), max(v, best_u), best_w)
            )
            take_m1 = not take_m1
            # delete v: decrement alive neighbors, drop exhausted ones
            for u in adj[v]:
                if u in alive:
                    degree[u] -= 1
                    num_edges -= 1
                    if degree[u] == 0:
                        alive.discard(u)
                    else:
                        heapq.heappush(pq, (-degree[u], u))
            alive.discard(v)
            v = best_u
    winner = m1 if sum(w for _, _, w in m1) >= sum(w for _, _, w in m2) else m2
    return und_edges.sparkSession.createDataFrame(
        winner, "u long, v long, weight double"
    )


def matching_weight(matched: DataFrame) -> float:
    row = matched.agg(F.sum("weight")).first()
    return float(row[0] or 0.0)


def is_valid_matching(matched: DataFrame) -> bool:
    """No node appears twice (Matching::isProper analog)."""
    nodes = matched.select(F.col("u").alias("n")).union(matched.select("v"))
    return nodes.count() == nodes.distinct().count()
