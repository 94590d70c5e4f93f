"""Negative-weight APSP — the FloydWarshall contract, Spark-first.

Reference: ``cpp/distance/FloydWarshall.cpp`` (weighted graphs, negative
weights allowed): full distance matrix, per-pair hop counts with a
fewer-hops tie-break among equal-distance paths (:60-82), path
reconstruction via a next-hop matrix, and negative-cycle tagging
(:18-36): every node w with dist(w,w) < 0 is in a cycle; every pair
(u, v) with u -> w and w -> v for a cycle node w gets distance -inf and
both endpoints flagged ``isNodeInNegativeCycle``.

The FW triple loop is inherently sequential in the intermediate index k.
The Spark-native plan with identical outputs is ALL-SOURCE Bellman-Ford
waves under the lexicographic (dist, hops) min-plus semiring:

  state (source, node, dist, hops, next_hop), seeded with the diagonal;
  each superstep relaxes every arc once for every source simultaneously
  (one join + one (source, node) min-struct aggregation), so n SSSP
  problems share each shuffle instead of running n separate loops.

(dist, hops) is a true semiring (+ adds both components, min is
lexicographic), so the wave fixpoint equals the FW matrix: exact
distances AND the reference's minimal hop counts for every pair not
through a negative cycle. ``n`` rounds bound the walk length; pairs whose
<= n-edge walks dipped through a negative cycle are exactly the pairs the
tagging pass overwrites with -inf afterwards (u reaches a cycle node that
reaches v), so contaminated intermediate values never surface.

``next_hop`` carries the first hop of one optimal path (deterministic
min-id among (dist, hops) ties); the reference's ``pathMatrix`` tie
order is intermediate-enumeration-dependent, so tests assert OUR path is
valid/optimal rather than byte-equal.

Output is the intrinsic O(n^2) pair table (reachable pairs only —
the reference materializes explicit +inf cells; filter/join as needed).
Like ``apsp``, this is for the small/medium graphs the reference targets
with FloydWarshall; it distributes those n^2 rows, not single-node RAM.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage


@dataclass
class FloydWarshallResult:
    distances: DataFrame             # (source, target, dist, hops, next_hop)
    negative_cycle_nodes: DataFrame  # (node)
    rounds: int


def floyd_warshall(
    edges: DataFrame,
    nodes: DataFrame,
    max_rounds: int | None = None,
) -> FloydWarshallResult:
    """``edges``: directed (src, dst, weight double — negatives allowed;
    parallel arcs keep the minimum, matching a weighted simple graph).
    ``nodes``: (id) dense node table."""
    spark = edges.sparkSession
    with aqe_disabled(spark):
        merged = edges.groupBy("src", "dst").agg(F.min("weight").alias("w"))
        arcs = merged.filter(F.col("src") != F.col("dst")).persist()
        # FloydWarshall.cpp:51-57 runs the neighbor init AFTER the diagonal
        # init, so a self-loop weight OVERWRITES dist[u][u] (hops 1) — a
        # negative self-loop thereby becomes a tagged negative cycle.
        selfw = merged.filter(F.col("src") == F.col("dst")).select(
            F.col("src").alias("node"), F.col("w").alias("sw")
        )
        n = nodes.count()
        rounds = int(max_rounds) if max_rounds is not None else max(int(n), 1)

        diag = (
            nodes.join(selfw, nodes["id"] == selfw["node"], "left")
            .select(
                F.col("id").alias("source"),
                F.col("id").alias("node"),
                F.coalesce("sw", F.lit(0.0)).alias("dist"),
                F.when(F.col("sw").isNotNull(), F.lit(1)).otherwise(F.lit(0))
                .cast("long").alias("hops"),
                F.col("id").alias("next_hop"),
            )
        )
        # direct-arc seeds (FloydWarshall.cpp:51-57's neighbor init) — the
        # diagonal no longer carries dist 0 when a self-loop overwrote it,
        # so one-edge rows must be seeded explicitly, not derived from it
        direct = arcs.select(
            F.col("src").alias("source"),
            F.col("dst").alias("node"),
            F.col("w").alias("dist"),
            F.lit(1).cast("long").alias("hops"),
            F.col("dst").alias("next_hop"),
        )
        state = truncate_lineage(diag.union(direct))
        done = 0
        for _ in range(rounds):
            cand = (
                state.join(arcs, state["node"] == arcs["src"])
                .select(
                    "source",
                    F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                    (F.col("hops") + F.lit(1)).alias("hops"),
                    F.when(state["node"] == F.col("source"), F.col("dst"))
                    .otherwise(F.col("next_hop")).alias("next_hop"),
                )
            )
            new = (
                state.union(cand)
                .groupBy("source", "node")
                .agg(F.min(F.struct("dist", "hops", "next_hop")).alias("s"))
                .select("source", "node", "s.dist", "s.hops", "s.next_hop")
            )
            new = truncate_lineage(new)
            done += 1
            changed = (
                new.join(state.select("source", "node", F.col("dist").alias("od"),
                                      F.col("hops").alias("oh")),
                         ["source", "node"], "left")
                .filter(
                    F.col("od").isNull()
                    | (F.col("dist") < F.col("od"))
                    | ((F.col("dist") == F.col("od")) & (F.col("hops") < F.col("oh")))
                )
                .limit(1).count()
            )
            state = new
            if changed == 0:
                break

        # negative-cycle tagging (FloydWarshall.cpp:18-36)
        cyc = state.filter(
            (F.col("source") == F.col("node")) & (F.col("dist") < 0)
        ).select(F.col("node").alias("w"))
        cyc = truncate_lineage(cyc)
        into = state.join(cyc, state["node"] == cyc["w"]).select(
            "source", "w"
        )  # u reaches cycle node w
        outof = state.join(cyc, state["source"] == cyc["w"]).select(
            F.col("w"), F.col("node").alias("target")
        )  # w reaches v
        bad_pairs = (
            into.join(outof, "w")
            .select("source", F.col("target").alias("node"))
            .distinct()
        )
        tagged = (
            into.select(F.col("source").alias("node"))
            .union(outof.select(F.col("target").alias("node")))
            .distinct()
        )
        neg_inf = F.lit(float("-inf"))
        dist_df = (
            state.join(bad_pairs.withColumn("bad", F.lit(1)),
                       ["source", "node"], "left")
            .select(
                "source",
                F.col("node").alias("target"),
                F.when(F.col("bad").isNotNull(), neg_inf)
                .otherwise(F.col("dist")).alias("dist"),
                F.when(F.col("bad").isNotNull(), F.lit(None).cast("long"))
                .otherwise(F.col("hops")).alias("hops"),
                F.when(F.col("bad").isNotNull(), F.lit(None).cast("long"))
                .otherwise(F.col("next_hop")).alias("next_hop"),
            )
        )
        arcs.unpersist()
        return FloydWarshallResult(
            distances=dist_df,
            negative_cycle_nodes=tagged,
            rounds=done,
        )


def nodes_on_shortest_path(result: FloydWarshallResult, source: int,
                           target: int) -> list[int]:
    """``getNodesOnShortestPath`` parity (FloydWarshall.cpp:97-114):
    ``next_hop(cur, target)`` IS ``pathMatrix[cur][target]`` (the node
    after ``cur`` on an optimal cur->target path), so the walk needs only
    the n rows with this target — one filtered collect, then a driver
    pointer chase (the reference returns a Python list too). [] when
    unreachable or the pair runs through a negative cycle. Each step
    strictly decreases the remaining optimal hop count, so the walk
    terminates within n steps."""
    hop_map = {
        int(r.source): r.next_hop
        for r in result.distances.filter(
            F.col("target") == int(target)
        ).collect()
    }
    if hop_map.get(int(source)) is None:
        return []  # unreachable, or pathMatrix[source][target] == none
    cur, path = int(source), [int(source)]
    for _ in range(len(hop_map) + 1):
        if cur == int(target):
            return path
        nxt = hop_map.get(cur)
        if nxt is None:
            return []
        cur = int(nxt)
        path.append(cur)
    return []
