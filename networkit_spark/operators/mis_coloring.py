"""Luby maximal independent set + Jones-Plassmann greedy coloring.

The reference ships sequential combinatorial independent-set/coloring code
(e.g. the greedy vertex orderings used inside
``cpp/scd/LocalTightnessExpansion.cpp`` neighborhoods and the matching
family ``cpp/matching/*``); a faithful sequential port would be
driver-bound. We instead implement the two classic *parallel* algorithms
with the same outputs a NetworKit user gets from an independent-set /
coloring pass:

- :class:`LubyMIS` — Luby (1986): every round each still-active node draws
  a deterministic pseudo-random priority; nodes whose priority beats every
  active neighbor join the MIS, then they and their neighbors deactivate.
  O(log n) rounds w.h.p.; each round is one edge scan + hash agg + two
  semi-joins — the PageRank shuffle profile.
- :class:`JonesPlassmannColoring` — Jones & Plassmann (1993): every round
  the uncolored local priority maxima take the smallest color not used by
  an already-colored neighbor (mex via array HOFs — no Python). Produces a
  valid greedy coloring with <= maxDegree+1 colors.

Determinism / oracle: priorities are the portable 60-bit md5 hash
(``functions.text.portable_hash60``) of ``'{tag}|{seed}|{round}|{node}'``,
so a fixed-round run unrolls to ANSI SQL exactly (DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT``) — same recipe as the ForestFire
oracle. Ties are impossible in practice (60-bit) but broken by node id.

Scale: no collect of node sets; active/mis/colored sets stay DataFrames,
lineage truncated per round. Priorities are pure column exprs of
(node, round), so edge-side priorities need NO join with the node state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import aqe_disabled, truncate_lineage


def _pri(col: Column, tag: str, seed: int, rnd: int) -> Column:
    """Portable 60-bit priority, pure function of (node, tag, seed, round)."""
    key = F.concat_ws("|", F.lit(tag), F.lit(str(seed)), F.lit(str(rnd)),
                      col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


@dataclass
class MISResult:
    mis_df: DataFrame  # (node long, in_mis boolean)
    iterations: int
    converged: bool


class LubyMIS:
    """Maximal independent set, Luby's algorithm.

    ``edges`` must be symmetrized (both directions present); self-loops are
    ignored. ``run`` returns every node with an ``in_mis`` flag.
    """

    def __init__(self, seed: int = 7, max_rounds: int = 40):
        self.seed = seed
        self.max_rounds = max_rounds

    def run(self, edges: DataFrame, nodes: DataFrame | None = None) -> MISResult:
        spark = edges.sparkSession
        with aqe_disabled(spark):
            return self._run(edges, nodes)

    def _run(self, edges: DataFrame, nodes: DataFrame | None) -> MISResult:
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        e = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .persist()
        )
        e.count()
        active = truncate_lineage(nodes.select(F.col("id").alias("node")))
        mis = None
        rounds = 0
        converged = False
        for rnd in range(self.max_rounds):
            rounds = rnd + 1
            # edges with BOTH endpoints active (two semi-joins; the active
            # set shrinks geometrically, so these joins cheapen every round)
            ae = (
                e.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            )
            # min neighbor priority per active node — priorities computed
            # inline on the edge rows (no node-state join needed)
            nbr_min = ae.groupBy("src").agg(
                F.min(
                    F.struct(
                        _pri(F.col("dst"), "mis", self.seed, rnd).alias("p"),
                        F.col("dst").alias("node"),
                    )
                ).alias("mn")
            ).select(F.col("src").alias("node"), F.col("mn.p").alias("nbr_p"),
                     F.col("mn.node").alias("nbr_id"))
            me_p = _pri(F.col("node"), "mis", self.seed, rnd)
            winners = (
                active.join(nbr_min, "node", "left")
                .filter(
                    F.col("nbr_p").isNull()
                    | (me_p < F.col("nbr_p"))
                    | ((me_p == F.col("nbr_p")) & (F.col("node") < F.col("nbr_id")))
                )
                .select("node")
            )
            winners = truncate_lineage(winners)
            n_win = winners.count()
            mis = winners if mis is None else mis.union(winners)
            if n_win == 0:
                # active nodes all blocked this round only if active empty:
                # a min-priority active node always wins, so n_win == 0
                # implies active is empty
                converged = True
                break
            # deactivate winners and their neighbors
            nbrs_of_win = (
                e.join(winners.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .select(F.col("src").alias("node"))
                .distinct()
            )
            active = truncate_lineage(
                active.join(winners, "node", "left_anti")
                .join(nbrs_of_win, "node", "left_anti")
            )
            if active.limit(1).count() == 0:
                converged = True
                break
        mis = truncate_lineage(mis) if mis is not None else None
        out = nodes.select(F.col("id").alias("node")).join(
            mis.withColumn("in_mis", F.lit(True)), "node", "left"
        ).select("node", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))
        e.unpersist()
        return MISResult(mis_df=out, iterations=rounds, converged=converged)


@dataclass
class ColoringResult:
    colors_df: DataFrame  # (node long, color long)
    iterations: int
    converged: bool
    n_colors: int


class JonesPlassmannColoring:
    """Greedy graph coloring, Jones-Plassmann parallel variant.

    Every round, each uncolored node whose priority is a strict local max
    among *uncolored* neighbors picks mex(colors of colored neighbors).
    ``edges`` must be symmetrized.
    """

    def __init__(self, seed: int = 7, max_rounds: int = 200):
        self.seed = seed
        self.max_rounds = max_rounds

    def run(self, edges: DataFrame, nodes: DataFrame | None = None) -> ColoringResult:
        spark = edges.sparkSession
        with aqe_disabled(spark):
            return self._run(edges, nodes)

    def _run(self, edges: DataFrame, nodes: DataFrame | None) -> ColoringResult:
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        e = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .persist()
        )
        e.count()
        uncolored = truncate_lineage(nodes.select(F.col("id").alias("node")))
        colored = None  # (node, color)
        rounds = 0
        converged = False
        for rnd in range(self.max_rounds):
            rounds = rnd + 1
            # priority is FIXED across rounds (JP uses one random order);
            # rnd=0 in the hash keeps the oracle expression one literal
            ue = (
                e.join(uncolored.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(uncolored.withColumnRenamed("node", "dst"), "dst", "left_semi")
            )
            nbr_max = ue.groupBy("src").agg(
                F.max(
                    F.struct(
                        _pri(F.col("dst"), "jp", self.seed, 0).alias("p"),
                        F.col("dst").alias("node"),
                    )
                ).alias("mx")
            ).select(F.col("src").alias("node"), F.col("mx.p").alias("nbr_p"),
                     F.col("mx.node").alias("nbr_id"))
            me_p = _pri(F.col("node"), "jp", self.seed, 0)
            winners = (
                uncolored.join(nbr_max, "node", "left")
                .filter(
                    F.col("nbr_p").isNull()
                    | (me_p > F.col("nbr_p"))
                    | ((me_p == F.col("nbr_p")) & (F.col("node") > F.col("nbr_id")))
                )
                .select("node")
            )
            # smallest color unused by already-colored neighbors (mex):
            # gather neighbor colors as a set, scan 0..|set| with a filter HOF
            if colored is not None:
                nbr_colors = (
                    e.join(winners.withColumnRenamed("node", "src"), "src", "left_semi")
                    .join(colored.withColumnRenamed("node", "dst"), "dst")
                    .groupBy("src")
                    .agg(F.collect_set("color").alias("used"))
                    .select(F.col("src").alias("node"), "used")
                )
                new_colored = (
                    winners.join(nbr_colors, "node", "left")
                    .withColumn("used", F.coalesce("used", F.array().cast("array<long>")))
                    .withColumn(
                        "color",
                        F.filter(
                            F.sequence(F.lit(0).cast("long"), F.size("used").cast("long")),
                            lambda c: ~F.array_contains(F.col("used"), c),
                        )[0],
                    )
                    .select("node", "color")
                )
            else:
                new_colored = winners.select("node", F.lit(0).cast("long").alias("color"))
            new_colored = truncate_lineage(new_colored)
            n_win = new_colored.count()
            if n_win == 0:
                converged = True
                break
            colored = new_colored if colored is None else truncate_lineage(
                colored.union(new_colored)
            )
            uncolored = truncate_lineage(
                uncolored.join(new_colored.select("node"), "node", "left_anti")
            )
            if uncolored.limit(1).count() == 0:
                converged = True
                break
        e.unpersist()
        n_colors = colored.select("color").distinct().count() if colored is not None else 0
        return ColoringResult(
            colors_df=colored, iterations=rounds, converged=converged,
            n_colors=n_colors,
        )
