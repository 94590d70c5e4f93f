"""Graph randomization family (reference `randomization` module).

* ``degree_preserving_shuffle`` — random node-id permutation within each
  degree class (directed: (in, out) pairs), so the relabeled graph has the
  identical degree *sequence* but shuffled identities. Reference:
  ``cpp/randomization/DegreePreservingShuffle.cpp:23-100`` (sort nodes by
  degree, shuffle ids inside each equal-degree run).
* ``global_curveball`` — degree-preserving randomization of a simple
  undirected graph by global trades. Reference:
  ``cpp/randomization/GlobalCurveball.cpp`` / ``GlobalCurveballImpl.hpp``
  processes the trade sequence *sequentially* with trade-order edge
  orientation; this engine runs the same global-trade idea as a
  *synchronous conflict-free* variant (documented divergence): per round,
  nodes are paired by a seeded hash permutation, every edge is assigned to
  exactly one paired endpoint, and each pair redistributes its assigned
  "disjoint" neighbors randomly while moves that would collide with an
  existing edge stay put; the rare pair of trades that would mint the same
  brand-new edge simultaneously is rejected wholesale for the round
  (Metropolis-style, keeps the chain valid). Invariants hold *exactly*
  every round: degree sequence, node set, simplicity, edge count.
  Randomness is the portable md5 hash — runs reproduce across cluster
  layouts and are replayable by the SQL oracle.

Scale notes: no node-scale single-partition windows. Within-class shuffle
positions come from a global range-partitioned rank (``plans/ids.dense_ids``
on a composite key) minus broadcast per-class offsets — the degree-1 class
of a 10^12-node web graph never funnels through one task. The only
``Window.partitionBy`` is the per-trade card deal, whose partition is
bounded by deg(u)+deg(v) — the same per-trade work the reference does
sequentially (hub trades are the intrinsic cost of the algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.text import portable_hash60
from networkit_spark.plans.ids import dense_ids


def _degree_signatures(edges: DataFrame, nodes: DataFrame, directed: bool) -> DataFrame:
    """(node, din, dout); undirected graphs fold both directions into dout."""
    outd = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("dout"))
    if directed:
        ind = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("din"))
        sig = (
            nodes.select(F.col("id").alias("node"))
            .join(outd, "node", "left")
            .join(ind, "node", "left")
        )
    else:
        sig = (
            nodes.select(F.col("id").alias("node"))
            .join(outd, "node", "left")
            .withColumn("din", F.lit(0))
        )
    return sig.fillna({"din": 0, "dout": 0}).select("node", "din", "dout")


def _class_positions(sig: DataFrame, order_col, pos_name: str) -> DataFrame:
    """(node, din, dout, pos): pos = 0-based rank of ``order_col`` inside the
    node's (din, dout) class — a global range-partitioned rank minus
    broadcast per-class offsets (classes are few; nodes are not)."""
    keyed = sig.withColumn("_ok", order_col).withColumn(
        "_k", F.struct("din", "dout", "_ok", "node")
    )
    ranks = dense_ids(keyed.select("_k"), "_k", id_col="_gr", distinct=False)
    ranked = keyed.join(ranks, "_k").drop("_k", "_ok")
    csizes = sig.groupBy("din", "dout").agg(F.count("*").alias("_csz"))
    w = Window.orderBy("din", "dout").rowsBetween(Window.unboundedPreceding, -1)
    offs = csizes.select(
        "din", "dout", F.coalesce(F.sum("_csz").over(w), F.lit(0)).alias("_coff")
    )
    return (
        ranked.join(F.broadcast(offs), ["din", "dout"])
        .select("node", "din", "dout", (F.col("_gr") - F.col("_coff")).alias(pos_name))
    )


def degree_preserving_shuffle(
    edges: DataFrame,
    nodes: DataFrame,
    directed: bool = True,
    seed: int = 42,
) -> DataFrame:
    """-> permutation (node, new_id): a seeded random bijection mapping each
    node to a node of the identical degree signature. Relabeling the edge
    table through it preserves the degree sequence exactly
    (``DegreePreservingShuffle::getPermutation``)."""
    sig = _degree_signatures(edges, nodes, directed)
    by_id = _class_positions(sig, F.col("node"), "pos")
    h = portable_hash60(F.concat(F.lit(f"dps{seed}|"), F.col("node")))
    by_rand = _class_positions(sig, h, "pos").withColumnRenamed("node", "new_id")
    return by_id.join(by_rand, ["din", "dout", "pos"]).select("node", "new_id")


def relabel_edges(edges: DataFrame, permutation: DataFrame) -> DataFrame:
    """Apply a (node, new_id) permutation to both edge endpoints."""
    ps = permutation.select(F.col("node").alias("src"), F.col("new_id").alias("ns"))
    pd_ = permutation.select(F.col("node").alias("dst"), F.col("new_id").alias("nd"))
    keep = [c for c in edges.columns if c not in ("src", "dst")]
    return (
        edges.join(ps, "src")
        .join(pd_, "dst")
        .select(F.col("ns").alias("src"), F.col("nd").alias("dst"), *keep)
    )


def _hash(tag: str, *cols) -> F.Column:
    parts: list = [F.lit(tag)]
    for c in cols:
        parts += [F.lit("|"), c]
    return portable_hash60(F.concat(*parts))


def global_curveball(
    edges: DataFrame,
    nodes: DataFrame,
    rounds: int = 5,
    seed: int = 42,
    trades_per_round: int | None = None,
) -> DataFrame:
    """-> randomized canonical undirected edge table (src < dst, weight 1.0).

    ``edges``: simple undirected graph, canonical rows (src < dst).
    ``trades_per_round=None`` is the GLOBAL trade (every node paired);
    a number limits each round to the first k hash-order pairs — the
    uniform-trade ``Curveball`` variant (``CurveballUniformTradeGenerator``),
    where edges not touching a trading node carry over unchanged.
    """
    cur = edges.select("src", "dst").localCheckpoint(eager=True)
    n_nodes = nodes.select(F.col("id").alias("node"))

    for r in range(rounds):
        tag = f"gcb{seed}r{r}"
        # --- pair nodes by seeded-hash order (odd node out sits the round out)
        order = n_nodes.withColumn("_h", _hash(tag, F.col("node")))
        ranked = dense_ids(
            order.select(F.struct("_h", "node").alias("_k")),
            "_k",
            id_col="_r",
            distinct=False,
        ).select(F.col("_k.node").alias("node"), "_r")
        pairs = ranked.select("node", (F.col("_r") / 2).cast("long").alias("tid"))
        mates = (
            pairs.groupBy("tid")
            .agg(F.min("node").alias("u"), F.max("node").alias("v"), F.count("*").alias("c"))
            .filter(F.col("c") == 2)
            .drop("c")
        )
        if trades_per_round is not None:
            mates = mates.filter(F.col("tid") < trades_per_round)
        node_trade = pairs.join(mates, "tid").select(
            "node",
            "tid",
            F.when(F.col("node") == F.col("u"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("mate"),
        )
        # --- full pre-round adjacency (both orientations) and trade-tagged rows
        adj = cur.select(F.col("src").alias("node"), F.col("dst").alias("w")).union(
            cur.select(F.col("dst").alias("node"), F.col("src").alias("w"))
        )
        inc = adj.join(node_trade, "node").select(
            F.least("node", "w").alias("a"),
            F.greatest("node", "w").alias("b"),
            "node",
            "tid",
            "mate",
            "w",
        )
        # --- each edge is owned by exactly one endpoint: earliest trade, then
        #     smaller node (edges touching the unpaired node have one inc row)
        owner = (
            inc.groupBy("a", "b")
            .agg(F.min(F.struct("tid", "node")).alias("pick"))
            .select("a", "b", F.col("pick.node").alias("node"))
        )
        assigned = inc.join(owner, ["a", "b", "node"])
        pinned = assigned.filter(F.col("w") == F.col("mate")).select("a", "b")
        cand = assigned.filter(F.col("w") != F.col("mate")).select(
            "tid", "node", "mate", "w"
        )
        # --- cards held by both sides of a trade are common: stay with both
        per_card = cand.groupBy("tid", "w").agg(
            F.count("*").alias("cnt"),
            F.min("node").alias("n1"),
            F.max("node").alias("n2"),
        )
        common = per_card.filter(F.col("cnt") == 2)
        common_edges = common.select(F.col("n1").alias("x"), "w").union(
            common.select(F.col("n2").alias("x"), "w")
        )
        disj = cand.join(common.select("tid", "w"), ["tid", "w"], "left_anti")
        # --- a card may move to the mate only if the mate has NO pre-round
        #     edge to it (any such edge outside this deck would collide; one
        #     inside the deck is the common case, already excluded)
        blocked_key = adj.select(F.col("node").alias("mate"), "w").distinct()
        disj = disj.join(
            blocked_key.withColumn("blocked", F.lit(True)), ["mate", "w"], "left"
        ).withColumn("blocked", F.coalesce("blocked", F.lit(False)))
        stuck = disj.filter(F.col("blocked")).select(
            "tid", F.col("node").alias("x"), "w"
        )
        movable = disj.filter(~F.col("blocked")).select("tid", "node", "mate", "w")
        # --- deal: u (= smaller trade endpoint) draws exactly as many cards
        #     as it contributed; hash order decides which
        qu = movable.groupBy("tid").agg(
            F.sum(F.when(F.col("node") < F.col("mate"), 1).otherwise(0)).alias("qu"),
            F.min(F.least("node", "mate")).alias("u"),
            F.min(F.greatest("node", "mate")).alias("v"),
        )
        wq = Window.partitionBy("tid").orderBy(_hash(tag + "d", F.col("w")), "w")
        dealt = (
            movable.withColumn("_rn", F.row_number().over(wq))
            .join(qu, "tid")
            .select(
                "tid",
                F.when(F.col("_rn") <= F.col("qu"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("x"),
                "w",
            )
        )
        # --- two trades minting the same brand-new edge simultaneously:
        #     reject every involved trade for this round (cards revert)
        dealt_e = dealt.select(
            "tid", F.least("x", "w").alias("src"), F.greatest("x", "w").alias("dst")
        )
        dup = (
            dealt_e.groupBy("src", "dst")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .select("src", "dst")
        )
        rejected = dealt_e.join(dup, ["src", "dst"]).select("tid").distinct()
        kept_deals = dealt.join(rejected, "tid", "left_anti").select(
            F.col("x"), "w"
        )
        reverted = movable.join(rejected, "tid", "left_semi").select(
            F.col("node").alias("x"), "w"
        )
        new_half = (
            common_edges.union(kept_deals)
            .union(reverted)
            .union(stuck.select("x", "w"))
        )
        # edges with NO trading endpoint never enter `inc` — carry them over
        carried = cur.join(
            owner.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            ["src", "dst"],
            "left_anti",
        )
        cur = (
            new_half.select(
                F.least("x", "w").alias("src"), F.greatest("x", "w").alias("dst")
            )
            .union(pinned.select(F.col("a").alias("src"), F.col("b").alias("dst")))
            .union(carried)
            .localCheckpoint(eager=True)
        )
    return cur.withColumn("weight", F.lit(1.0))


def curveball(
    edges: DataFrame,
    nodes: DataFrame,
    trades_per_round: int,
    rounds: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Uniform-trade Curveball (``cpp/randomization/Curveball.cpp`` fed by
    ``CurveballUniformTradeGenerator``): each round trades ``trades_per_round``
    seeded-random disjoint node pairs; untouched edges carry over."""
    return global_curveball(
        edges, nodes, rounds=rounds, seed=seed, trades_per_round=trades_per_round
    )
