"""Power-iteration PageRank over the edge table.

Behavior parity with the reference implementation
(``cpp/centrality/PageRank.cpp:21-128``, wrapper
``networkit/centrality.pyx:2334-2416``; defaults damp=0.85, tol=1e-8,
normalized=False, NO_SINK_HANDLING, L2 convergence):

1.  init ``score[u] = 1/n``; weighted out-degree table (``:28-32``);
2.  superstep: gather over **incoming** edges
    ``pr[u] = damp * sum_{v->u} score[v]*w(v,u)/deg[v] + (1-damp)/n``
    (``:68-78``, Newman Ch.7 verbal definition);
3.  directed + (DISTRIBUTE_SINKS or normalized): add
    ``damp/n * sum_{sinks} score[s]`` to every node (``:84-91``);
4.  converge when ``iterations >= maxIterations`` or
    ``||new - old||_{L2|L1} <= tol`` (``:53-63``);
5.  post: normalized -> divide by norm factor (``:101-114``); non-normalized
    directed + NO_SINK_HANDLING -> rescale so sum == 1 (``:117-122``).

Spark-first physical design (what changes at 100 TB):

- the per-superstep work is ONE shuffle: ``scores ⋈ contrib`` on ``src`` then
  ``groupBy(dst)`` with partial (map-side) aggregation. ``contrib`` =
  ``edges ⋈ out-degrees`` is computed once, hash-partitioned by ``src`` and
  persisted, so only the (node, score) frontier moves per superstep
  (north_star). Hub-vertex skew on the gather side is handled by partial
  aggregation (map-side combine collapses each partition's messages to one
  row per dst) + AQE skew splitting;
- the convergence norm is computed from the same materialized state
  (old+new score in one row) — no extra join, one scalar agg per superstep;
- state is checkpointed per-iteration through
  :class:`networkit_spark.plans.iteration.SuperstepRunner` (resume +
  lineage truncation + metrics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges, transpose
from networkit_spark.plans.iteration import SuperstepRunner, aqe_disabled

NO_SINK_HANDLING = "none"
DISTRIBUTE_SINKS = "distribute"


@dataclass
class PageRankResult:
    scores_df: DataFrame  # (node long, score double)
    iterations: int
    converged: bool
    metrics: list

    def scores(self) -> DataFrame:
        return self.scores_df

    def ranking(self, k: int | None = None) -> DataFrame:
        """Ref: ``centrality.pyx:83 ranking()`` — sort desc; top-k via limit."""
        out = self.scores_df.orderBy(F.desc("score"), F.asc("node"))
        return out.limit(k) if k else out

    def maximum(self) -> float:
        """Ref: ``PageRank.cpp:124-126`` max score."""
        return self.scores_df.agg(F.max("score")).first()[0]


class PageRank:
    def __init__(
        self,
        damp: float = 0.85,
        tol: float = 1e-8,
        normalized: bool = False,
        distribute_sinks: str = NO_SINK_HANDLING,
        max_iterations: int = 250,
        norm: str = "l2",
        salt_hot_sources: int | None = None,
        hot_threshold: int = 100_000,
    ):
        """``salt_hot_sources``: when set, sources whose out-degree exceeds
        ``hot_threshold`` are salted across that many sub-keys in the
        per-superstep message join (plans/skew.py) — the explicit skew
        guard for web-scale hub out-degrees when AQE is off."""
        self.damp = damp
        self.tol = tol
        self.normalized = normalized
        self.distribute_sinks = distribute_sinks
        self.max_iterations = max_iterations
        self.norm = norm
        self.salt_hot_sources = salt_hot_sources
        self.hot_threshold = hot_threshold

    def run(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        directed: bool = True,
        runner: SuperstepRunner | None = None,
        resume: bool = False,
        shuffle_partitions: int | None = None,
        init_scores: DataFrame | None = None,
    ) -> PageRankResult:
        """``edges(src, dst, weight)`` directed as stored; undirected input
        must already be symmetrized (both directions present).

        ``init_scores`` (node, score): warm start — e.g. the previous
        crawl batch's converged scores. Nodes absent from it start at 1/n
        and the whole vector is renormalized to sum 1; the fixpoint is
        unchanged (power iteration converges to the same vector from any
        stochastic start), only iterations-to-convergence shrink."""
        spark = edges.sparkSession
        with aqe_disabled(spark):
            return self._run(
                edges, nodes, directed, runner, resume, shuffle_partitions,
                init_scores,
            )

    def _run(self, edges, nodes, directed, runner, resume, shuffle_partitions,
             init_scores=None):
        spark = edges.sparkSession
        runner = runner or SuperstepRunner(spark, run_id="pagerank")
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        n = nodes.count()
        teleport = (1.0 - self.damp) / n
        sink_factor = self.damp / n

        # out-degree (weighted) once; contrib(src, dst, frac=w/deg[src]).
        deg = edges.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
        contrib = (
            edges.join(deg.withColumnRenamed("node", "src"), "src")
            .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
        )
        # Narrow-id optimization: dictionary-encoded node ids are dense
        # [0, n), so whenever n < 2^31 the loop runs on int32 keys — half the
        # key bytes through the per-superstep shuffle and half the hash-table
        # footprint in the message aggregation (memory-bandwidth-bound at
        # high core counts). Output schema is cast back to long below.
        narrow = n < 2**31
        if narrow:
            contrib = contrib.select(
                F.col("src").cast("int").alias("src"),
                F.col("dst").cast("int").alias("dst"),
                "frac",
            )
        # P must equal spark.sql.shuffle.partitions: the per-superstep message
        # aggregation shuffles into hashpartitioning(dst, shuffle.partitions),
        # and the final join is exchange-free only when state/contrib share
        # that exact partitioning.
        P = shuffle_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism))
        )
        contrib = contrib.repartition(P, "src").persist()
        m = contrib.count()  # materialize once; every superstep reuses this partitioning

        handle_sinks = directed and (
            self.distribute_sinks == DISTRIBUTE_SINKS or self.normalized
        )
        sinks = None
        if handle_sinks:
            # sinks = nodes with (unweighted) degree 0 (PageRank.cpp:34-41)
            sinks = nodes.join(
                edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
            ).persist()
            sinks.count()

        node_id = F.col("id").cast("int") if narrow else F.col("id")
        if init_scores is not None:
            prev = init_scores.select(
                (F.col("node").cast("int") if narrow else F.col("node")).alias(
                    "node"
                ),
                F.col("score").alias("prev_score"),
            )
            raw = nodes.select(node_id.alias("node")).join(
                prev, "node", "left"
            ).select(
                "node", F.coalesce("prev_score", F.lit(1.0 / n)).alias("score")
            )
            total = float(raw.agg(F.sum("score")).first()[0] or 1.0)
            init = raw.select(
                "node", (F.col("score") / total).alias("score")
            ).repartition(P, "node")
        else:
            init = nodes.select(
                node_id.alias("node"), F.lit(1.0 / n).alias("score")
            ).repartition(P, "node")
        if sinks is not None and narrow:
            sinks = sinks.select(F.col("id").cast("int").alias("id"))

        # Sink mass for superstep i = sum of sink scores in state_{i}. It is
        # folded into the SAME scalar agg as the convergence delta on the
        # materialized state (one driver action per superstep, not two —
        # round-1 verdict minor #6); only iteration 0 pays a dedicated agg.
        sink_holder = {"sum": None}
        if handle_sinks and not resume:
            row = init.join(
                sinks.withColumnRenamed("id", "node"), "node", "left_semi"
            ).agg(F.sum("score")).first()
            sink_holder["sum"] = float(row[0] or 0.0)

        hot = None
        if self.salt_hot_sources:
            from networkit_spark.plans.skew import hot_keys

            hot = hot_keys(contrib, "src", self.hot_threshold).persist()
            hot.count()

        def step(state: DataFrame, i: int):
            frontier = state.select(F.col("node").alias("src"), "score")
            if self.salt_hot_sources:
                from networkit_spark.plans.skew import salted_join

                joined = salted_join(
                    contrib, frontier, "src",
                    n_salt=self.salt_hot_sources,
                    hot=hot, salt_by="dst",
                )
            else:
                # SHUFFLE_HASH hint: state comes back from localCheckpoint as
                # a LogicalRDD with unknown stats, so Catalyst would fall back
                # to sort-merge — which re-sorts the full (persisted,
                # loop-invariant) contrib table EVERY superstep, O(m log m)
                # per iteration. The hint forces a shuffled hash join that
                # builds on the (node, score) frontier and streams contrib;
                # both sides are already hash-partitioned on src (contrib by
                # the one-time repartition, frontier because the previous
                # superstep's output partitioning survives localCheckpoint),
                # so the join plans with ZERO exchange.
                joined = contrib.join(frontier.hint("shuffle_hash"), "src")
            msgs = joined.groupBy("dst").agg(
                F.sum(F.col("frac") * F.col("score")).alias("m")
            )
            sink_add = 0.0
            if handle_sinks:
                if sink_holder["sum"] is None:
                    # resume path: state loaded from checkpoint, no carried agg
                    row = state.join(
                        sinks.withColumnRenamed("id", "node"), "node", "left_semi"
                    ).agg(F.sum("score")).first()
                    sink_holder["sum"] = float(row[0] or 0.0)
                sink_add = sink_factor * sink_holder["sum"]
            new = (
                state.join(
                    msgs.withColumnRenamed("dst", "node").hint("shuffle_hash"),
                    "node",
                    "left",
                )
                .select(
                    "node",
                    (
                        self.damp * F.coalesce(F.col("m"), F.lit(0.0))
                        + F.lit(teleport + sink_add)
                    ).alias("score"),
                    F.col("score").alias("prev"),
                )
            )
            return new, {"edges_processed": m}

        # Delta (convergence norm) is computed from the same materialized
        # per-iteration state (new + prev score in one row): one scalar agg,
        # no extra join — the analog of parallelSumForNodes (PageRank.cpp:59).
        sink_flag = None
        if handle_sinks:
            sink_flag = sinks.select(F.col("id").alias("node"), F.lit(1).alias("snk"))

        def step_final(state: DataFrame, i: int):
            new, info = step(state, i)
            if self.tol <= 0 and not handle_sinks:
                # pure throughput mode (bench/scaling): no convergence probe,
                # maxIterations governs — saves one scalar agg per superstep
                return new.select("node", "score"), info
            # lazy checkpoint: the delta agg below is the action that
            # materializes it — one job per superstep instead of
            # eager-checkpoint + agg; _checkpointed stops the runner from
            # copying the state a second time
            new = new.localCheckpoint(eager=False)
            delta_expr = (
                F.sqrt(F.sum(F.pow(F.col("score") - F.col("prev"), 2)))
                if self.norm == "l2"
                else F.sum(F.abs(F.col("score") - F.col("prev")))
            )
            if handle_sinks:
                # one combined agg: convergence delta + NEXT superstep's sink mass
                flagged = new.join(sink_flag, "node", "left")
                row = flagged.agg(
                    delta_expr.alias("delta"),
                    F.sum(F.col("score") * F.coalesce(F.col("snk"), F.lit(0))).alias("ssum"),
                ).first()
                sink_holder["sum"] = float(row["ssum"] or 0.0)
                delta = row["delta"]
            else:
                delta = new.agg(delta_expr).first()[0]
            info["delta"] = float(delta or 0.0)
            info["_checkpointed"] = True
            return new.select("node", "score"), info

        res = runner.run(
            init,
            step_final,
            converged_fn=lambda info: self.tol > 0 and info["delta"] <= self.tol,
            max_iterations=self.max_iterations,
            resume=resume,
        )

        scores = res.state
        if narrow:
            scores = scores.select(F.col("node").cast("long").alias("node"), "score")
        # post-processing (PageRank.cpp:100-123)
        if self.normalized:
            if directed:
                srow = scores.join(
                    sinks.withColumnRenamed("id", "node"), "node", "left_semi"
                ).agg(F.sum("score")).first()
                sink_sum = srow[0] or 0.0
                norm_factor = (1.0 / n) * ((1.0 - self.damp) + self.damp * sink_sum)
            else:
                norm_factor = teleport
            scores = scores.select("node", (F.col("score") / norm_factor).alias("score"))
        elif directed and self.distribute_sinks == NO_SINK_HANDLING:
            total = scores.agg(F.sum("score")).first()[0]
            scores = scores.select("node", (F.col("score") / total).alias("score"))

        contrib.unpersist()
        if sinks is not None:
            sinks.unpersist()
        return PageRankResult(
            scores_df=scores,
            iterations=res.iterations,
            converged=res.converged,
            metrics=res.metrics,
        )


def pagerank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int,
    damp: float = 0.85,
    rescale_sum1: bool = True,
) -> DataFrame:
    """Deterministic fixed-iteration PageRank as one unrolled DataFrame plan.

    No driver-side convergence decisions — the oracle-checkable variant
    (the DuckDB oracle unrolls the same recurrence as CTEs). Teleport-only
    semantics (NO_SINK_HANDLING) + final sum-to-1 rescale.
    """
    n = nodes.count()
    teleport = (1.0 - damp) / n
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    contrib = edges.join(deg.withColumnRenamed("node", "src"), "src").select(
        "src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac")
    )
    scores = nodes.select(F.col("id").alias("node"), F.lit(1.0 / n).alias("score"))
    for i in range(iterations):
        msgs = (
            contrib.join(scores.select(F.col("node").alias("src"), "score"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("score")).alias("m"))
        )
        scores = (
            nodes.select(F.col("id").alias("node"))
            .join(msgs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (damp * F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(teleport)).alias("score"),
            )
        )
        scores = scores.localCheckpoint(eager=True)
    if rescale_sum1:
        total = scores.agg(F.sum("score")).first()[0]
        scores = scores.select("node", (F.col("score") / total).alias("score"))
    return scores
