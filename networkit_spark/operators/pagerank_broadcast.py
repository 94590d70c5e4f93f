"""PageRank with a broadcast frontier — the zero-edge-shuffle superstep.

The default kernel (operators/pagerank.py) shuffles O(m) joined message rows
into the dst aggregation every superstep. That plan is right when the score
frontier itself is too large to replicate; but while the frontier fits the
broadcast budget (n x 16 bytes — ~1.6 GB even at 10^8 nodes), the superstep
can avoid touching the edges entirely:

- ``contrib`` is hash-partitioned by **dst** once and persisted;
- per superstep the scores table is **broadcast** into the join (no exchange
  on the big side), and the ``groupBy(dst)`` reuses contrib's partitioning —
  Catalyst inserts NO Exchange: the only cross-node traffic is the broadcast
  of the (node, score) frontier, which is exactly the north-star contract
  ("shuffling only the (node, score) frontier per superstep");
- the state update joins msgs (hash-partitioned by dst) with the node table
  (pre-partitioned by id with the same scheme) — again exchange-free.

On a single shared disk (sandbox) this removes the per-superstep shuffle
I/O that capped multi-core scaling; on a real cluster it trades shuffle for
broadcast fan-out, the standard regime choice for mid-size frontiers.
Semantics: teleport-only (NO_SINK_HANDLING) + final sum-to-1 rescale,
identical to ``pagerank_fixed`` — tests assert equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import (
    SuperstepRunner,
    aqe_disabled,
    truncate_lineage,
)


class PageRankBroadcast:
    def __init__(
        self,
        damp: float = 0.85,
        tol: float = 1e-8,
        max_iterations: int = 250,
    ):
        self.damp = damp
        self.tol = tol
        self.max_iterations = max_iterations

    def run(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        directed: bool = True,
        runner: SuperstepRunner | None = None,
        resume: bool = False,
        shuffle_partitions: int | None = None,
    ):
        from networkit_spark.operators.pagerank import PageRankResult

        spark = edges.sparkSession
        with aqe_disabled(spark):
            runner = runner or SuperstepRunner(spark, run_id="pagerank_bcast")
            nodes = nodes if nodes is not None else nodes_from_edges(edges)
            n = nodes.count()
            P = shuffle_partitions or spark.sparkContext.defaultParallelism
            teleport = (1.0 - self.damp) / n

            deg = edges.groupBy(F.col("src").alias("node")).agg(
                F.sum("weight").alias("wdeg")
            )
            contrib = (
                edges.join(deg.withColumnRenamed("node", "src"), "src")
                .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
                .repartition(P, "dst")
                .persist()
            )
            m = contrib.count()
            nodes_p = (
                nodes.select(F.col("id").alias("node")).repartition(P, "node").persist()
            )
            nodes_p.count()

            init = nodes_p.select("node", F.lit(1.0 / n).alias("score"))

            def step(state: DataFrame, i: int):
                msgs = (
                    contrib.join(
                        F.broadcast(state.select(F.col("node").alias("src"), "score")),
                        "src",
                    )
                    .groupBy("dst")
                    .agg(F.sum(F.col("frac") * F.col("score")).alias("m"))
                )
                new = (
                    nodes_p.join(msgs.withColumnRenamed("dst", "node"), "node", "left")
                    .select(
                        "node",
                        (
                            self.damp * F.coalesce(F.col("m"), F.lit(0.0))
                            + F.lit(teleport)
                        ).alias("score"),
                    )
                )
                if self.tol <= 0:
                    # runner's checkpoint isn't enough here: the broadcast-
                    # hinted plan leaks lineage through localCheckpoint
                    # (growth appears after ~20 iterations) — hard-truncate
                    # (_checkpointed: truncate_lineage already materialized)
                    return truncate_lineage(new), {
                        "edges_processed": m, "_checkpointed": True,
                    }
                joined = truncate_lineage(
                    new.withColumnRenamed("score", "snew").join(state, "node")
                )
                delta = joined.agg(
                    F.sqrt(F.sum(F.pow(F.col("snew") - F.col("score"), 2)))
                ).first()[0]
                return (
                    joined.select("node", F.col("snew").alias("score")),
                    {"edges_processed": m, "delta": float(delta or 0.0),
                     "_checkpointed": True},
                )

            res = runner.run(
                init,
                step,
                converged_fn=lambda info: self.tol > 0 and info["delta"] <= self.tol,
                max_iterations=self.max_iterations,
                resume=resume,
            )
            scores = res.state
            if directed:
                total = scores.agg(F.sum("score")).first()[0]
                scores = scores.select("node", (F.col("score") / total).alias("score"))
            contrib.unpersist()
            nodes_p.unpersist()
            return PageRankResult(
                scores_df=scores,
                iterations=res.iterations,
                converged=res.converged,
                metrics=res.metrics,
            )
