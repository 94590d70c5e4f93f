"""PageRank with per-partition CSR blocks (vectorized numpy gather).

The north-star physical design made explicit: edges are hash-partitioned
into P static blocks by ``src % P``; each superstep co-groups the score
frontier (same ``node % P`` key) with its edge block and a numpy kernel
computes the partial message sums — the per-partition analog of the
reference's OpenMP gather over CSR adjacency
(``PageRank.cpp:68-78`` + the ``turbo`` CSR side-index idea,
``LocalClusteringCoefficient.cpp:24-43``). Only ``(node, score)`` rows
shuffle per superstep; the edge blocks never move.

Inside a block (pandas/numpy, no per-row Python):
  1. sort block by src once (CSR-ish layout; Spark delivers the block as an
     Arrow batch), ``np.searchsorted`` maps frontier scores onto edge rows;
  2. ``msg = frac * score[src]`` vectorized;
  3. ``np.add.at``-free combine: ``pd.groupby(dst).sum`` -> one partial row
     per distinct dst in the block (map-side combine in numpy).
Partials then hash-aggregate by dst (tiny shuffle: <= P rows per hot dst).

This kernel exists to prove the architecture and as the escape hatch for
semantics Catalyst can't express; on the JVM-friendly PageRank recurrence
the pure-DataFrame kernel (operators/pagerank.py) keeps everything in
WholeStageCodegen and avoids the Arrow round-trip — ``bench.py --csr``
measures both (see BENCH/BASELINE.md). Results are bit-identical modulo
summation order (tests assert allclose 1e-12 vs the DataFrame kernel).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import SuperstepRunner, aqe_disabled


def _gather_kernel(key, contrib_pdf: pd.DataFrame, scores_pdf: pd.DataFrame):
    """One CSR block gather: partial message sums per dst in this block."""
    if contrib_pdf.empty or scores_pdf.empty:
        return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
    s = scores_pdf.set_index("node")["score"]
    msg = contrib_pdf["frac"].to_numpy() * s.reindex(contrib_pdf["src"]).to_numpy()
    out = pd.DataFrame({"dst": contrib_pdf["dst"].to_numpy(), "m": msg})
    combined = out.groupby("dst", sort=False)["m"].sum().reset_index()
    return combined.rename(columns={"m": "partial"})


class PageRankCSR:
    """Same parameters/semantics as operators.pagerank.PageRank (teleport-only
    v1: NO_SINK_HANDLING, final sum-to-1 rescale for directed graphs)."""

    def __init__(
        self,
        damp: float = 0.85,
        tol: float = 1e-8,
        max_iterations: int = 250,
        blocks: int | None = None,
    ):
        self.damp = damp
        self.tol = tol
        self.max_iterations = max_iterations
        self.blocks = blocks

    def run(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        directed: bool = True,
        runner: SuperstepRunner | None = None,
        resume: bool = False,
    ):
        from networkit_spark.operators.pagerank import PageRankResult

        spark = edges.sparkSession
        with aqe_disabled(spark):
            runner = runner or SuperstepRunner(spark, run_id="pagerank_csr")
            nodes = nodes if nodes is not None else nodes_from_edges(edges)
            n = nodes.count()
            P = self.blocks or spark.sparkContext.defaultParallelism
            teleport = (1.0 - self.damp) / n

            deg = edges.groupBy(F.col("src").alias("node")).agg(
                F.sum("weight").alias("wdeg")
            )
            contrib = (
                edges.join(deg.withColumnRenamed("node", "src"), "src")
                .select(
                    "src",
                    "dst",
                    (F.col("weight") / F.col("wdeg")).alias("frac"),
                    F.pmod(F.col("src"), F.lit(P)).alias("block"),
                )
                .repartition(P, "block")
                .sortWithinPartitions("src")
                .persist()
            )
            m = contrib.count()

            init = nodes.select(
                F.col("id").alias("node"), F.lit(1.0 / n).alias("score")
            )

            def step(state: DataFrame, i: int):
                st = state.withColumn("block", F.pmod(F.col("node"), F.lit(P)))
                partials = (
                    contrib.groupby("block")
                    .cogroup(st.groupby("block"))
                    .applyInPandas(_gather_kernel, schema="dst long, partial double")
                )
                msgs = partials.groupBy("dst").agg(F.sum("partial").alias("m"))
                new = (
                    state.select("node", F.col("score").alias("prev"))
                    .join(msgs.withColumnRenamed("dst", "node"), "node", "left")
                    .select(
                        "node",
                        (
                            self.damp * F.coalesce(F.col("m"), F.lit(0.0))
                            + F.lit(teleport)
                        ).alias("score"),
                        "prev",
                    )
                )
                if self.tol <= 0:
                    return new.select("node", "score"), {"edges_processed": m}
                # lazy checkpoint materialized by the delta agg (one job);
                # _checkpointed skips the runner's redundant state copy
                new = new.localCheckpoint(eager=False)
                delta = new.agg(
                    F.sqrt(F.sum(F.pow(F.col("score") - F.col("prev"), 2)))
                ).first()[0]
                return new.select("node", "score"), {
                    "edges_processed": m,
                    "delta": float(delta or 0.0),
                    "_checkpointed": True,
                }

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
            return PageRankResult(
                scores_df=scores,
                iterations=res.iterations,
                converged=res.converged,
                metrics=res.metrics,
            )
