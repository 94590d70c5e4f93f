"""Superstep iteration runtime: convergence loop + checkpoint/resume + metrics.

The reference's iterative kernels hold state in double-buffered in-memory
vectors and loop on one thread (``PageRank.cpp:29,66-96`` ``scoreData``/``pr``
+ ``std::swap``; ``PLP.cpp:69``; ``ParallelConnectedComponents.cpp:32-76``).
The distributed equivalents this runtime provides:

- **double buffering** -> immutable DataFrame per iteration;
- **lineage control** -> iterative DataFrame plans grow per superstep, so
  each committed iteration is persisted (parquet state table — the
  Iceberg-compatible layout ``<state_dir>/<run_id>/iter=<k>/``) and read
  back, truncating the plan. Between commits, ``localCheckpoint`` keeps the
  loop fast.
- **resume** -> the latest committed iteration's parquet is the restart
  point; ``SuperstepRunner.run`` with the same ``run_id`` continues from it
  (north_rule: resumable mid-iteration with per-partition lineage — parquet
  state is written by Spark tasks, one file per partition, so partition
  lineage is the file manifest itself).
- **metrics** -> every superstep appends
  ``(run_id, iteration, delta, rows, wall_sec, extra...)`` to
  ``<state_dir>/<run_id>/metrics.jsonl`` — the bench harness and the
  convergence tests both read this.

On a real cluster the state dir lives on the shared store (S3/HDFS) as an
Iceberg table partitioned by ``iteration``; locally it is a plain directory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def truncate_lineage(df: "DataFrame") -> "DataFrame":
    """Hard lineage/plan truncation — BOTH layers:

    1. Logical plan: ``createDataFrame(df.rdd, schema)`` rebinds the state
       as a fresh LogicalRDD. ``localCheckpoint(eager=True)`` ALONE is not
       reliable under AQE: in loops whose step references the state
       multiple times we measured per-iteration wall time TRIPLING (3
       state references -> 3^k plan growth; PLM contracted-level sweeps
       went 1.7s -> 176s in 6 sweeps).
    2. RDD lineage: ``localCheckpoint`` (not plain ``persist``) replaces
       the RDD's dependency chain with the materialized blocks. With
       persist alone the chain keeps growing one stage per iteration and
       deep runs (e.g. exact Brandes on a diameter-19 path, then an
       incremental update on top) overflow the JVM stack serializing task
       closures (StackOverflowError in ObjectOutputStream).
    """
    df = df.localCheckpoint(eager=True)
    return df.sparkSession.createDataFrame(df.rdd, df.schema)


@contextmanager
def aqe_disabled(spark):
    """Disable AQE for an iterative kernel's *entire* run — including the
    one-time persist of loop-invariant inputs.

    Two measured effects at local[32], 15M edges (see BENCH/BASELINE.md):
    (a) AQE re-plans every superstep's fixed-shape query (~2-3s serial driver
    time each); (b) a loop-invariant table persisted under AQE carries an
    adaptive cached plan whose runtime-coalesced partitioning forces a
    re-shuffle of the big side in every subsequent superstep join (~2x
    superstep cost even with AQE off in the loop). Iterative kernels handle
    skew structurally (orientation, salting, partial aggregation), so AQE
    buys nothing inside the loop; it is restored for one-shot queries."""
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


class SuperstepRunner:
    """Run ``state <- step(state, i)`` until ``converged(info)`` or max iters.

    ``step_fn(state, iteration) -> (new_state, info_dict)``. ``info_dict``
    carries whatever the kernel measures (delta norm, changed-node count,
    edges processed); ``converged_fn(info) -> bool`` reads it. State
    DataFrames must be deterministic functions of the previous state so that
    resume is exact.
    """

    def __init__(
        self,
        spark,
        run_id: str = "run",
        state_dir: str | None = None,
        checkpoint_every: int = 5,
        use_local_checkpoint: bool = True,
        catalog=None,
    ):
        self.spark = spark
        self.run_id = run_id
        self.state_dir = state_dir
        self.checkpoint_every = max(1, checkpoint_every)
        self.use_local_checkpoint = use_local_checkpoint
        # Optional sources.catalog.TableCatalog: when set, durable state
        # commits go through the Iceberg facade (Iceberg snapshot per commit
        # on a cluster with the runtime jars; atomic parquet iter=N dirs in
        # the fallback) under table name ``<run_id>_state``. metrics.jsonl
        # still needs state_dir (or is skipped).
        self.catalog = catalog

    @property
    def _state_table(self) -> str:
        return f"{self.run_id}_state"

    # -- state layout --------------------------------------------------------
    def _iter_path(self, i: int) -> str:
        return os.path.join(self.state_dir, self.run_id, f"iter={i}")

    def _metrics_path(self) -> str:
        return os.path.join(self.state_dir, self.run_id, "metrics.jsonl")

    def latest_committed(self) -> int | None:
        """Highest iteration with a _SUCCESS marker (atomic parquet commit);
        with a catalog, the facade's snapshot/iter=N record."""
        if self.catalog is not None:
            return self.catalog.latest_state_iteration(self._state_table)
        if not self.state_dir:
            return None
        base = os.path.join(self.state_dir, self.run_id)
        if not os.path.isdir(base):
            return None
        its = []
        for name in os.listdir(base):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(base, name, "_SUCCESS")
            ):
                its.append(int(name.split("=", 1)[1]))
        return max(its) if its else None

    def _commit(self, state: DataFrame, i: int) -> DataFrame:
        if self.catalog is not None:
            self.catalog.commit_state(state, self._state_table, i)
            return self.catalog.read_state(self._state_table, i)
        path = self._iter_path(i)
        state.write.mode("overwrite").parquet(path)
        fresh = self.spark.read.parquet(path)
        # drop older iterations to bound storage (keep last 2 for safety)
        base = os.path.join(self.state_dir, self.run_id)
        for name in os.listdir(base):
            if name.startswith("iter=") and int(name.split("=", 1)[1]) < i - 1:
                shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        return fresh

    def _log_metrics(self, rec: dict) -> None:
        if not self.state_dir:
            return
        os.makedirs(os.path.dirname(self._metrics_path()), exist_ok=True)
        with open(self._metrics_path(), "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- the loop ------------------------------------------------------------
    def run(
        self,
        init_state: DataFrame | Callable[[], DataFrame],
        step_fn: Callable[[DataFrame, int], tuple[DataFrame, dict]],
        converged_fn: Callable[[dict], bool] | None = None,
        max_iterations: int = 100,
        resume: bool = False,
    ) -> SuperstepResult:
        start_iter = 0
        durable_sink = self.state_dir or self.catalog is not None
        last = self.latest_committed() if (resume and durable_sink) else None
        if last is not None:
            state = (
                self.catalog.read_state(self._state_table, last)
                if self.catalog is not None
                else self.spark.read.parquet(self._iter_path(last))
            )
            start_iter = last + 1
        else:
            state = init_state() if callable(init_state) else init_state
            if self.use_local_checkpoint:
                state = state.localCheckpoint(eager=True)

        # Iterative loops run with AQE off (see aqe_disabled). Kernels that
        # persist loop-invariant inputs should wrap their WHOLE run in
        # aqe_disabled; this inner guard covers direct runner users.
        with aqe_disabled(self.spark):
            return self._loop(state, step_fn, converged_fn, max_iterations, start_iter)

    def _loop(self, state, step_fn, converged_fn, max_iterations, start_iter):
        metrics: list[dict] = []
        converged = False
        i = start_iter
        while i < max_iterations:
            t0 = time.monotonic()
            state_next, info = step_fn(state, i)
            # step functions that must materialize state themselves (e.g. to
            # fold the convergence agg / changed-count into the same action)
            # signal it with info["_checkpointed"]=True — the runner then
            # skips its own checkpoint, avoiding a REDUNDANT second
            # materialization + block-store copy of the full state per
            # superstep (state is O(n) rows: at web scale that copy is the
            # single largest avoidable per-superstep cost).
            already_ckpt = bool(info.pop("_checkpointed", False))
            durable = (self.state_dir or self.catalog is not None) and (
                (i + 1) % self.checkpoint_every == 0 or i + 1 == max_iterations
            )
            if durable:
                state_next = self._commit(state_next, i)
            elif self.use_local_checkpoint and not already_ckpt:
                state_next = state_next.localCheckpoint(eager=True)
            wall = time.monotonic() - t0
            rec = {
                "run_id": self.run_id,
                "iteration": i,
                "wall_sec": round(wall, 4),
                **{k: v for k, v in info.items()},
            }
            metrics.append(rec)
            self._log_metrics(rec)
            state = state_next
            i += 1
            if converged_fn is not None and converged_fn(info):
                converged = True
                if (self.state_dir or self.catalog is not None) and not durable:
                    state = self._commit(state, i - 1)
                break
        return SuperstepResult(state=state, iterations=i - start_iter, converged=converged, metrics=metrics)
