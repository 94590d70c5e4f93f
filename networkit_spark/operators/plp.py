"""PLP — label propagation community detection.

Reference: ``cpp/community/PLP.cpp:24-117`` (header ``PLP.hpp:26-52``;
Python ``networkit/community.pyx:772-845``). Semantics reproduced:

1. init: unique label per node (singleton partition) unless a base
   clustering is given (``PLP.cpp:30-34``);
2. ``updateThreshold = n/1e5`` when unset (``:39-42``);
3. iterate while ``nUpdated > updateThreshold and nIterations <
   maxIterations`` (``:69``): each active non-isolated node adopts the
   **heaviest** incident label (sum of incident edge weights per neighbor
   label, ``:85-88``), ties -> smallest label id (``std::max_element`` over
   an ordered map keeps the first maximum, ``:91-96``);
4. isolated nodes stay singletons (``:50-61``).

The reference sweep is *semi-synchronous* (in-sweep updates visible under
OpenMP -> nondeterministic run-to-run). We implement the **synchronous**
variant: deterministic, order-independent, and the one with a clean
relational meaning — per-superstep

    cand(u, l) = sum of w(u,v) over neighbors v with label(v) = l
    label'(u)  = argmax_l (cand, tie-> min l)

expressed as hash-agg + ``max_by``-style struct max (no window sort). The
reference's own tests compare PLP *structurally* (planted partitions /
modularity — ``CommunityGTest.cpp:204-281``), which is the bar we use too.

Scale: identical shuffle profile to PageRank (edges x labels join on src,
agg by dst) + one more agg for the argmax; the frontier optimization
(propagate only changed nodes) applies verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.plans.iteration import SuperstepRunner, aqe_disabled


@dataclass
class PLPResult:
    labels_df: DataFrame  # (node long, label long)
    iterations: int
    converged: bool
    metrics: list

    def get_partition(self) -> DataFrame:
        return self.labels_df

    def number_of_communities(self) -> int:
        return self.labels_df.select("label").distinct().count()

    def community_sizes(self) -> DataFrame:
        return self.labels_df.groupBy("label").agg(F.count("*").alias("size"))


def _argmax_labels(cand: DataFrame) -> DataFrame:
    """argmax by (weight desc, label asc) without a window sort:
    max(struct(w, -label)) — one hash agg, skew-safe via partial agg."""
    return (
        cand.groupBy("node")
        .agg(F.max(F.struct(F.col("w"), (-F.col("label")).alias("nl"))).alias("top"))
        .select("node", (-F.col("top.nl")).alias("nlabel"))
    )


class PLP:
    def __init__(
        self,
        update_threshold: int | None = None,
        max_iterations: int = 100,
    ):
        self.update_threshold = update_threshold
        self.max_iterations = max_iterations

    def run(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        base_clustering: DataFrame | None = None,
        runner: SuperstepRunner | None = None,
        resume: bool = False,
    ) -> PLPResult:
        """``edges`` must be symmetrized (undirected graph, both directions)."""
        spark = edges.sparkSession
        with aqe_disabled(spark):
            return self._run(edges, nodes, base_clustering, runner, resume)

    def _run(self, edges, nodes, base_clustering, runner, resume):
        spark = edges.sparkSession
        runner = runner or SuperstepRunner(spark, run_id="plp")
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        n = nodes.count()
        theta = (
            self.update_threshold
            if self.update_threshold is not None
            else max(0, int(n / 1e5))
        )
        shuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

        # loop-invariant edge table pre-partitioned on the per-sweep join
        # key (the PageRank contrib recipe): the state join reuses the
        # persisted partitioning, so only the n-row label table shuffles
        # per sweep — never the m-row edge table
        e = (
            edges.select("src", "dst", "weight")
            .repartition(shuf, "src")
            .persist()
        )
        m = e.count()

        if base_clustering is not None:
            init = base_clustering.select("node", "label")
        else:
            init = nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))

        # frontier (active-set): only nodes with a changed neighbor can adopt
        # a different label next sweep (PLP.cpp:98-104 reactivation); those
        # nodes still need their FULL neighborhood tally, so the step is
        # two-phase: affected = N_out(changed); recompute edges into affected.
        # The dst-side semi-join cannot reuse e's src partitioning, so the
        # pruning only runs once the frontier is small enough to pay for
        # itself (< n/2 changed), and broadcasts the affected set when the
        # changed count bounds it under ~1M rows.
        frontier = {"df": None, "changed": None}

        def step(state: DataFrame, i: int):
            edges_in = e
            ch = frontier["changed"]
            if frontier["df"] is not None and ch is not None and ch < n / 2:
                affected = (
                    e.join(
                        frontier["df"].withColumnRenamed("node", "src"), "src", "left_semi"
                    )
                    .select("dst")
                    .distinct()
                )
                if ch < 1_000_000:
                    affected = F.broadcast(affected)
                edges_in = e.join(affected, "dst", "left_semi")
            # shuffle-hash hints: avoid per-sweep sort-merge re-sorts of the
            # persisted edge table (checkpointed state has unknown stats).
            # ONE dst exchange feeds BOTH aggregations: hash-partitioning on
            # dst alone satisfies the (dst, label) grouping AND the argmax
            # grouping, so the tally agg and the struct-max agg run
            # exchange-free back to back.
            msgs = edges_in.join(
                state.select(F.col("node").alias("src"), "label").hint("shuffle_hash"),
                "src",
            ).select("dst", "label", "weight")
            cand = (
                msgs.repartition(shuf, "dst")
                .groupBy("dst", "label")
                .agg(F.sum("weight").alias("w"))
            )
            best = (
                cand.groupBy("dst")
                .agg(F.max(F.struct(F.col("w"), (-F.col("label")).alias("nl"))).alias("top"))
                .select(F.col("dst").alias("node"), (-F.col("top.nl")).alias("nlabel"))
            )
            new = (
                state.join(best.hint("shuffle_hash"), "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("nlabel"), F.col("label")).alias("label"),
                    F.col("label").alias("prev"),
                )
                # lazy: the changed-count action materializes the checkpoint
                # (one job); _checkpointed skips the runner's re-copy
                .localCheckpoint(eager=False)
            )
            changed_df = new.filter(F.col("label") != F.col("prev")).select("node")
            changed = changed_df.count()
            frontier["df"] = changed_df if changed else None
            frontier["changed"] = changed
            return new.select("node", "label"), {
                "changed": changed, "edges_processed": m, "_checkpointed": True,
            }

        res = runner.run(
            init,
            step,
            converged_fn=lambda info: info["changed"] <= theta,
            max_iterations=self.max_iterations,
            resume=resume,
        )
        e.unpersist()
        return PLPResult(
            labels_df=res.state,
            iterations=res.iterations,
            converged=res.converged,
            metrics=res.metrics,
        )


def plp_fixed(edges: DataFrame, nodes: DataFrame, iterations: int) -> DataFrame:
    """Fixed-iteration synchronous PLP (deterministic, oracle-expressible)."""
    labels = nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    for _ in range(iterations):
        cand = (
            edges.join(labels.select(F.col("node").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.sum("weight").alias("w"))
        )
        best = _argmax_labels(cand)
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce(F.col("nlabel"), F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


# ---------------------------------------------------------------------------
# LPDegreeOrdered (LPDegreeOrdered.cpp:18-90): label propagation sweeping
# nodes in increasing degree order, each node seeing labels already updated
# earlier in the same sweep. The literal order is a sequential chain; the
# scale-honest parallel analog stages each sweep into ascending DEGREE-CLASS
# buckets — all nodes of a bucket update synchronously, seeing the current
# labels (which already include this sweep's lower-degree buckets). Bucket
# boundaries are degree-value thresholds (no global sort / single-task
# window). Counts are UNWEIGHTED (+1 per neighbor) like the reference
# (labelCounts[lw] += 1); reference tie-break is hash-map order
# (unspecified) — here pinned deterministic: highest count, then smallest
# label.
# ---------------------------------------------------------------------------

LP_DEG_THRESHOLDS = (1, 3)  # buckets: deg<=1 | deg<=3 | rest


def _degree_bucket(deg_col, thresholds=LP_DEG_THRESHOLDS):
    b = F.lit(len(thresholds))
    for i, t in reversed(list(enumerate(thresholds))):
        b = F.when(deg_col <= t, F.lit(i)).otherwise(b)
    return b


def lp_degree_ordered_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    sweeps: int,
    thresholds=LP_DEG_THRESHOLDS,
) -> DataFrame:
    """Fixed-sweep degree-ordered LP (deterministic, oracle-expressible):
    ``sweeps`` passes, each staged over len(thresholds)+1 ascending degree
    buckets. Returns (node, label). ``edges`` symmetrized undirected."""
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    labels = (
        nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
        .join(deg, "node", "left")
        .select(
            "node", "label",
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .withColumn("bkt", _degree_bucket(F.col("deg"), thresholds))
        .localCheckpoint(eager=True)
    )
    n_buckets = len(thresholds) + 1
    for _ in range(sweeps):
        for b in range(n_buckets):
            # only bucket-b nodes update this stage: semi-join prunes the
            # gather to their in-edges before the count shuffle
            targets = labels.filter(
                (F.col("bkt") == b) & (F.col("deg") > 0)
            ).select(F.col("node").alias("dst"))
            cand = (
                edges.join(targets, "dst", "leftsemi")
                .join(labels.select(F.col("node").alias("src"), "label"), "src")
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.count("*").cast("double").alias("w"))
            )
            best = _argmax_labels(cand)
            labels = (
                labels.join(best, "node", "left")
                .select(
                    "node",
                    F.when(
                        (F.col("bkt") == b) & (F.col("deg") > 0) & F.col("nlabel").isNotNull(),
                        F.col("nlabel"),
                    )
                    .otherwise(F.col("label"))
                    .alias("label"),
                    "deg", "bkt",
                )
                .localCheckpoint(eager=True)
            )
    return labels.select("node", "label")


class LPDegreeOrdered:
    """Convergence-driven wrapper: sweeps until updated labels <= n/1e5
    (the reference's theta) or ``max_sweeps``."""

    def __init__(self, max_sweeps: int = 100, thresholds=LP_DEG_THRESHOLDS):
        self.max_sweeps = max_sweeps
        self.thresholds = thresholds

    def run(self, edges: DataFrame, nodes: DataFrame | None = None) -> PLPResult:
        nodes = nodes if nodes is not None else nodes_from_edges(edges)
        n = nodes.count()
        theta = max(0, int(n / 1e5))
        cur = lp_degree_ordered_fixed(edges, nodes, 1, self.thresholds)
        sweeps = 1
        converged = False
        while sweeps < self.max_sweeps:
            nxt = _lp_degree_sweep_from(edges, cur, self.thresholds)
            sweeps += 1
            changed = (
                nxt.alias("a")
                .join(cur.alias("b"), "node")
                .filter(F.col("a.label") != F.col("b.label"))
                .count()
            )
            cur = nxt
            if changed <= theta:
                converged = True
                break
        return PLPResult(labels_df=cur, iterations=sweeps, converged=converged, metrics=[])


def _lp_degree_sweep_from(edges: DataFrame, labels: DataFrame, thresholds=LP_DEG_THRESHOLDS) -> DataFrame:
    """One degree-staged sweep starting from an existing (node, label)."""
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    st = (
        labels.select("node", "label")
        .join(deg, "node", "left")
        .select("node", "label", F.coalesce("deg", F.lit(0)).alias("deg"))
        .withColumn("bkt", _degree_bucket(F.col("deg"), thresholds))
        .localCheckpoint(eager=True)
    )
    for b in range(len(thresholds) + 1):
        targets = st.filter(
            (F.col("bkt") == b) & (F.col("deg") > 0)
        ).select(F.col("node").alias("dst"))
        cand = (
            edges.join(targets, "dst", "leftsemi")
            .join(st.select(F.col("node").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").cast("double").alias("w"))
        )
        best = _argmax_labels(cand)
        st = (
            st.join(best, "node", "left")
            .select(
                "node",
                F.when(
                    (F.col("bkt") == b) & (F.col("deg") > 0) & F.col("nlabel").isNotNull(),
                    F.col("nlabel"),
                )
                .otherwise(F.col("label"))
                .alias("label"),
                "deg", "bkt",
            )
            .localCheckpoint(eager=True)
        )
    return st.select("node", "label")
