"""AffectedNodes — which nodes an edge event touches, with closeness bounds.

Reference: ``cpp/distance/AffectedNodes.cpp``. Given the POST-event graph
and one edge event (u, v):

* addition (undirected, ``:31-174``): the affected set is the union of the
  nodes whose hop distance from u or from v improved (the reference's
  pruned BFS discovers exactly those — a BFS first touch is the true new
  distance, and improving paths only cross improving nodes). For each
  affected node the reference also reports the OLD distance
  ``min(d_old_u, d_old_v)`` and an upper bound on its harmonic-closeness
  improvement derived from the level-count histograms before/after.
* removal (undirected, ``:253-287``): affected = distance from u or v
  INCREASED; distances = min of the new BFS distances; no improvement
  bounds (the reference leaves them 0).
* directed twins use reverse BFS from v (``:176-249``).

Distributed shape: four plain BFS waves (old/new x u/v — "old" is the new
edge table with the event edge toggled back, cheaper and exactly
equivalent to the reference's without-start-neighbor walk), one full-outer
join per side to classify, and diameter-sized level histograms collected
to the driver for the closeness-bound convolution (O(diam^2) scalar work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.operators.distance import bfs_distances

_INF = float("inf")


def _toggle_edge(edges: DataFrame, u: int, v: int, add: bool, directed: bool) -> DataFrame:
    """Return ``edges`` with the (u, v) event edge added or removed."""
    spark = edges.sparkSession
    pairs = [(u, v)] if directed else [(u, v), (v, u)]
    delta = spark.createDataFrame(pairs, "src long, dst long")
    if add:
        return edges.select("src", "dst").union(delta).distinct()
    return edges.join(delta, ["src", "dst"], "left_anti").select("src", "dst")


def _dist_map(edges: DataFrame, source: int, reverse: bool = False) -> DataFrame:
    e = edges.select("src", "dst")
    if reverse:
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return bfs_distances(e, source)


def _histogram(dist: DataFrame) -> dict[int, int]:
    return {
        int(r["dist"]): int(r["c"])
        for r in dist.filter(
            (F.col("dist") > 0) & (F.col("dist") < F.lit(_INF))
        ).groupBy("dist").agg(F.count("*").alias("c")).collect()
    }


def _level_improvement(hist_other_new: dict, hist_other_prev: dict, max_level: int) -> dict:
    """levelImprovement[i] = sum_{j=1..numLevels_new} (new[j] - prev[j]) / (i + j)
    (``AffectedNodes.cpp:146-166``; j is capped at the NEW histogram's max
    level — prev-only levels beyond it are excluded, as in the reference)."""
    out = {}
    j_max = max(hist_other_new, default=0)
    for i in range(1, max_level + 1):
        out[i] = sum(
            (hist_other_new.get(j, 0) - hist_other_prev.get(j, 0)) / (i + j)
            for j in range(1, j_max + 1)
        )
    return out


def affected_nodes(
    post_edges: DataFrame,
    event_type: str,
    u: int,
    v: int,
    directed: bool = False,
):
    """Returns ``(nodes_df, improvements)``:

    ``nodes_df`` — (node, dist) the affected nodes with the reference's
    reported distance (min old BFS distance for additions, min new for
    removals). ``improvements`` — dict node -> harmonic-closeness
    improvement upper bound (additions only, else empty).

    ``post_edges`` is the edge table AFTER the event (directed rows for
    directed graphs, symmetrized rows otherwise), matching the reference's
    calling convention.
    """
    add = event_type == "EDGE_ADDITION"
    old_edges = _toggle_edge(post_edges, u, v, add=not add, directed=directed)
    new_edges = post_edges

    if directed:
        return _affected_directed(old_edges, new_edges, u, v, add)

    old_u = _dist_map(old_edges, u).withColumnRenamed("dist", "od")
    old_v = _dist_map(old_edges, v).withColumnRenamed("dist", "od")
    new_u = _dist_map(new_edges, u).withColumnRenamed("dist", "nd")
    new_v = _dist_map(new_edges, v).withColumnRenamed("dist", "nd")

    def classify(old, new):
        j = old.join(new, "node", "full").select(
            "node",
            F.coalesce("od", F.lit(_INF)).alias("od"),
            F.coalesce("nd", F.lit(_INF)).alias("nd"),
        )
        return j.filter(F.col("nd") < F.col("od")) if add else j.filter(
            F.col("nd") > F.col("od")
        )

    aff_u = classify(old_u, new_u)
    aff_v = classify(old_v, new_v)

    # reported distance: min(old_u, old_v) for additions (`:72-74`),
    # min(new_u, new_v) for removals (`:285-287`)
    du = (old_u if add else new_u).withColumnRenamed("od" if add else "nd", "d1")
    dv = (old_v if add else new_v).withColumnRenamed("od" if add else "nd", "d2")
    aff = aff_u.select("node").union(aff_v.select("node")).distinct()
    nodes_df = (
        aff.join(du, "node", "left")
        .join(dv, "node", "left")
        .select(
            "node",
            F.least(
                F.coalesce("d1", F.lit(_INF)), F.coalesce("d2", F.lit(_INF))
            ).alias("dist"),
        )
    )

    improvements: dict[int, float] = {}
    if add:
        # completed new distances: min(new, old) per side (`:80-84`)
        def completed(old, new):
            return old.join(new, "node", "full").select(
                "node",
                F.least(
                    F.coalesce("od", F.lit(_INF)), F.coalesce("nd", F.lit(_INF))
                ).alias("dist"),
            )

        comp_u = completed(old_u, new_u)
        comp_v = completed(old_v, new_v)
        prev_hu = _histogram(old_u.withColumnRenamed("od", "dist"))
        prev_hv = _histogram(old_v.withColumnRenamed("od", "dist"))
        new_hu = _histogram(comp_u)
        new_hv = _histogram(comp_v)
        lvl_u = max(new_hu, default=0)
        lvl_v = max(new_hv, default=0)
        # levelImprovementU sums over V's histograms and vice versa
        li_u = _level_improvement(new_hv, prev_hv, lvl_u)
        li_v = _level_improvement(new_hu, prev_hu, lvl_v)
        cu = {r["node"]: r["dist"] for r in comp_u.collect()}
        cv = {r["node"]: r["dist"] for r in comp_v.collect()}
        # affectedU first, affectedV second (second write wins, `:168-174`)
        for r in aff_u.collect():
            improvements[r["node"]] = li_u.get(cv.get(r["node"], _INF), 0.0)
        for r in aff_v.collect():
            improvements[r["node"]] = li_v.get(cu.get(r["node"], _INF), 0.0)
    return nodes_df, improvements


def _affected_directed(old_edges, new_edges, u, v, add):
    """Directed twin (``:176-249`` addition, ``:289-302`` removal): one
    reverse-BFS pair from v decides the affected set; additions also bound
    the harmonic-closeness improvements via the forward histograms from u."""
    old_v = _dist_map(old_edges, v, reverse=True).withColumnRenamed("dist", "od")
    new_v = _dist_map(new_edges, v, reverse=True).withColumnRenamed("dist", "nd")
    j = old_v.join(new_v, "node", "full").select(
        "node",
        F.coalesce("od", F.lit(_INF)).alias("od"),
        F.coalesce("nd", F.lit(_INF)).alias("nd"),
    )
    aff = j.filter(F.col("nd") < F.col("od")) if add else j.filter(F.col("nd") > F.col("od"))
    if add:
        old_u = _dist_map(old_edges, u, reverse=True).withColumnRenamed("dist", "odu")
        nodes_df = (
            aff.join(old_u, "node", "left")
            .select(
                "node",
                F.least(F.col("od"), F.coalesce("odu", F.lit(_INF))).alias("dist"),
            )
        )
        old_fu = _dist_map(old_edges, u).withColumnRenamed("dist", "od")
        new_fu = _dist_map(new_edges, u).withColumnRenamed("dist", "nd")
        comp_u = old_fu.join(new_fu, "node", "full").select(
            "node",
            F.least(
                F.coalesce("od", F.lit(_INF)), F.coalesce("nd", F.lit(_INF))
            ).alias("dist"),
        )
        prev_hu = _histogram(old_fu.withColumnRenamed("od", "dist"))
        new_hu = _histogram(comp_u)
        nv = {r["node"]: r["nd"] for r in aff.collect()}
        lvl_v = int(max((d for d in nv.values() if d != _INF), default=0))
        li_v = _level_improvement(new_hu, prev_hu, lvl_v)
        improvements = {
            n: li_v.get(int(d) - 1, 0.0) for n, d in nv.items() if d != _INF
        }
    else:
        nodes_df = aff.select("node", F.col("nd").alias("dist"))
        improvements = {}
    return nodes_df, improvements
