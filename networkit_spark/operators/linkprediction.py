"""Link prediction indices — pure join/agg family.

Reference: ``networkit/linkprediction.pyx:32-941`` + ``cpp/linkprediction/``
(16 files). Each index scores a node pair (u, v); the reference evaluates
explicit pairs, we compute either (a) scores for a caller-provided pairs
DataFrame or (b) all wedge-connected pairs (the candidate set every
neighbor-based index is nonzero on).

Formulas (pyx lines):
- CommonNeighborsIndex (:170):   |N(u) ∩ N(v)|
- JaccardIndex (:221):           |∩| / |∪|
- AdamicAdarIndex (:247):        sum_{w in ∩} 1/ln(deg(w))
- ResourceAllocationIndex (:496):sum_{w in ∩} 1/deg(w)
- PreferentialAttachment (:194): deg(u) * deg(v)
- TotalNeighbors (:394):         |N(u) ∪ N(v)|
- NeighborsMeasure (:421):       |N(u) ∩ N(v)| (on directed: forward wedge)
- UDegreeIndex / VDegreeIndex (:274,:298): deg(u) / deg(v)
- SameCommunityIndex (:448):     1 if same community else 0

The wedge join ``E ⋈ E on shared middle node`` is the one shuffle; hub
middles are the skew risk — the candidate enumeration therefore excludes
middles above ``max_middle_degree`` when set (the standard web-scale guard:
a 10^6-degree hub contributes 10^12 pairs and ~0 information).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _degrees(und_edges: DataFrame) -> DataFrame:
    return und_edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))


def wedge_pairs(
    und_edges: DataFrame, max_middle_degree: int | None = None
) -> DataFrame:
    """(u, v, cn, aa, ra): all pairs u<v sharing >=1 neighbor, with common-
    neighbor count and the AA / RA partial sums computed in the same agg."""
    e = und_edges.select("src", "dst")
    deg = _degrees(und_edges)
    mid = e.join(deg.withColumnRenamed("node", "src"), "src")
    if max_middle_degree is not None:
        mid = mid.filter(F.col("deg") <= max_middle_degree)
    a = mid.select(F.col("src").alias("w"), F.col("dst").alias("u"), F.col("deg").alias("wdeg"))
    b = mid.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("cn"),
            F.sum(1.0 / F.log("wdeg")).alias("aa"),
            F.sum(1.0 / F.col("wdeg")).alias("ra"),
        )
    )


def link_prediction_scores(
    und_edges: DataFrame,
    pairs: DataFrame | None = None,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """(u, v, cn, jaccard, aa, ra, pa, total_neighbors, u_deg, v_deg) for the
    candidate pairs (or the given ``pairs(u, v)``)."""
    wp = wedge_pairs(und_edges, max_middle_degree)
    if pairs is not None:
        wp = pairs.select("u", "v").join(wp, ["u", "v"], "left").fillna(
            {"cn": 0, "aa": 0.0, "ra": 0.0}
        )
    deg = _degrees(und_edges)
    out = (
        wp.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("u_deg")), "u", "left")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("v_deg")), "v", "left")
        .fillna({"u_deg": 0, "v_deg": 0})
    )
    union_size = F.col("u_deg") + F.col("v_deg") - F.col("cn")
    return out.select(
        "u",
        "v",
        "cn",
        F.when(union_size > 0, F.col("cn") / union_size).otherwise(0.0).alias("jaccard"),
        "aa",
        "ra",
        (F.col("u_deg") * F.col("v_deg")).cast("long").alias("pa"),
        union_size.cast("long").alias("total_neighbors"),
        "u_deg",
        "v_deg",
    )


def missing_links(
    und_edges: DataFrame, scores: DataFrame, k: int | None = None
) -> DataFrame:
    """Candidate pairs NOT already edges, ranked by common neighbors.
    Ref: ``MissingLinksFinder`` (:730) + ``PredictionsSorter`` (:941)."""
    existing = und_edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    out = scores.join(existing, ["u", "v"], "left_anti").orderBy(
        F.desc("cn"), F.asc("u"), F.asc("v")
    )
    return out.limit(k) if k else out


def katz_index(
    und_edges: DataFrame,
    pairs: DataFrame,
    beta: float = 0.005,
    max_path_length: int = 5,
) -> DataFrame:
    """(u, v, katz): truncated Katz index
    ``sum_{l=1..L} beta^l * |paths of length l from u to v|``
    (ref: ``KatzIndex``, ``linkprediction.pyx:138``; defaults mirror the
    reference's beta=0.005, maxPathLength=5).

    Distributed: path-count propagation from the PAIR SOURCES only (semi-
    join on u) — l-1 adjacency joins, each a shuffle on the middle node;
    never materializes all-pairs path counts.
    """
    e = und_edges.select("src", "dst")
    srcs = pairs.select(F.col("u")).distinct()
    # walk-count table from relevant sources: (u, node, cnt) for length l
    cur = (
        e.join(srcs.withColumnRenamed("u", "src"), "src", "left_semi")
        .select(F.col("src").alias("u"), F.col("dst").alias("node"), F.lit(1.0).alias("cnt"))
        .groupBy("u", "node")
        .agg(F.sum("cnt").alias("cnt"))
    )
    total = cur.select("u", "node", (F.lit(beta) * F.col("cnt")).alias("s"))
    for l in range(2, max_path_length + 1):
        cur = (
            cur.join(e.withColumnRenamed("src", "node"), "node")
            .select("u", F.col("dst").alias("node"), "cnt")
            .groupBy("u", "node")
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        total = total.unionByName(
            cur.select("u", "node", (F.lit(beta**l) * F.col("cnt")).alias("s"))
        )
    scores = total.groupBy("u", "node").agg(F.sum("s").alias("katz"))
    return (
        pairs.select("u", "v")
        .join(scores.withColumnRenamed("node", "v"), ["u", "v"], "left")
        .fillna({"katz": 0.0})
    )


def roc_curve(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bins: int | None = 1000,
) -> DataFrame:
    """(threshold, fpr, tpr) ROC points, descending-threshold order
    (ref: ``ROCMetric``, ``linkprediction.pyx:677``).

    Scale: group by score value (optionally quantile-bucketed to <=``bins``
    distinct thresholds — float scores would otherwise make the curve as
    large as the input), then cumulate over the SMALL per-threshold table.
    The cumulative window runs over <=bins rows, not the pair set.
    """
    s = scored.select(F.col(score_col).alias("s"), F.col(label_col).cast("int").alias("y"))
    if bins is not None:
        # quantile-bucket scores so the curve is bounded; the rank comes
        # from the distributed range-sort (plans/ids.py), not a single-
        # partition window
        from networkit_spark.plans.ids import global_min_rank

        n = s.count()
        s = (
            global_min_rank(s, "s", rank_col="_rk")
            .withColumn("s", (F.col("_rk") * bins / F.lit(max(n, 1))).cast("long"))
            .drop("_rk")
        )
    per = s.groupBy("s").agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    totals = per.agg(F.sum("pos"), F.sum("neg")).first()
    tp_total, fp_total = totals[0] or 0, totals[1] or 0
    cum = per.withColumn("tp", F.sum("pos").over(w)).withColumn("fp", F.sum("neg").over(w))
    return cum.select(
        F.col("s").alias("threshold"),
        (F.col("fp") / F.lit(float(fp_total or 1))).alias("fpr"),
        (F.col("tp") / F.lit(float(tp_total or 1))).alias("tpr"),
    ).orderBy(F.desc("threshold"))


def precision_recall_curve(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """(threshold, precision, recall) per distinct score, descending
    (ref: ``PrecisionRecallMetric``, ``linkprediction.pyx:703``). The
    cumulative window runs over the per-threshold table (<= distinct
    scores; neighbor-count-valued link-prediction scores have a small
    domain — for continuous scores use :func:`roc_curve`'s binning)."""
    from pyspark.sql import Window

    s = scored.select(F.col(score_col).alias("s"), F.col(label_col).cast("int").alias("y"))
    per = s.groupBy("s").agg(
        F.sum("y").alias("pos"), F.count("*").alias("n")
    )
    tp_total = s.agg(F.sum("y")).first()[0] or 0
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    cum = per.withColumn("tp", F.sum("pos").over(w)).withColumn("k", F.sum("n").over(w))
    return cum.select(
        F.col("s").alias("threshold"),
        (F.col("tp") / F.col("k")).alias("precision"),
        (F.col("tp") / F.lit(float(tp_total or 1))).alias("recall"),
    ).orderBy(F.desc("threshold"))


def auc_from_roc(roc: DataFrame) -> float:
    """Trapezoidal AUC over ROC points (driver-side over the small curve)."""
    pts = sorted((r["fpr"], r["tpr"]) for r in roc.collect())
    pts = [(0.0, 0.0)] + pts + [(1.0, 1.0)]
    auc = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        auc += (x1 - x0) * (y0 + y1) / 2.0
    return auc


def random_link_sample(und_edges: DataFrame, fraction: float, seed: int = 42):
    """Train/test split of undirected edges (RandomLinkSampler :522):
    returns (train_edges_symmetrized, held_out_pairs)."""
    canon = und_edges.filter(F.col("src") < F.col("dst"))
    held = canon.sample(fraction=fraction, seed=seed)
    train = canon.join(held, ["src", "dst"], "left_anti")
    train_sym = train.union(
        train.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return train_sym, held.select(F.col("src").alias("u"), F.col("dst").alias("v"))


def extended_link_prediction(
    und_edges: DataFrame,
    pairs: DataFrame,
    labels: DataFrame | None = None,
    n_nodes: int | None = None,
) -> DataFrame:
    """The remaining LinkPredictor battery for explicit ``pairs (u, v)``:

    - ``nbhd_distance`` (``NeighborhoodDistanceIndex.hpp:30-35``):
      |N(u) ∩ N(v)| / sqrt(deg(u) * deg(v))
    - ``neighbors_measure`` (``NeighborsMeasureIndex.hpp:29-40``): count of
      ordered neighbor pairs (a in N(u), b in N(v)) with a == b or
      (a, b) an edge — cn plus the u-a-b-v path count
    - ``adjusted_rand`` (``AdjustedRandIndex.cpp:15-43``): the reference
      computes BOTH "difference" terms with ``std::set_union`` (not
      set_difference), so b = c = |N(u) ∪ N(v)| — replicated verbatim
      for parity, quirk and all
    - ``same_community`` (``SameCommunityIndex.cpp:28-30``): same-label
      indicator for the given partition (the reference runs PLM; any
      (node, label) table works — determinism is the caller's choice)
    - ``total_neighbors`` (``TotalNeighborsIndex.hpp:31-33``):
      |N(u) ∪ N(v)| = deg(u) + deg(v) - cn (simple graph)
    - ``u_deg`` / ``v_deg`` (``UDegreeIndex.hpp`` / ``VDegreeIndex.hpp``)

    One wedge aggregation for cn, one two-hop join for the path term, two
    degree joins, one label join per endpoint — no driver-side loops.
    """
    spark = und_edges.sparkSession
    if n_nodes is None:
        n_nodes = und_edges.select("src").distinct().count()
    deg = _degrees(und_edges)
    e = und_edges.select("src", "dst")
    p = pairs.select("u", "v")
    # cn per pair (restricted to the pairs set before the count)
    nu = e.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    nv = e.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    cn = (
        p.join(nu, "u").join(nv, "v")
        .filter(F.col("a") == F.col("b"))
        .groupBy("u", "v").agg(F.count("*").alias("cn"))
    )
    # u-a-b-v path count (ordered (a, b); self-pair a==b counted in cn,
    # and the reference's `||` counts each (a,b) once, so a==b pairs that
    # are ALSO edges (self-loop) don't exist in a simple graph)
    paths = (
        p.join(nu, "u").join(nv, "v")
        .join(
            e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
        )
        .groupBy("u", "v").agg(F.count("*").alias("pp"))
    )
    out = (
        p.join(cn, ["u", "v"], "left").fillna({"cn": 0})
        .join(paths, ["u", "v"], "left").fillna({"pp": 0})
        .join(deg.select(F.col("node").alias("u"), F.col("deg").alias("u_deg")), "u", "left")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("v_deg")), "v", "left")
        .fillna({"u_deg": 0, "v_deg": 0})
    )
    if labels is not None:
        lab = labels.select("node", "label")
        out = (
            out.join(lab.select(F.col("node").alias("u"), F.col("label").alias("lu")), "u", "left")
            .join(lab.select(F.col("node").alias("v"), F.col("label").alias("lv")), "v", "left")
        )
        same = (F.col("lu").isNotNull() & (F.col("lu") == F.col("lv"))).cast("int")
    else:
        same = F.lit(None).cast("int")
    a = F.col("cn").cast("double")
    union = (F.col("u_deg") + F.col("v_deg") - F.col("cn")).cast("double")
    b = union
    c = union
    d = F.lit(float(n_nodes)) - union
    denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    return out.select(
        "u",
        "v",
        F.when(
            (F.col("u_deg") > 0) & (F.col("v_deg") > 0),
            F.round(a / F.sqrt(F.col("u_deg") * F.col("v_deg")), 7),
        ).otherwise(F.lit(0.0)).alias("nbhd_distance"),
        (F.col("cn") + F.col("pp")).cast("long").alias("neighbors_measure"),
        F.when(denom != 0, F.round(2 * (a * d - b * c) / denom, 7))
        .otherwise(F.lit(0.0)).alias("adjusted_rand"),
        same.alias("same_community"),
        (F.col("u_deg") + F.col("v_deg") - F.col("cn")).cast("long").alias("total_neighbors"),
        "u_deg",
        "v_deg",
    )


def common_neighbors(und_edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """NeighborhoodUtility::getCommonNeighbors (NeighborhoodUtility.cpp:36-47)
    batched for a pairs table -> (u, v, neighbor), sorted neighbor order
    recoverable by an ORDER BY."""
    e = und_edges.select("src", "dst")
    nu = e.select(F.col("src").alias("u"), F.col("dst").alias("neighbor"))
    nv = e.select(F.col("src").alias("v"), F.col("dst").alias("neighbor"))
    return pairs.select("u", "v").join(nu, "u").join(nv, ["v", "neighbor"])


def neighbors_union(und_edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """NeighborhoodUtility::getNeighborsUnion (NeighborhoodUtility.cpp:23-34)
    batched -> (u, v, neighbor) distinct over both endpoint neighborhoods."""
    e = und_edges.select("src", "dst")
    p = pairs.select("u", "v")
    nu = p.join(e.select(F.col("src").alias("u"), F.col("dst").alias("neighbor")), "u")
    nv = p.join(e.select(F.col("src").alias("v"), F.col("dst").alias("neighbor")), "v")
    return nu.select("u", "v", "neighbor").union(nv.select("u", "v", "neighbor")).distinct()


def sort_predictions(scores: DataFrame, score_col: str) -> DataFrame:
    """PredictionsSorter (PredictionsSorter.cpp): descending score, ties by
    ascending (u, v) — expressed as a declarative global sort."""
    return scores.orderBy(F.col(score_col).desc(), F.col("u").asc(), F.col("v").asc())


def threshold_by_score(scores: DataFrame, score_col: str, min_score: float) -> DataFrame:
    """LinkThresholder::byScore (:19-35): pairs with score >= minScore,
    returned pair-sorted."""
    return scores.filter(F.col(score_col) >= min_score).select("u", "v").orderBy("u", "v")


def threshold_by_count(scores: DataFrame, score_col: str, k: int) -> DataFrame:
    """LinkThresholder::byCount: top-k under the PredictionsSorter order
    (score desc, then (u, v) asc), returned pair-sorted."""
    top = scores.orderBy(F.desc(score_col), F.asc("u"), F.asc("v")).limit(k)
    return top.select("u", "v").orderBy("u", "v")


def threshold_by_percentage(scores: DataFrame, score_col: str, pct: float) -> DataFrame:
    """LinkThresholder::byPercentage: byCount with k = pct * #predictions."""
    k = int(pct * scores.count())
    return threshold_by_count(scores, score_col, k)


# ---------------------------------------------------------------------------
# ML glue (linkprediction.pyx:985-1060: trainClassifier / getFeatures /
# getLabels). The reference column-stacks predictor scores into numpy
# features and fits an sklearn classifier; the Spark-first twin keeps the
# features as DataFrame columns and fits a pyspark.ml estimator — the
# feature table never leaves the cluster.
# ---------------------------------------------------------------------------

FEATURE_COLS = ("cn", "jaccard", "aa", "ra", "pa", "total_neighbors")


def get_labels(pairs: DataFrame, und_edges: DataFrame) -> DataFrame:
    """(u, v, label) — 1 if (u, v) is an edge of the ground-truth graph,
    else 0 (``getLabels``, linkprediction.pyx:1036)."""
    existing = (
        und_edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return (
        pairs.select("u", "v")
        .join(existing, ["u", "v"], "left")
        .fillna({"label": 0})
    )


def get_features(
    pairs: DataFrame,
    und_edges: DataFrame,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
) -> DataFrame:
    """(u, v, <feature columns>) for the given pairs — the reference's
    per-predictor column stack (``getFeatures``, linkprediction.pyx:1016)
    as one wedge-aggregation pass instead of p.runOn per predictor."""
    scores = link_prediction_scores(und_edges, pairs=pairs)
    return scores.select("u", "v", *feature_cols)


def train_link_classifier(
    training_pairs: DataFrame,
    training_graph: DataFrame,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    estimator=None,
):
    """Fit a classifier on predictor features (``trainClassifier``,
    linkprediction.pyx:985). ``training_graph`` is the symmetrized edge
    table that provides BOTH the features and the 0/1 labels. Returns a
    fitted ``pyspark.ml`` PipelineModel whose ``transform`` adds
    ``probability``/``prediction`` to any (u, v, features) frame."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    data = get_features(training_pairs, training_graph, feature_cols).join(
        get_labels(training_pairs, training_graph), ["u", "v"]
    )
    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features"
    )
    est = estimator or LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=50, regParam=0.01
    )
    return Pipeline(stages=[assembler, est]).fit(data)


def predict_links(
    model,
    pairs: DataFrame,
    und_edges: DataFrame,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
) -> DataFrame:
    """(u, v, score) — classifier P(link) for each pair, from the same
    feature pipeline used in training."""
    feats = get_features(pairs, und_edges, feature_cols)
    out = model.transform(feats)
    # element 1 of the probability vector = P(label=1)
    from pyspark.ml.functions import vector_to_array

    return out.select(
        "u", "v", vector_to_array("probability")[1].alias("score")
    )
