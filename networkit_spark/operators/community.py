"""Community quality metrics + partition similarity + clustering generators.

Reference: ``cpp/community/Modularity.cpp:23-70`` (coverage minus expected
coverage), ``Coverage.cpp``, ``EdgeCut.cpp``, partition-similarity family
(``JaccardMeasure``, ``RandMeasure``, ``NMIDistance`` — contingency-table
based, ``networkit/community.pyx:983-1141``), ``ClusteringGenerator.cpp``
(singleton / one / continuous synthetic partitions).

All are one-or-two-shuffle DataFrame aggregations:

- modularity needs (a) intra-cluster edge weight (edges joined to labels on
  both endpoints — two hash joins, broadcast when the label table is small)
  and (b) per-cluster volume (degree table joined to labels);
- similarity measures need the contingency table
  ``groupBy(labelA, labelB).count()`` and its marginals.

Convention: ``edges`` symmetrized undirected (both directions present);
``labels(node, label)`` total over the node set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _intra_weight(edges: DataFrame, labels: DataFrame) -> float:
    """Sum of undirected intra-cluster edge weight (each edge once)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    both = edges.join(la, "src").join(lb, "dst")
    s = both.filter(F.col("la") == F.col("lb")).agg(F.sum("weight")).first()[0] or 0.0
    return s / 2.0  # symmetrized table stores each undirected edge twice


def modularity(edges: DataFrame, labels: DataFrame) -> float:
    """Q = intra/m - sum_c (vol_c / (2m))^2. Ref: ``Modularity.cpp:23-70``
    (coverage - expected coverage; per-cluster volume via incident weight
    sums, ``:46-57``)."""
    m = (edges.agg(F.sum("weight")).first()[0] or 0.0) / 2.0
    if m == 0:
        return 0.0
    intra = _intra_weight(edges, labels)
    wdeg = edges.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("wdeg"))
    vols = (
        labels.join(wdeg, "node", "left")
        .fillna({"wdeg": 0.0})
        .groupBy("label")
        .agg(F.sum("wdeg").alias("vol"))
    )
    exp_cov = (vols.agg(F.sum(F.col("vol") * F.col("vol"))).first()[0] or 0.0) / (
        (2.0 * m) ** 2
    )
    return intra / m - exp_cov


def coverage(edges: DataFrame, labels: DataFrame) -> float:
    """Intra-cluster edge weight fraction. Ref: ``Coverage.cpp``."""
    m = (edges.agg(F.sum("weight")).first()[0] or 0.0) / 2.0
    return (_intra_weight(edges, labels) / m) if m else 0.0


def edge_cut(edges: DataFrame, labels: DataFrame) -> float:
    """Total weight of inter-cluster edges. Ref: ``EdgeCut.cpp``."""
    m = (edges.agg(F.sum("weight")).first()[0] or 0.0) / 2.0
    return m - _intra_weight(edges, labels)


# -- partition similarity (contingency-table measures) -----------------------

def _contingency(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.select("node", F.col("label").alias("la"))
        .join(b.select("node", F.col("label").alias("lb")), "node")
        .groupBy("la", "lb")
        .agg(F.count("*").alias("c"))
    )


def _pair_counts(a: DataFrame, b: DataFrame):
    """(n, s11-ish building blocks) for Rand/Jaccard from the contingency
    table: sum over cells of C(c,2), and marginal sums."""
    ct = _contingency(a, b).persist()
    n = ct.agg(F.sum("c")).first()[0]
    sum_cells = ct.agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)).first()[0] or 0.0
    sum_a = (
        ct.groupBy("la").agg(F.sum("c").alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2)).first()[0] or 0.0
    )
    sum_b = (
        ct.groupBy("lb").agg(F.sum("c").alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2)).first()[0] or 0.0
    )
    ct.unpersist()
    return n, sum_cells, sum_a, sum_b


def rand_index(a: DataFrame, b: DataFrame) -> float:
    """Fraction of node pairs on which the partitions agree.
    Ref: ``RandMeasure`` (``community.pyx:983``) — returned as similarity."""
    n, s, sa, sb = _pair_counts(a, b)
    total = n * (n - 1) / 2
    if total == 0:
        return 1.0
    agree = total - (sa + sb - 2 * s)
    return agree / total


def adjusted_rand_index(a: DataFrame, b: DataFrame) -> float:
    """Ref: ``AdjustedRandMeasure`` (``community.pyx:1141``)."""
    n, s, sa, sb = _pair_counts(a, b)
    total = n * (n - 1) / 2
    if total == 0:
        return 1.0
    expected = sa * sb / total
    max_index = (sa + sb) / 2
    if max_index == expected:
        return 1.0
    return (s - expected) / (max_index - expected)


def jaccard_partition_similarity(a: DataFrame, b: DataFrame) -> float:
    """Pairs co-clustered in both / pairs co-clustered in either.
    Ref: ``JaccardMeasure`` (``community.pyx:1065``)."""
    _, s, sa, sb = _pair_counts(a, b)
    denom = sa + sb - s
    return (s / denom) if denom else 1.0


def node_structural_rand(a: DataFrame, b: DataFrame) -> float:
    """Node-structural Rand *dissimilarity* over all node pairs
    (``NodeStructuralRandMeasure.cpp:13-60``): with contingency cells s,
    marginals sa/sb and total pairs T, agreement A = T + 2s - (sa+sb) and
    the measure is 1 - A/T — exactly ``1 - rand_index``."""
    return 1.0 - rand_index(a, b)


def sampled_node_structural_rand(
    a: DataFrame, b: DataFrame, n: int, samples: int, seed: int = 42
) -> float:
    """Sampled twin (``SampledNodeStructuralRandMeasure.cpp:17-48``):
    dis = 1 - (n11 + n00)/kept over sampled node pairs.

    The reference redraws until ``maxSamples`` valid pairs; we draw a fixed
    portable sequence (pair s = (md5-draw(s) % n, md5-draw'(s) % n)) and keep
    the u != v ones, so any engine replays the identical sample — same
    estimator, deterministic across partitionings. Assumes dense ids 0..n-1.
    """
    from networkit_spark.operators.sampling import _draw

    spark = a.sparkSession
    pairs = spark.range(samples).select(
        (_draw("snsr_u", seed, F.col("id")) % n).alias("u"),
        (_draw("snsr_v", seed, F.col("id")) % n).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    la = a.select(F.col("node").alias("u"), F.col("label").alias("au"))
    lb = a.select(F.col("node").alias("v"), F.col("label").alias("av"))
    lc = b.select(F.col("node").alias("u"), F.col("label").alias("bu"))
    ld = b.select(F.col("node").alias("v"), F.col("label").alias("bv"))
    j = pairs.join(la, "u").join(lb, "v").join(lc, "u").join(ld, "v")
    agree = (
        ((F.col("au") == F.col("av")) & (F.col("bu") == F.col("bv")))
        | ((F.col("au") != F.col("av")) & (F.col("bu") != F.col("bv")))
    ).cast("double")
    row = j.agg(F.count("*").alias("k"), F.sum(agree).alias("s")).first()
    return 1.0 - (row["s"] or 0.0) / row["k"] if row["k"] else 0.0


def sampled_graph_structural_rand(
    und_edges: DataFrame, a: DataFrame, b: DataFrame, n: int,
    samples: int, seed: int = 42,
) -> float:
    """Sampled graph-structural Rand
    (``SampledGraphStructuralRandMeasure.cpp:17-50``): sample a node u, then
    a uniform neighbor v, score agreement of the two partitions on the edge.

    Portable determinization: u_s = md5-draw(s) % n (samples landing on
    isolated nodes are dropped instead of redrawn), v = the neighbor at
    index md5-draw'(s) % deg(u) in (u's dst-ascending adjacency order) —
    replayable in SQL via a row_number window.
    """
    from networkit_spark.operators.sampling import _draw

    spark = und_edges.sparkSession
    from pyspark.sql import Window

    adj = und_edges.select("src", "dst").withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
    )
    deg = und_edges.groupBy(F.col("src").alias("u")).agg(F.count("*").alias("d"))
    draws = spark.range(samples).select(
        F.col("id").alias("s"),
        (_draw("sgsr_u", seed, F.col("id")) % n).alias("u"),
        _draw("sgsr_i", seed, F.col("id")).alias("ri"),
    )
    picked = (
        draws.join(deg, "u")
        .select("s", "u", (F.col("ri") % F.col("d")).alias("idx"))
        .join(adj.withColumnRenamed("src", "u"), ["u", "idx"])
        .select("u", F.col("dst").alias("v"))
    )
    la = a.select(F.col("node").alias("u"), F.col("label").alias("au"))
    lb = a.select(F.col("node").alias("v"), F.col("label").alias("av"))
    lc = b.select(F.col("node").alias("u"), F.col("label").alias("bu"))
    ld = b.select(F.col("node").alias("v"), F.col("label").alias("bv"))
    j = picked.join(la, "u").join(lb, "v").join(lc, "u").join(ld, "v")
    agree = (
        ((F.col("au") == F.col("av")) & (F.col("bu") == F.col("bv")))
        | ((F.col("au") != F.col("av")) & (F.col("bu") != F.col("bv")))
    ).cast("double")
    row = j.agg(F.count("*").alias("k"), F.sum(agree).alias("s")).first()
    return 1.0 - (row["s"] or 0.0) / row["k"] if row["k"] else 0.0


def conductance_2partition(und_edges: DataFrame, labels: DataFrame) -> float:
    """Conductance of a 2-partition (``Conductance.cpp:12-47``):
    cut / min(vol(C0), vol(C1)), volumes = summed weighted degrees. One
    labeled-edge pass over the symmetrized table (each undirected edge
    contributes to both sides' volume via its two directed rows, and each
    cut edge contributes its weight once per side — matching EdgeCut's
    single count after the /2)."""
    lab = _labeled_edges(und_edges, labels)
    per = lab.groupBy("ls").agg(
        F.sum("weight").alias("vol"),
        F.sum(F.when(F.col("ls") != F.col("ld"), F.col("weight")).otherwise(0.0)).alias("cut"),
    ).collect()
    if len(per) != 2:
        raise ValueError("conductance needs exactly 2 non-empty clusters")
    cut = per[0]["cut"]  # symmetric: each side counts the same cut edges
    denom = min(p["vol"] for p in per)
    return (cut / denom) if denom > 0 else 0.0


def dynamic_nmi(old_labels: DataFrame, new_labels: DataFrame) -> float:
    """``DynamicNMIDistance.cpp:26-126``: NMI dissimilarity between an old
    and a new clustering of a changed graph — restricted to nodes present
    in BOTH labelings (isInBoth), log base 2, arithmetic-mean normalization
    NMID = 1 - 2·MI/(H_old + H_new) (0 when both entropies vanish), clamped
    to [0, 1]."""
    ct = _contingency(old_labels, new_labels).collect()
    n = sum(r["c"] for r in ct)
    if n == 0:
        return 0.0
    pa, pb = {}, {}
    for r in ct:
        pa[r["la"]] = pa.get(r["la"], 0) + r["c"]
        pb[r["lb"]] = pb.get(r["lb"], 0) + r["c"]
    mi = sum(
        (r["c"] / n) * math.log2(r["c"] * n / (pa[r["la"]] * pb[r["lb"]]))
        for r in ct
    )
    h_old = -sum((c / n) * math.log2(c / n) for c in pa.values())
    h_new = -sum((c / n) * math.log2(c / n) for c in pb.values())
    h_sum = h_old + h_new
    if abs(h_sum) < 1e-12:
        return 0.0
    nmid = 1.0 - (2.0 * mi) / h_sum
    return min(1.0, max(0.0, nmid))


def nmi(a: DataFrame, b: DataFrame) -> float:
    """Normalized mutual information (max-normalized).
    Ref: ``NMIDistance`` (``community.pyx:1102``) returns 1 - NMI."""
    ct = _contingency(a, b).collect()
    n = sum(r["c"] for r in ct)
    pa, pb = {}, {}
    for r in ct:
        pa[r["la"]] = pa.get(r["la"], 0) + r["c"]
        pb[r["lb"]] = pb.get(r["lb"], 0) + r["c"]
    mi = 0.0
    for r in ct:
        pij = r["c"] / n
        mi += pij * math.log(pij * n * n / (pa[r["la"]] * pb[r["lb"]]))
    ha = -sum((c / n) * math.log(c / n) for c in pa.values())
    hb = -sum((c / n) * math.log(c / n) for c in pb.values())
    hmax = max(ha, hb)
    return (mi / hmax) if hmax > 0 else 1.0


# -- synthetic partitions (ClusteringGenerator parity) -----------------------

def singleton_partition(nodes: DataFrame) -> DataFrame:
    """Every node its own cluster. Ref: ``ClusteringGenerator`` makeSingleton."""
    return nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))


def one_partition(nodes: DataFrame) -> DataFrame:
    """All nodes in one cluster."""
    return nodes.select(F.col("id").alias("node"), F.lit(0).cast("long").alias("label"))


def continuous_balanced_partition(nodes: DataFrame, k: int) -> DataFrame:
    """k contiguous blocks by node id. Ref: makeContinuousBalancedClustering."""
    n = nodes.count()
    size = max(1, (n + k - 1) // k)
    return nodes.select(
        F.col("id").alias("node"), (F.col("id") / size).cast("long").alias("label")
    )


def hub_dominance(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, hub_dominance): per community, max internal degree divided by
    (community size - 1) (``HubDominance``, ``community.pyx:555``).
    Singleton communities score 0."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ld"))
    intra_deg = (
        und_edges.join(la, "src").join(lb, "dst")
        .filter(F.col("ls") == F.col("ld"))
        .groupBy(F.col("src").alias("node"), F.col("ls").alias("label"))
        .agg(F.count("*").alias("ideg"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    top = intra_deg.groupBy("label").agg(F.max("ideg").alias("mx"))
    return (
        sizes.join(top, "label", "left")
        .select(
            "label",
            F.when(
                F.col("sz") > 1,
                F.coalesce(F.col("mx"), F.lit(0)) / (F.col("sz") - 1)
            ).otherwise(0.0).alias("hub_dominance"),
        )
    )


def _labeled_edges(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Directed rows of the symmetrized table with both endpoint labels
    attached (two hash joins on the node key — the one pass every local
    evaluation metric below shares)."""
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("ld"))
    return und_edges.join(la, "src").join(lb, "dst")


def local_partition_evaluation(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community local evaluation: (label, size, intra_density,
    iso_conductance, iso_expansion).

    Reference semantics (one row per non-empty community):

    - ``IntrapartitionDensity.cpp:38-46`` — intra-cluster edge count over
      possible pairs s*(s-1)/2; defined as 1.0 when the community is a
      singleton (no possible pair).
    - ``IsolatedInterpartitionConductance.cpp:16-50`` — cut weight incident
      to the community over min(volume, totalVolume - volume); 0 when the
      denominator is 0.
    - ``IsolatedInterpartitionExpansion.cpp:14-38`` — same cut weight over
      min(size, n - size). The reference divides unguarded (NaN for the
      one-community partition); we return 0.0 for that degenerate case.

    One labeled-edge pass + one groupBy(label) aggregation + a size join:
    with the symmetrized table each undirected edge contributes its weight
    to both endpoint communities' volume (and, when cut, to both cut sums)
    exactly once via its two directed rows grouped by src label.
    """
    lab = _labeled_edges(und_edges, labels)
    per_label = lab.groupBy(F.col("ls").alias("label")).agg(
        F.sum("weight").alias("vol"),
        F.sum(F.when(F.col("ls") != F.col("ld"), F.col("weight")).otherwise(0.0)).alias("cut"),
        (F.sum(F.when(F.col("ls") == F.col("ld"), F.lit(1)).otherwise(0)) / 2).alias("intra_cnt"),
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    total_volume = und_edges.agg(F.sum("weight")).first()[0] or 0.0
    n = labels.count()
    j = sizes.join(per_label, "label", "left").select(
        "label",
        "size",
        F.coalesce(F.col("vol"), F.lit(0.0)).alias("vol"),
        F.coalesce(F.col("cut"), F.lit(0.0)).alias("cut"),
        F.coalesce(F.col("intra_cnt"), F.lit(0.0)).alias("intra_cnt"),
    )
    possible = (F.col("size") * (F.col("size") - 1) / 2.0)
    cond_den = F.least(F.col("vol"), F.lit(float(total_volume)) - F.col("vol"))
    exp_den = F.least(F.col("size"), F.lit(n) - F.col("size"))
    return j.select(
        "label",
        "size",
        F.when(possible > 0, F.col("intra_cnt") / possible).otherwise(1.0).alias("intra_density"),
        F.when(cond_den > 0, F.col("cut") / cond_den).otherwise(0.0).alias("iso_conductance"),
        F.when(exp_den > 0, F.col("cut") / exp_den).otherwise(0.0).alias("iso_expansion"),
    )


def stable_partition_nodes(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, size, stable_frac): fraction of a community's nodes that are
    'stable' — their own label's neighbor weight is strictly positive and
    no foreign label reaches it (``StablePartitionNodes.cpp:20-52``:
    unstable iff ownWeight == 0 or any other label's weight >= ownWeight;
    isolated nodes are stable).

    Plan: neighbor-label strength table (one shuffle), per-node verdict via
    conditional max (no window sort), then a size-normalized groupBy.
    """
    lab = _labeled_edges(und_edges, labels)
    strength = lab.groupBy(F.col("src").alias("node"), F.col("ls").alias("own"),
                           F.col("ld").alias("nl")).agg(F.sum("weight").alias("w"))
    verdict = strength.groupBy("node", "own").agg(
        F.max(F.when(F.col("nl") == F.col("own"), F.col("w")).otherwise(0.0)).alias("own_w"),
        F.max(F.when(F.col("nl") != F.col("own"), F.col("w")).otherwise(0.0)).alias("max_foreign"),
    ).select(
        "node",
        F.col("own").alias("label"),
        ((F.col("own_w") > 0) & (F.col("own_w") > F.col("max_foreign"))).alias("stable"),
    )
    # isolated nodes never appear in the edge table: stable by definition
    per_node = labels.join(verdict.select("node", "stable"), "node", "left").select(
        "label", F.coalesce(F.col("stable"), F.lit(True)).alias("stable")
    )
    return per_node.groupBy("label").agg(
        F.count("*").alias("size"),
        (F.sum(F.col("stable").cast("double")) / F.count("*")).alias("stable_frac"),
    )


def partition_fragmentation(labels: DataFrame, cc_labels: DataFrame) -> DataFrame:
    """(label, size, fragmentation): 1 - (largest connected piece of the
    community) / (community size) (``PartitionFragmentation.cpp:30-60``:
    min over the community's nodes of 1 - intersectionSize/communitySize
    == 1 - max piece / size; 0 means the community is connected).

    ``cc_labels`` is any connected-components labeling of the same node set
    (``operators/components.py``); the intersection partition is the
    composite (label, cc) key — one groupBy, no per-community work.
    """
    both = labels.join(cc_labels.withColumnRenamed("label", "cc"), "node")
    pieces = both.groupBy("label", "cc").agg(F.count("*").alias("piece"))
    per_label = pieces.groupBy("label").agg(
        F.sum("piece").alias("size"), F.max("piece").alias("max_piece")
    )
    return per_label.select(
        "label", "size", (1.0 - F.col("max_piece") / F.col("size")).alias("fragmentation")
    )


def partition_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """(node, label): coarsest refinement of both partitions — nodes share a
    label iff they share one in BOTH inputs (``PartitionIntersection.cpp``;
    the reference uses ``s * upperBound + t`` then compacts; we label each
    (la, lb) class by its min node id — same partition, deterministic ids)."""
    both = a.withColumnRenamed("label", "la").join(
        b.withColumnRenamed("label", "lb"), "node"
    )
    mins = both.groupBy("la", "lb").agg(F.min("node").alias("label"))
    return both.join(mins, ["la", "lb"]).select("node", "label")


def graph_structural_rand(und_edges: DataFrame, a: DataFrame, b: DataFrame) -> float:
    """Graph-structural Rand dissimilarity
    (``GraphStructuralRandMeasure.cpp:12-37``): 1 - (e11 + e00)/m over the
    graph's edges, where e11 counts edges both partitions keep internal and
    e00 edges both cut. One labeled-edge pass."""
    e = und_edges.filter(F.col("src") < F.col("dst"))
    la = a.select(F.col("node").alias("src"), F.col("label").alias("a_s"))
    lb = a.select(F.col("node").alias("dst"), F.col("label").alias("a_d"))
    lc = b.select(F.col("node").alias("src"), F.col("label").alias("b_s"))
    ld = b.select(F.col("node").alias("dst"), F.col("label").alias("b_d"))
    lab = e.join(la, "src").join(lb, "dst").join(lc, "src").join(ld, "dst")
    agree = (
        ((F.col("a_s") == F.col("a_d")) & (F.col("b_s") == F.col("b_d")))
        | ((F.col("a_s") != F.col("a_d")) & (F.col("b_s") != F.col("b_d")))
    ).cast("double")
    row = lab.agg(F.count("*").alias("m"), F.sum(agree).alias("e")).first()
    if row["m"] == 0:
        raise ValueError("graph-structural rand measure undefined without edges")
    return 1.0 - row["e"] / row["m"]


def local_cover_evaluation(und_edges: DataFrame, cover: DataFrame) -> DataFrame:
    """Per-cluster local evaluation for a COVER (multi-membership
    ``(node, label)`` rows) — the cover twin of
    :func:`local_partition_evaluation` (``LocalCoverEvaluation.cpp`` routes
    the same IntrapartitionDensity / IsolatedInterpartitionConductance /
    Expansion metrics through Cover memberships).

    Per cluster C: intra edges have BOTH endpoints in C; vol(C) = summed
    weighted degree of members; cut(C) = weight from a member to a
    non-member *of C* (an endpoint in another shared cluster still counts
    as cut unless it is also in C — membership, not label equality, decides).

    Plan: explode memberships, join edges to the src membership, left-join
    the (dst, label) membership pairs to classify intra vs cut — two hash
    joins + one groupBy(label), no per-cluster work.
    """
    mem_src = cover.select(F.col("node").alias("src"), "label")
    mem_dst = cover.select(
        F.col("node").alias("dst"), F.col("label").alias("label"), F.lit(1).alias("in_c")
    )
    lab = und_edges.join(mem_src, "src").join(mem_dst, ["dst", "label"], "left")
    per_label = lab.groupBy("label").agg(
        F.sum("weight").alias("vol"),
        F.sum(F.when(F.col("in_c").isNull(), F.col("weight")).otherwise(0.0)).alias("cut"),
        (F.sum(F.when(F.col("in_c").isNotNull(), F.lit(1)).otherwise(0)) / 2).alias("intra_cnt"),
    )
    sizes = cover.groupBy("label").agg(F.count("*").alias("size"))
    total_volume = und_edges.agg(F.sum("weight")).first()[0] or 0.0
    n = cover.select("node").distinct().count()
    j = sizes.join(per_label, "label", "left").select(
        "label",
        "size",
        F.coalesce(F.col("vol"), F.lit(0.0)).alias("vol"),
        F.coalesce(F.col("cut"), F.lit(0.0)).alias("cut"),
        F.coalesce(F.col("intra_cnt"), F.lit(0.0)).alias("intra_cnt"),
    )
    possible = (F.col("size") * (F.col("size") - 1) / 2.0)
    cond_den = F.least(F.col("vol"), F.lit(float(total_volume)) - F.col("vol"))
    exp_den = F.least(F.col("size"), F.lit(n) - F.col("size"))
    return j.select(
        "label",
        "size",
        F.when(possible > 0, F.col("intra_cnt") / possible).otherwise(1.0).alias("intra_density"),
        F.when(cond_den > 0, F.col("cut") / cond_den).otherwise(0.0).alias("iso_conductance"),
        F.when(exp_den > 0, F.col("cut") / exp_den).otherwise(0.0).alias("iso_expansion"),
    )


def cover_f1_similarity(cover: DataFrame, reference: DataFrame) -> DataFrame:
    """(label, size, f1): per cover-cluster best F1 against any reference
    cluster (``CoverF1Similarity.cpp:60-90``: overlap ol ->
    precision = ol/|ref|, recall = ol/|cluster|, F1 = harmonic mean, best
    over reference clusters; clusters with no overlap score 0).
    Inputs are (node, label) memberships — multi-membership rows allowed."""
    csize = cover.groupBy("label").agg(F.count("*").alias("csz"))
    rsize = reference.groupBy(F.col("label").alias("ref")).agg(F.count("*").alias("rsz"))
    overlap = (
        cover.join(reference.withColumnRenamed("label", "ref"), "node")
        .groupBy("label", "ref")
        .agg(F.count("*").alias("ol"))
    )
    f1 = (
        overlap.join(csize, "label")
        .join(rsize, "ref")
        .select(
            "label",
            (
                2.0
                * (F.col("ol") / F.col("rsz"))
                * (F.col("ol") / F.col("csz"))
                / (F.col("ol") / F.col("rsz") + F.col("ol") / F.col("csz"))
            ).alias("f1"),
        )
        .groupBy("label")
        .agg(F.max("f1").alias("best_f1"))
    )
    return (
        csize.join(f1, "label", "left")
        .select(
            "label",
            F.col("csz").alias("size"),
            F.coalesce(F.col("best_f1"), F.lit(0.0)).alias("f1"),
        )
    )


def overlapping_nmi_distance(
    cover_x: DataFrame,
    cover_y: DataFrame,
    n: int,
    normalization: str = "max",
) -> float:
    """Overlapping-NMI dissimilarity between two covers (McDaid/LFK style;
    ``OverlappingNMIDistance.cpp:205-266``). Inputs are membership tables
    (node, label); a node may appear under several labels. ``n`` = number
    of graph nodes (the Bernoulli universe size).

    Per cluster pair (i, j) with sizes sx, sy and intersection d the
    adjusted conditional entropy (``:61-78``) uses the 2x2 contingency
    (a = n + d - sx - sy, b = sy - d, c = sx - d, d); the min-over-j is
    taken only where h(a)+h(d) >= h(b)+h(c), else it falls back to H(X_i).
    MI = 0.5 * (H(X) - H(X|Y) + H(Y) - H(Y|X)); nmi normalized by
    ``normalization`` in {min, geometric_mean, arithmetic_mean, max,
    joint_entropy} (reference default MAX); distance = 1 - nmi.

    Distributed shape: cluster sizes are two groupBys, intersections one
    node join + groupBy — all cluster-count-sized; only scalars reach the
    driver.
    """
    import math

    def h_col(w):
        return F.when(w > 0, -w.cast("double") * F.log2(w.cast("double") / n)).otherwise(0.0)

    def ent_col(size):
        return h_col(size) + h_col(F.lit(n) - size)

    sx = cover_x.groupBy(F.col("label").alias("i")).agg(F.count("*").alias("sx"))
    sy = cover_y.groupBy(F.col("label").alias("j")).agg(F.count("*").alias("sy"))
    empty_x = sx.isEmpty()
    empty_y = sy.isEmpty()
    if empty_x != empty_y:
        return 1.0
    if empty_x and empty_y:
        return 0.0
    inter = (
        cover_x.withColumnRenamed("label", "i")
        .join(cover_y.withColumnRenamed("label", "j"), "node")
        .groupBy("i", "j")
        .agg(F.count("*").alias("d"))
        .join(sx, "i")
        .join(sy, "j")
    )
    a = F.lit(n) + F.col("d") - F.col("sx") - F.col("sy")
    b = F.col("sy") - F.col("d")
    c = F.col("sx") - F.col("d")
    d = F.col("d")
    star = (h_col(a) + h_col(b) + h_col(c) + h_col(d)).alias("hxy")
    cand = inter.select(
        "i",
        "j",
        "sx",
        "sy",
        star,
        (h_col(a) + h_col(d) >= h_col(b) + h_col(c)).alias("adm"),
    )

    def cond_entropy(cand_df, sizes, key, other_key, size_col, other_size_col):
        """sum_i min(H(X_i), min_admissible_j H*(X_i|Y_j))."""
        per = (
            cand_df.filter(F.col("adm"))
            .select(
                key,
                (F.col("hxy") - ent_col(F.col(other_size_col))).alias("hstar"),
            )
            .groupBy(key)
            .agg(F.min("hstar").alias("hstar"))
        )
        joined = sizes.join(per, key, "left").select(
            F.least(
                ent_col(F.col(size_col)),
                F.coalesce(F.col("hstar"), F.lit(float("inf"))),
            ).alias("hc")
        )
        return joined.agg(F.sum("hc")).first()[0] or 0.0

    hx_given_y = cond_entropy(cand, sx, "i", "j", "sx", "sy")
    hy_given_x = cond_entropy(
        cand.select(F.col("j").alias("i2"), F.col("i").alias("j2"), "sx", "sy", "hxy", "adm")
        .withColumnRenamed("i2", "i")
        .withColumnRenamed("j2", "j"),
        sy.withColumnRenamed("j", "i"),
        "i",
        "j",
        "sy",
        "sx",
    )
    hx = sx.select(ent_col(F.col("sx")).alias("e")).agg(F.sum("e")).first()[0] or 0.0
    hy = sy.select(ent_col(F.col("sy")).alias("e")).agg(F.sum("e")).first()[0] or 0.0
    mi = 0.5 * (hx - hx_given_y + hy - hy_given_x)

    hx, hy = max(hx, 0.0), max(hy, 0.0)
    if hx == 0.0 and hy == 0.0:
        return 0.0  # nmi = 1 -> distance 0 (identical all-node covers)
    if (hx == 0.0 or hy == 0.0) and normalization in ("min", "geometric_mean"):
        return 1.0  # nmi = 0
    if normalization == "min":
        nmi = mi / min(hx, hy)
    elif normalization == "geometric_mean":
        nmi = mi / math.sqrt(hx * hy)
    elif normalization == "arithmetic_mean":
        nmi = 2 * mi / (hx + hy)
    elif normalization == "max":
        nmi = mi / max(hx, hy)
    elif normalization == "joint_entropy":
        nmi = mi / (hx + hy - mi)
    else:
        raise ValueError(f"unknown normalization {normalization!r}")
    if math.isnan(nmi):
        nmi = 0.0
    return 1.0 - min(1.0, max(0.0, nmi))


# ---------------------------------------------------------------------------
# GraphClusteringTools (community/GraphClusteringTools.cpp) — the partition
# utility battery: communication graph, imbalance, per-(node,cluster)
# weighted degree, and the predicate checks. All single-pass DataFrame
# plans (one shuffle each), no driver-side state.
# ---------------------------------------------------------------------------


def communication_graph(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Inter-community quotient graph (``GraphClusteringTools.cpp:27-52``):
    compact the partition (dense ids in ascending label order — the
    reference's ``Partition::compact`` map is an ordered std::map, same
    order), then accumulate the weight of every inter-cluster edge onto its
    (cluster, cluster) pair. Intra-cluster edges are dropped (the reference
    only calls ``increaseWeight`` when ``zeta[u] != zeta[v]``).

    Returns (ca, cb, weight) with ca < cb — each undirected coarse edge
    once. Shape: two label joins + one groupBy; dense ids come from the
    distributed range-sort rank (no window over the full table).
    """
    from networkit_spark.plans.ids import dense_ids

    mapping = dense_ids(labels.select("label"), "label", id_col="cid")
    e = und_edges.filter(F.col("src") < F.col("dst")).select("src", "dst", "weight")
    lab = labels.select("node", "label")
    joined = (
        e.join(lab.withColumnRenamed("node", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("node", "dst").withColumnRenamed("label", "ld"), "dst")
        .filter(F.col("ls") != F.col("ld"))
        .join(mapping.withColumnRenamed("label", "ls").withColumnRenamed("cid", "ca"), "ls")
        .join(mapping.withColumnRenamed("label", "ld").withColumnRenamed("cid", "cb"), "ld")
    )
    return (
        joined.select(
            F.least("ca", "cb").alias("ca"),
            F.greatest("ca", "cb").alias("cb"),
            "weight",
        )
        .groupBy("ca", "cb")
        .agg(F.sum("weight").alias("weight"))
    )


def get_imbalance(labels: DataFrame, n_nodes: int | None = None) -> float:
    """``GraphClusteringTools::getImbalance``: max cluster size divided by
    ceil(n / #clusters). ``n_nodes`` defaults to the labeled node count
    (the zeta-only overload); pass the graph's node count for the
    graph-aware overload."""
    import math

    row = labels.groupBy("label").count().agg(
        F.max("count").alias("mx"), F.count("*").alias("k"), F.sum("count").alias("n")
    ).first()
    n = n_nodes if n_nodes is not None else row["n"]
    avg = math.ceil(n / row["k"])
    return float(row["mx"]) / avg


def weighted_degree_with_cluster(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-(node, neighbor-cluster) incident weight table — the batched
    form of ``GraphClusteringTools::weightedDegreeWithCluster(G, zeta, u,
    cid)`` (every (u, cid) answered in one aggregation instead of one call
    per pair). Input ``edges`` directed-as-stored or symmetrized; neighbors
    of u are rows with src = u."""
    lab = labels.select(F.col("node").alias("dst"), F.col("label").alias("cid"))
    return (
        edges.join(lab, "dst")
        .groupBy(F.col("src").alias("node"), "cid")
        .agg(F.sum("weight").alias("wdeg"))
    )


def is_proper_clustering(nodes: DataFrame, labels: DataFrame) -> bool:
    """Every node has exactly one label (``GraphClusteringTools.cpp:74``)."""
    lab = labels.select("node", "label")
    n = nodes.count()
    return lab.count() == n and lab.select("node").distinct().count() == n


def is_singleton_clustering(labels: DataFrame) -> bool:
    """Every cluster has exactly one member."""
    return labels.groupBy("label").count().filter(F.col("count") > 1).limit(1).count() == 0


def is_one_clustering(labels: DataFrame) -> bool:
    """Exactly one cluster."""
    return labels.select("label").distinct().count() == 1


def equal_clusterings(a: DataFrame, b: DataFrame) -> bool:
    """Same grouping up to label renaming (``GraphClusteringTools.cpp:102``
    checks mutual refinement): the (label_a, label_b) co-occurrence table
    must be a bijection — each a-label maps to one b-label and vice versa."""
    pairs = (
        a.select("node", F.col("label").alias("la"))
        .join(b.select("node", F.col("label").alias("lb")), "node")
        .select("la", "lb")
        .distinct()
    )
    return (
        pairs.groupBy("la").count().filter(F.col("count") > 1).limit(1).count() == 0
        and pairs.groupBy("lb").count().filter(F.col("count") > 1).limit(1).count() == 0
    )


def cover_hub_dominance(und_edges: DataFrame, cover: DataFrame) -> DataFrame:
    """CoverHubDominance (``community/CoverHubDominance.cpp:8-77``): for
    every cover subset c, the max over members u of |{v in N(u) : v in c}|
    divided by (|c| - 1); 1.0 for singletons. ``cover`` = (node, label)
    with multi-membership rows. Returns (label, size, hub_dominance).

    Shape: one edge->cover join per endpoint restricted to shared labels
    (the membership join IS the "neighbor in c" predicate), then two hash
    aggs — no per-subset loop."""
    c = cover.select("node", "label").distinct()
    ideg = (
        und_edges.select("src", "dst")
        .join(c.withColumnRenamed("node", "src"), "src")
        .join(c.withColumnRenamed("node", "dst").withColumnRenamed("label", "lb"), "dst")
        .filter(F.col("label") == F.col("lb"))
        .groupBy(F.col("src").alias("node"), "label")
        .agg(F.count("*").alias("idg"))
    )
    sizes = c.groupBy("label").agg(F.count("*").alias("size"))
    top = ideg.groupBy("label").agg(F.max("idg").alias("mx"))
    return sizes.join(top, "label", "left").select(
        "label",
        "size",
        F.when(F.col("size") > 1, F.coalesce(F.col("mx"), F.lit(0)) / (F.col("size") - 1))
        .otherwise(F.lit(1.0))
        .alias("hub_dominance"),
    )


# ---------------------------------------------------------------------------
# community.pyx convenience layer (detectCommunities :1640,
# inspectCommunities :1673, kCoreCommunityDetection :1831). communityGraph
# == communication_graph above; compareCommunities == the similarity
# battery; read/writeCommunities == sources/partitions.py.
# ---------------------------------------------------------------------------

def inspect_communities(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """The ``inspectCommunities`` property table (community.pyx:1673-1707)
    as a (property, value) DataFrame: community count, min/max/avg size,
    imbalance, edge cut, edge-cut portion, modularity. ``und_edges``
    symmetrized; values unrounded doubles."""
    import math

    sizes = labels.groupBy("label").count().agg(
        F.count("*").alias("k"),
        F.min("count").alias("mn"),
        F.max("count").alias("mx"),
        F.sum("count").alias("n"),
    ).first()
    k, n = int(sizes["k"]), int(sizes["n"])
    e_cut = edge_cut(und_edges, labels)
    n_edges = und_edges.count() / 2.0
    mod = modularity(und_edges, labels)
    rows = [
        ("# communities", float(k)),
        ("min community size", float(sizes["mn"])),
        ("max community size", float(sizes["mx"])),
        ("avg. community size", n / k),
        ("imbalance", float(sizes["mx"]) / math.ceil(n / k)),
        ("edge cut", e_cut),
        ("edge cut (portion)", e_cut / n_edges if n_edges else 0.0),
        ("modularity", mod),
    ]
    return und_edges.sparkSession.createDataFrame(
        rows, "property string, value double"
    )


def detect_communities(und_edges: DataFrame, algo=None, inspect: bool = True):
    """``detectCommunities`` (community.pyx:1640): run the detector
    (default PLM, like the reference) and return (labels, properties) —
    properties is the :func:`inspect_communities` table, or None when
    ``inspect`` is False."""
    if algo is None:
        from networkit_spark.operators.plm import PLM

        algo = PLM()
    labels = algo.run(und_edges).labels_df
    props = inspect_communities(und_edges, labels) if inspect else None
    return labels, props


def k_core_community_detection(und_edges: DataFrame, k: int, algo=None):
    """``kCoreCommunityDetection`` (community.pyx:1831): community
    detection restricted to the k-core. Returns (node, label) for k-core
    nodes only (the reference's partition is over the core subgraph)."""
    from networkit_spark.operators.kcore import k_core

    core_edges = k_core(und_edges, k).withColumn("weight", F.lit(1.0))
    labels, _ = detect_communities(core_edges, algo=algo, inspect=False)
    return labels
