"""Round-4 gate queries: NodeDistance family (Jaccard / Adamic-Adar edge
distances, sampled r-ball Volume, bounded + bidirectional Dijkstra,
ReverseBFS), the remaining community comparison measures
(NodeStructuralRand + sampled twins, Conductance, DynamicNMIDistance,
LocalCoverEvaluation), LocalPartitionCoverage, and HashingOverlapper.

Every query pairs the Spark operator with an independently-derived DuckDB
oracle over the shared deterministic documents graph (``testgraph.py``);
seeded estimators use the portable md5 draw so both engines replay the
identical sample.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.entry_queries_graph import CC_ITERS, _cc_oracle_sql
from networkit_spark.graph import nodes_range
from networkit_spark.operators.components import components_fixed
from networkit_spark.operators.sampling import draw_sql
from networkit_spark.operators.overlap import djb2_sql
from networkit_spark.testgraph import (
    EDGES_CTE,
    UEDGES_CTE,
    doc_edges,
    doc_edges_undirected,
)


def _n_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def _mod_labels(spark, sf_dir, k):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("node"),
        (F.col("doc_id") % k).cast("long").alias("label"),
    )


# ---------------------------------------------------------------------------
# LocalPartitionCoverage (centrality) — mod-10 partition
# ---------------------------------------------------------------------------

@register(
    "local_partition_coverage",
    f"""
WITH {UEDGES_CTE}
SELECT d.doc_id AS node,
       round(coalesce(
           sum(CASE WHEN e.src % 10 = e.dst % 10 THEN e.weight END)
           / sum(e.weight), 0.0), 7) AS score
FROM documents d LEFT JOIN uedges e ON e.src = d.doc_id
GROUP BY d.doc_id
""",
)
def q_local_partition_coverage(spark, sf_dir):
    """Same-cluster incident weight fraction per node
    (``LocalPartitionCoverage.cpp:12-30``) under the mod-10 partition."""
    from networkit_spark.operators.centrality import local_partition_coverage

    e = doc_edges_undirected(spark, sf_dir)
    labels = _mod_labels(spark, sf_dir, 10)
    return local_partition_coverage(e, labels).select(
        "node", F.round("score", 7).alias("score")
    )


# ---------------------------------------------------------------------------
# Node-structural Rand dissimilarity (exact + sampled twins)
# ---------------------------------------------------------------------------

@register(
    "node_structural_rand",
    """
WITH ct AS (SELECT doc_id % 6 AS la, doc_id % 10 AS lb, count(*) AS c
            FROM documents GROUP BY 1, 2),
tot AS (SELECT count(*) AS n FROM documents),
s AS (SELECT sum(c * (c - 1) / 2.0) AS v FROM ct),
sa AS (SELECT sum(m * (m - 1) / 2.0) AS v FROM (SELECT sum(c) AS m FROM ct GROUP BY la)),
sb AS (SELECT sum(m * (m - 1) / 2.0) AS v FROM (SELECT sum(c) AS m FROM ct GROUP BY lb))
SELECT round(1.0 - (n * (n - 1) / 2.0 + 2 * s.v - (sa.v + sb.v))
             / (n * (n - 1) / 2.0), 7) AS dissimilarity
FROM tot, s, sa, sb
""",
)
def q_node_structural_rand(spark, sf_dir):
    """Rand dissimilarity over ALL node pairs between the mod-6 and mod-10
    partitions (``NodeStructuralRandMeasure.cpp:13-60``)."""
    from networkit_spark.operators.community import node_structural_rand

    a = _mod_labels(spark, sf_dir, 6)
    b = _mod_labels(spark, sf_dir, 10)
    d = node_structural_rand(a, b)
    return spark.createDataFrame([(round(d, 7),)], "dissimilarity double")


@register(
    "sampled_node_structural_rand",
    f"""
WITH tot AS (SELECT count(*) AS n FROM documents),
draws AS (
    SELECT {draw_sql('snsr_u', 42, 'i')} % n AS u,
           {draw_sql('snsr_v', 42, 'i')} % n AS v
    FROM range(64) t(i), tot
),
kept AS (SELECT u, v FROM draws WHERE u <> v)
SELECT round(1.0 - avg(CASE WHEN (u % 6 = v % 6 AND u % 10 = v % 10)
                              OR (u % 6 <> v % 6 AND u % 10 <> v % 10)
                       THEN 1.0 ELSE 0.0 END), 7) AS dissimilarity
FROM kept
""",
)
def q_sampled_node_structural_rand(spark, sf_dir):
    """Sampled twin (``SampledNodeStructuralRandMeasure.cpp:17-48``) with
    the portable md5 pair draws, 64 samples."""
    from networkit_spark.operators.community import sampled_node_structural_rand

    a = _mod_labels(spark, sf_dir, 6)
    b = _mod_labels(spark, sf_dir, 10)
    n = _n_docs(spark, sf_dir)
    d = sampled_node_structural_rand(a, b, n, samples=64, seed=42)
    return spark.createDataFrame([(round(d, 7),)], "dissimilarity double")


@register(
    "sampled_graph_structural_rand",
    f"""
WITH {UEDGES_CTE},
adj AS (SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
        FROM uedges),
deg AS (SELECT src AS u, count(*) AS d FROM uedges GROUP BY src),
draws AS (
    SELECT {draw_sql('sgsr_u', 42, 'i')} % n AS u,
           {draw_sql('sgsr_i', 42, 'i')} AS ri
    FROM range(64) t(i), nn
),
picked AS (
    SELECT w.u, a.dst AS v
    FROM draws w
    JOIN deg dg ON dg.u = w.u
    JOIN adj a ON a.src = w.u AND a.idx = w.ri % dg.d
)
SELECT round(1.0 - avg(CASE WHEN (u % 6 = v % 6 AND u % 10 = v % 10)
                              OR (u % 6 <> v % 6 AND u % 10 <> v % 10)
                       THEN 1.0 ELSE 0.0 END), 7) AS dissimilarity
FROM picked
""",
)
def q_sampled_graph_structural_rand(spark, sf_dir):
    """Sampled graph-structural Rand
    (``SampledGraphStructuralRandMeasure.cpp:17-50``): portable node draw,
    neighbor picked by rank in dst-ascending adjacency order."""
    from networkit_spark.operators.community import sampled_graph_structural_rand

    e = doc_edges_undirected(spark, sf_dir)
    a = _mod_labels(spark, sf_dir, 6)
    b = _mod_labels(spark, sf_dir, 10)
    n = _n_docs(spark, sf_dir)
    d = sampled_graph_structural_rand(e, a, b, n, samples=64, seed=42)
    return spark.createDataFrame([(round(d, 7),)], "dissimilarity double")


# ---------------------------------------------------------------------------
# Conductance (2-partition) + DynamicNMIDistance
# ---------------------------------------------------------------------------

@register(
    "conductance_halves",
    f"""
WITH {UEDGES_CTE},
lab AS (SELECT e.weight,
               CASE WHEN e.src * 2 < n THEN 0 ELSE 1 END AS ls,
               CASE WHEN e.dst * 2 < n THEN 0 ELSE 1 END AS ld
        FROM uedges e, nn),
per AS (SELECT ls, sum(weight) AS vol,
               sum(CASE WHEN ls <> ld THEN weight ELSE 0 END) AS cut
        FROM lab GROUP BY ls)
SELECT round((SELECT max(cut) FROM per) / (SELECT min(vol) FROM per), 7)
       AS conductance
""",
)
def q_conductance_halves(spark, sf_dir):
    """Conductance of the lower/upper-half 2-partition
    (``Conductance.cpp:12-47``: cut / min volume)."""
    from networkit_spark.operators.community import conductance_2partition

    e = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    labels = _mod_labels(spark, sf_dir, 1).select(
        "node", F.when(F.col("node") * 2 < n, 0).otherwise(1).cast("long").alias("label")
    )
    c = conductance_2partition(e, labels)
    return spark.createDataFrame([(round(c, 7),)], "conductance double")


@register(
    "dynamic_nmi",
    """
WITH tot0 AS (SELECT count(*) AS n FROM documents),
ct AS (SELECT doc_id % 6 AS la, doc_id % 10 AS lb, count(*) AS c
       FROM documents, tot0 WHERE doc_id * 5 < 4 * n GROUP BY 1, 2),
tot AS (SELECT sum(c) AS s FROM ct),
ma AS (SELECT la, sum(c) AS ca FROM ct GROUP BY la),
mb AS (SELECT lb, sum(c) AS cb FROM ct GROUP BY lb),
mi AS (SELECT sum((c * 1.0 / s) * log2(c * 1.0 * s / (ca * cb))) AS v
       FROM ct JOIN ma USING (la) JOIN mb USING (lb), tot),
ha AS (SELECT -sum((ca * 1.0 / s) * log2(ca * 1.0 / s)) AS v FROM ma, tot),
hb AS (SELECT -sum((cb * 1.0 / s) * log2(cb * 1.0 / s)) AS v FROM mb, tot)
SELECT round(CASE WHEN ha.v + hb.v = 0 THEN 0.0
             ELSE least(1.0, greatest(0.0, 1.0 - 2 * mi.v / (ha.v + hb.v)))
             END, 7) AS nmid
FROM mi, ha, hb
""",
)
def q_dynamic_nmi(spark, sf_dir):
    """``DynamicNMIDistance.cpp:26-126``: NMID between an 'old' clustering
    (mod 6, defined on the first 80% of nodes — the pre-growth graph) and
    the 'new' one (mod 10, all nodes), restricted to common nodes."""
    from networkit_spark.operators.community import dynamic_nmi

    n = _n_docs(spark, sf_dir)
    old = _mod_labels(spark, sf_dir, 6).filter(F.col("node") * 5 < 4 * n)
    new = _mod_labels(spark, sf_dir, 10)
    d = dynamic_nmi(old, new)
    return spark.createDataFrame([(round(d, 7),)], "nmid double")


# ---------------------------------------------------------------------------
# HashingOverlapper
# ---------------------------------------------------------------------------

_HKEY = "(xor(la, 65535) * 65536 + xor(lb, 65535))"

@register(
    "hashing_overlap",
    f"""
WITH pairs AS (SELECT doc_id AS node, doc_id % 6 AS la, doc_id % 10 AS lb
               FROM documents),
keyed AS (SELECT node, {_HKEY} AS k FROM pairs),
hashed AS (SELECT node, {djb2_sql('k', width=4)} AS h FROM keyed),
ranks AS (SELECT h, CAST(dense_rank() OVER (ORDER BY h) - 1 AS BIGINT) AS label
          FROM (SELECT DISTINCT h FROM hashed))
SELECT x.node, r.label FROM hashed x JOIN ranks r USING (h)
""",
)
def q_hashing_overlap(spark, sf_dir):
    """Core partition combining mod-6 and mod-10 via the reference's exact
    djb2-of-key recipe incl. the zero-byte early stop and ascending-hash
    compaction (``HashingOverlapper.cpp:14-77``)."""
    from networkit_spark.operators.overlap import hashing_overlapper

    a = _mod_labels(spark, sf_dir, 6)
    b = _mod_labels(spark, sf_dir, 10)
    return hashing_overlapper([a, b]).select("node", "label")


# ---------------------------------------------------------------------------
# Jaccard / Adamic-Adar edge distances (distance module attributizers)
# ---------------------------------------------------------------------------

_CANON_TRI = f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
canon AS (SELECT src AS u, dst AS v FROM uedges WHERE src < dst),
cn AS (SELECT c.u, c.v, e1.dst AS w
       FROM canon c
       JOIN uedges e1 ON e1.src = c.u
       JOIN uedges e2 ON e2.src = c.v AND e2.dst = e1.dst)
"""

@register(
    "jaccard_distance_edges",
    _CANON_TRI
    + """,
tri AS (SELECT u, v, count(*) AS t FROM cn GROUP BY u, v)
SELECT c.u AS src, c.v AS dst,
       round(coalesce(t.t, 0) * 1.0 / (du.d + dv.d - coalesce(t.t, 0)), 7) AS score,
       round(1.0 - coalesce(t.t, 0) * 1.0 / (du.d + dv.d - coalesce(t.t, 0)), 7) AS distance
FROM canon c
LEFT JOIN tri t ON t.u = c.u AND t.v = c.v
JOIN deg du ON du.node = c.u
JOIN deg dv ON dv.node = c.v
""",
)
def q_jaccard_distance_edges(spark, sf_dir):
    """Per-edge Jaccard distance 1 - t/(du+dv-t)
    (``JaccardDistance.cpp:40-42``)."""
    from networkit_spark.operators.node_distance import jaccard_distance

    e = doc_edges_undirected(spark, sf_dir)
    return jaccard_distance(e).select(
        "src", "dst",
        F.round("score", 7).alias("score"),
        F.round("distance", 7).alias("distance"),
    )


@register(
    "adamic_adar_edges",
    _CANON_TRI
    + """,
aa AS (SELECT cn.u, cn.v, sum(1.0 / ln(dw.d)) AS aa
       FROM cn JOIN deg dw ON dw.node = cn.w GROUP BY cn.u, cn.v)
SELECT c.u AS src, c.v AS dst,
       round(coalesce(a.aa, 0.0), 7) AS aa,
       round(1.0 / a.aa, 7) AS distance
FROM canon c LEFT JOIN aa a ON a.u = c.u AND a.v = c.v
""",
)
def q_adamic_adar_edges(spark, sf_dir):
    """Per-edge Adamic-Adar sum over common neighbors and its reciprocal
    distance (``AdamicAdarDistance.cpp:29-54``); triangle-free edges have
    aa = 0 and NULL distance (the reference's inf)."""
    from networkit_spark.operators.node_distance import adamic_adar_distance

    e = doc_edges_undirected(spark, sf_dir)
    return adamic_adar_distance(e).select(
        "src", "dst",
        F.round("aa", 7).alias("aa"),
        F.round("distance", 7).alias("distance"),
    )


# ---------------------------------------------------------------------------
# Volume (sampled r-ball), bounded SSSP, bidirectional Dijkstra, ReverseBFS
# ---------------------------------------------------------------------------

@register(
    "volume_r2",
    f"""
WITH {UEDGES_CTE},
draws AS (SELECT i AS sample_id, {draw_sql('vol', 42, 'i')} % n AS source
          FROM range(8) t(i), nn),
b0 AS (SELECT sample_id, source AS node FROM draws),
l1 AS (SELECT DISTINCT b.sample_id, e.dst AS node
       FROM b0 b JOIN uedges e ON e.src = b.node),
a1 AS (SELECT sample_id, node FROM b0 UNION SELECT sample_id, node FROM l1),
l2 AS (SELECT DISTINCT b.sample_id, e.dst AS node
       FROM a1 b JOIN uedges e ON e.src = b.node),
a2 AS (SELECT sample_id, node FROM a1 UNION SELECT sample_id, node FROM l2)
SELECT d.sample_id, d.source, CAST(count(*) AS BIGINT) AS ball
FROM draws d JOIN a2 USING (sample_id)
GROUP BY d.sample_id, d.source
""",
)
def q_volume_r2(spark, sf_dir):
    """Sampled 2-ball sizes, 8 portable seeded sources
    (``Volume.cpp:14-45``; unit weights make the ball a 2-hop BFS)."""
    from networkit_spark.operators.node_distance import ball_sizes

    e = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    return ball_sizes(e, r=2.0, samples=8, seed=42, n=n).select(
        "sample_id", "source", "ball"
    )


def _weighted_sssp_oracle(source: int, limit: float | None, rounds: int,
                          final: str) -> str:
    """Unrolled min-plus rounds over the (1 + (src+dst)%3)-weighted directed
    graph; optional per-prefix distance horizon."""
    guard = f"WHERE p.dist + e.w <= {limit}" if limit is not None else ""
    parts = [
        f"WITH {EDGES_CTE}",
        ", wedges AS (SELECT src, dst, 1.0 + (src + dst) % 3 AS w FROM edges)",
        f", s0 AS (SELECT CAST({source} AS BIGINT) AS node, 0.0 AS dist)",
    ]
    for k in range(1, rounds + 1):
        prev = f"s{k - 1}"
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT node, min(dist) AS dist FROM ("
            f" SELECT node, dist FROM {prev}"
            f" UNION ALL"
            f" SELECT e.dst AS node, p.dist + e.w AS dist"
            f" FROM wedges e JOIN {prev} p ON e.src = p.node {guard}"
            f") GROUP BY node)"
        )
    parts.append(final.format(last=f"s{rounds}"))
    return "\n".join(parts)


@register(
    "bounded_sssp_limit4",
    _weighted_sssp_oracle(
        0, 4.0, 4, "SELECT node, round(dist, 7) AS dist FROM {last}"
    ),
)
def q_bounded_sssp_limit4(spark, sf_dir):
    """IncompleteDijkstra analog: weighted distances from node 0 pruned to
    the 4.0 horizon (weights 1 + (src+dst)%3 on the directed graph). Four
    min-plus rounds are exact: every admissible path has <= 4 unit-or-more
    edges and every prefix also fits the horizon."""
    from networkit_spark.operators.node_distance import bounded_sssp

    e = doc_edges(spark, sf_dir).withColumn(
        "weight", 1.0 + (F.col("src") + F.col("dst")) % 3
    )
    return bounded_sssp(e, 0, 4.0).select("node", F.round("dist", 7).alias("dist"))


@register(
    "bidir_dijkstra_0_97",
    _weighted_sssp_oracle(
        0, None, 12,
        "SELECT round(dist, 7) AS dist FROM {last} WHERE node = 97",
    ),
)
def q_bidir_dijkstra_0_97(spark, sf_dir):
    """BidirectionalDijkstra s-t distance (0 -> 97) on the weighted directed
    graph; the oracle runs 12 full min-plus rounds from the source (enough
    to converge on this graph's hop diameter)."""
    from networkit_spark.operators.node_distance import bidirectional_dijkstra

    e = doc_edges(spark, sf_dir).withColumn(
        "weight", 1.0 + (F.col("src") + F.col("dst")) % 3
    )
    d = bidirectional_dijkstra(e, 0, 97)
    return spark.createDataFrame([(round(d, 7),)], "dist double")


def _reverse_bfs_oracle_sql(source: int, rounds: int) -> str:
    big = 1 << 40
    parts = [
        f"WITH {EDGES_CTE}",
        f", d0 AS (SELECT doc_id AS node, CASE WHEN doc_id = {source} THEN 0 ELSE {big} END AS dist FROM documents)",
    ]
    for k in range(1, rounds + 1):
        prev = f"d{k - 1}"
        parts.append(
            f", d{k} AS MATERIALIZED ("
            f" SELECT n.node, least(n.dist, coalesce(t.nd, n.dist)) AS dist"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT e.src AS node, min(p.dist + 1) AS nd"
            f"   FROM edges e JOIN {prev} p ON e.dst = p.node GROUP BY e.src"
            f" ) t ON n.node = t.node)"
        )
    parts.append(
        f"SELECT node, CAST(CASE WHEN dist >= {big} THEN -1 ELSE dist END AS BIGINT) AS dist"
        f" FROM d{rounds}"
    )
    return "\n".join(parts)


@register("reverse_bfs_from0", _reverse_bfs_oracle_sql(0, 10))
def q_reverse_bfs_from0(spark, sf_dir):
    """ReverseBFS.cpp: hop distances from node 0 following IN-edges
    (-1 = unreached within 10 rounds, mirroring bfs_from0_fixed10)."""
    from networkit_spark.operators.node_distance import reverse_bfs

    e = doc_edges(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    d = reverse_bfs(e, 0)
    return (
        nodes_range(spark, n).select(F.col("id").alias("node"))
        .join(d, "node", "left")
        .select("node", F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist"))
    )


# ---------------------------------------------------------------------------
# LocalCoverEvaluation — two-membership synthetic cover
# ---------------------------------------------------------------------------

@register(
    "local_cover_eval",
    f"""
WITH {UEDGES_CTE},
cov AS (SELECT doc_id AS node, doc_id % 6 AS label FROM documents
        UNION ALL
        SELECT doc_id, 6 + doc_id % 10 FROM documents),
lab AS (SELECT e.weight, m.label, md.node AS in_c
        FROM uedges e
        JOIN cov m ON m.node = e.src
        LEFT JOIN cov md ON md.node = e.dst AND md.label = m.label),
per AS (SELECT label, sum(weight) AS vol,
               sum(CASE WHEN in_c IS NULL THEN weight ELSE 0 END) AS cut,
               sum(CASE WHEN in_c IS NOT NULL THEN 1 ELSE 0 END) / 2.0 AS intra
        FROM lab GROUP BY label),
sz AS (SELECT label, count(*) AS size FROM cov GROUP BY label),
tv AS (SELECT sum(weight) AS tv FROM uedges),
n2 AS (SELECT count(DISTINCT node) AS n2 FROM cov)
SELECT s.label, CAST(s.size AS BIGINT) AS size,
       round(CASE WHEN s.size > 1
             THEN coalesce(p.intra, 0) / (s.size * (s.size - 1) / 2.0)
             ELSE 1.0 END, 7) AS intra_density,
       round(CASE WHEN least(coalesce(p.vol, 0), tv - coalesce(p.vol, 0)) > 0
             THEN coalesce(p.cut, 0) / least(coalesce(p.vol, 0), tv - coalesce(p.vol, 0))
             ELSE 0.0 END, 7) AS iso_conductance,
       round(CASE WHEN least(s.size, n2 - s.size) > 0
             THEN coalesce(p.cut, 0) / least(s.size, n2 - s.size)
             ELSE 0.0 END, 7) AS iso_expansion
FROM sz s LEFT JOIN per p USING (label), tv, n2
""",
)
def q_local_cover_eval(spark, sf_dir):
    """Cover-based local evaluation (``LocalCoverEvaluation.cpp`` routing of
    the IntrapartitionDensity / IsolatedInterpartition* metrics): every node
    belongs to clusters (node%6) and 6+(node%10)."""
    from networkit_spark.operators.community import local_cover_evaluation

    e = doc_edges_undirected(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("node")
    )
    cover = docs.select("node", (F.col("node") % 6).alias("label")).union(
        docs.select("node", (F.col("node") % 10 + 6).alias("label"))
    )
    r = local_cover_evaluation(e, cover)
    return r.select(
        "label",
        F.col("size").cast("long").alias("size"),
        F.round("intra_density", 7).alias("intra_density"),
        F.round("iso_conductance", 7).alias("iso_conductance"),
        F.round("iso_expansion", 7).alias("iso_expansion"),
    )


# ---------------------------------------------------------------------------
# TopHarmonicCloseness (exact top-10)
# ---------------------------------------------------------------------------

def _allpairs_harmonic_oracle(rounds: int, k: int) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", a0 AS (SELECT doc_id AS source, doc_id AS node, 0 AS dist FROM documents)",
    ]
    for i in range(1, rounds + 1):
        prev = f"a{i - 1}"
        parts.append(
            f", a{i} AS MATERIALIZED (SELECT source, node, min(dist) AS dist FROM ("
            f" SELECT source, node, dist FROM {prev}"
            f" UNION ALL"
            f" SELECT p.source, e.dst AS node, p.dist + 1 AS dist"
            f" FROM uedges e JOIN {prev} p ON e.src = p.node"
            f") GROUP BY source, node)"
        )
    parts.append(
        f"SELECT node, round(sum(1.0 / dist), 7) AS score"
        f" FROM a{rounds} WHERE dist > 0 GROUP BY node"
        f" ORDER BY sum(1.0 / dist) DESC, node ASC LIMIT {k}"
    )
    return "\n".join(parts)


@register("top_harmonic_k10", _allpairs_harmonic_oracle(10, 10))
def q_top_harmonic_k10(spark, sf_dir):
    """Exact top-10 harmonic closeness (``TopHarmonicCloseness.cpp``; the
    all-source multi-wave is the distributed strategy, ranking is one
    top-k)."""
    from networkit_spark.operators.closeness import top_harmonic_closeness

    e = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    return top_harmonic_closeness(e, nodes_range(spark, n), k=10).select(
        "node", F.round("score", 7).alias("score")
    )


# ---------------------------------------------------------------------------
# EstimateBetweenness (portable sampled pivots)
# ---------------------------------------------------------------------------

def _estimate_bc_srcs_sql() -> str:
    return (
        "SELECT DISTINCT " + draw_sql("estbc", 42, "i") + " % n AS s "
        "FROM range(8) t(i), nn"
    )


def _estimate_bc_oracle() -> str:
    from networkit_spark.entry_queries_graph import _betweenness_oracle_sql

    return _betweenness_oracle_sql(8, srcs_sql=_estimate_bc_srcs_sql())


@register("estimate_betweenness_s8", _estimate_bc_oracle())
def q_estimate_betweenness_s8(spark, sf_dir):
    """``EstimateBetweenness.cpp`` front door: Brandes from 8 portable
    seeded pivots, scores scaled n/#pivots; oracle = the unrolled
    level-synchronous Brandes with the same md5 pivot draw."""
    from networkit_spark.operators.betweenness import estimate_betweenness

    e = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    out = estimate_betweenness(e, n_samples=8, nodes=nodes_range(spark, n), seed=42)
    return out.select("node", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# ClusteringProjector — two-level coarsen + projectBackToFinest
# ---------------------------------------------------------------------------

@register(
    "project_back_two_levels",
    """
SELECT doc_id AS node, CAST((doc_id % 10) % 4 AS BIGINT) AS label
FROM documents
""",
)
def q_project_back_two_levels(spark, sf_dir):
    """Coarsen by mod-10, re-coarsen the coarse graph by mod-4, then
    ``projectBackToFinest`` through the two-map hierarchy
    (``ClusteringProjector.cpp:29-57``). The closed-form oracle follows
    because every label is used at both levels, so each compaction is the
    identity."""
    from networkit_spark.operators.coarsening import (
        coarsen_by_partition,
        project_back_to_finest,
    )

    e = doc_edges_undirected(spark, sf_dir)
    canon = e.filter(F.col("src") < F.col("dst"))
    n = _n_docs(spark, sf_dir)
    l1 = nodes_range(spark, n).select(
        F.col("id").alias("node"), (F.col("id") % 10).alias("label")
    )
    c1, m1 = coarsen_by_partition(canon, l1)
    l2 = m1.select("coarse").distinct().select(
        F.col("coarse").alias("node"), (F.col("coarse") % 4).alias("label")
    )
    c2, m2 = coarsen_by_partition(c1, l2)
    coarsest = m2.select("coarse").distinct().select(
        F.col("coarse").alias("node"), F.col("coarse").alias("label")
    )
    out = project_back_to_finest(
        [m1.withColumnRenamed("coarse", "coarse"), m2], coarsest
    )
    return out.select("node", F.col("label").cast("long").alias("label"))


# ---------------------------------------------------------------------------
# OverlappingNMIDistance (MAX normalization, reference default)
# ---------------------------------------------------------------------------

def _h(expr: str) -> str:
    return (
        f"(CASE WHEN ({expr}) > 0 THEN -({expr}) * log2(({expr}) * 1.0 / n) "
        f"ELSE 0.0 END)"
    )


def _ent(expr: str) -> str:
    return f"({_h(expr)} + {_h(f'n - ({expr})')})"


def _onmi_oracle() -> str:
    ha, hb = _h("n + d - sxs - sys"), _h("sys - d")
    hc, hd = _h("sxs - d"), _h("d")
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
covx AS (SELECT doc_id AS node, doc_id % 6 AS i FROM documents
         UNION ALL SELECT doc_id, 6 + doc_id % 4 FROM documents),
covy AS (SELECT doc_id AS node, doc_id % 10 AS j FROM documents),
sx AS (SELECT i, count(*) AS s FROM covx GROUP BY i),
sy AS (SELECT j, count(*) AS s FROM covy GROUP BY j),
inter AS (SELECT x.i, y.j, count(*) AS d
          FROM covx x JOIN covy y USING (node) GROUP BY x.i, y.j),
cand AS (SELECT t.i, t.j, sx.s AS sxs, sy.s AS sys, t.d,
                {ha} + {hb} + {hc} + {hd} AS hxy,
                ({ha} + {hd} >= {hb} + {hc}) AS adm
         FROM inter t JOIN sx ON sx.i = t.i JOIN sy ON sy.j = t.j, nn),
perx AS (SELECT i, min(hxy - {_ent('sys')}) AS hstar
         FROM cand, nn WHERE adm GROUP BY i),
pery AS (SELECT j, min(hxy - {_ent('sxs')}) AS hstar
         FROM cand, nn WHERE adm GROUP BY j),
condx AS (SELECT sum(least({_ent('sx.s')}, coalesce(px.hstar, {_ent('sx.s')}))) AS v
          FROM sx LEFT JOIN perx px USING (i), nn),
condy AS (SELECT sum(least({_ent('sy.s')}, coalesce(py.hstar, {_ent('sy.s')}))) AS v
          FROM sy LEFT JOIN pery py USING (j), nn),
hx AS (SELECT sum({_ent('s')}) AS v FROM sx, nn),
hy AS (SELECT sum({_ent('s')}) AS v FROM sy, nn)
SELECT round(1.0 - least(1.0, greatest(0.0,
         0.5 * (hx.v - condx.v + hy.v - condy.v) / greatest(hx.v, hy.v))), 7)
       AS distance
FROM hx, hy, condx, condy
"""


@register("overlapping_nmi", _onmi_oracle())
def q_overlapping_nmi(spark, sf_dir):
    """Overlapping-NMI distance (MAX normalization) between cover X =
    {node%6} u {6+node%4} (every node in two clusters) and partition Y =
    node%10 (``OverlappingNMIDistance.cpp:205-266``)."""
    from networkit_spark.operators.community import overlapping_nmi_distance

    n = _n_docs(spark, sf_dir)
    docs = nodes_range(spark, n).select(F.col("id").alias("node"))
    covx = docs.select("node", (F.col("node") % 6).alias("label")).union(
        docs.select("node", (F.col("node") % 4 + 6).alias("label"))
    )
    covy = docs.select("node", (F.col("node") % 10).alias("label"))
    d = overlapping_nmi_distance(covx, covy, n)
    return spark.createDataFrame([(round(d, 7),)], "distance double")


# ---------------------------------------------------------------------------
# ParallelAgglomerativeClusterer — one oracle-checked level
# ---------------------------------------------------------------------------

def _agglomerative_level1_oracle(rounds: int = 16) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        """, canon AS (SELECT src, dst, weight FROM uedges WHERE src < dst),
om AS (SELECT sum(weight) AS o FROM canon),
wdeg AS (SELECT src AS node, sum(weight) AS wd FROM uedges GROUP BY src),
scored AS (SELECT c.src, c.dst,
       c.weight / o - (du.wd / (2 * o)) * (dv.wd / (2 * o)) AS score
   FROM canon c JOIN wdeg du ON du.node = c.src
                JOIN wdeg dv ON dv.node = c.dst, om),
live0 AS (SELECT src, dst, score FROM scored
          UNION ALL SELECT dst, src, score FROM scored)""",
    ]
    for r in range(rounds):
        parts.append(
            f""", pref{r} AS MATERIALIZED (
  SELECT src AS node, dst AS partner FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC) AS rk
    FROM live{r}) WHERE rk = 1),
pairs{r} AS MATERIALIZED (
  SELECT p.node AS u, p.partner AS v
  FROM pref{r} p JOIN pref{r} q ON p.node = q.partner AND p.partner = q.node
  WHERE p.node < p.partner),
hit{r} AS (SELECT u AS node FROM pairs{r} UNION SELECT v FROM pairs{r}),
live{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst, e.score FROM live{r} e
  WHERE e.src NOT IN (SELECT node FROM hit{r})
    AND e.dst NOT IN (SELECT node FROM hit{r}))"""
        )
    union = " UNION ALL ".join(f"SELECT u, v FROM pairs{r}" for r in range(rounds))
    parts.append(
        f""", matched AS ({union}),
rep AS (SELECT u AS node, u AS r FROM matched UNION ALL SELECT v, u FROM matched),
lab AS (SELECT g.node, coalesce(rep.r, g.node) AS r
        FROM (SELECT DISTINCT src AS node FROM uedges) g
        LEFT JOIN rep ON rep.node = g.node),
ranks AS (SELECT r, CAST(dense_rank() OVER (ORDER BY r) - 1 AS BIGINT) AS coarse
          FROM (SELECT DISTINCT r FROM lab))
SELECT l.node, k.coarse FROM lab l JOIN ranks k USING (r)"""
    )
    return "\n".join(parts)


@register("agglomerative_level1", _agglomerative_level1_oracle(16))
def q_agglomerative_level1(spark, sf_dir):
    """One ParallelAgglomerativeClusterer level: modularity edge scores ->
    16-round local-max handshake matching -> MatchingCoarsening node map
    (``ParallelAgglomerativeClusterer.cpp:40-70``; matcher substitution
    documented in operators/agglomerative.py). Output = (node, coarse)."""
    from networkit_spark.operators.agglomerative import agglomerate_one_level

    e = doc_edges_undirected(spark, sf_dir)
    canon = e.filter(F.col("src") < F.col("dst"))
    _, mapping = agglomerate_one_level(canon, matching_rounds=16)
    return mapping.select("node", F.col("coarse").cast("long").alias("coarse"))


# ---------------------------------------------------------------------------
# Round-4c: TwoPhaseL, RandomSpanningForest, DynAPSP, AffectedNodes
# ---------------------------------------------------------------------------

@register("two_phase_l_hubs")  # greedy add + removal sweep -> rows-only
def q_two_phase_l_hubs(spark, sf_dir):
    """TwoPhaseL SCD (``cpp/scd/TwoPhaseL.cpp``) batched over hub seeds
    0..3; rows-only (phase-1 greedy argmax is not SQL-expressible) — the
    sequential-replica parity lives in tests/test_round4c.py."""
    from networkit_spark.operators.scd import two_phase_l

    e = doc_edges_undirected(spark, sf_dir)
    return two_phase_l(e, [0, 1, 2, 3]).orderBy("seed", "node")


@register(
    "random_spanning_forest_sizes",
    _cc_oracle_sql(
        CC_ITERS,
        "SELECT label, CAST(count(*) - 1 AS BIGINT) AS tree_edges"
        " FROM {last} GROUP BY label HAVING count(*) > 1",
    ),
)
def q_random_spanning_forest_sizes(spark, sf_dir):
    """Aldous-Broder uniform random spanning forest
    (``components/RandomSpanningForest.cpp``): the sampled forest must put
    exactly size-1 tree edges in every component — the oracle derives
    component sizes independently by hash-min CC, so the cross-engine hash
    pins the spanning invariant (edge-level determinism is pytest-pinned)."""
    from networkit_spark.operators.spanning import random_spanning_forest

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    forest = random_spanning_forest(e, seed=42)
    labels = components_fixed(e, nodes_range(spark, n), iterations=CC_ITERS)
    return (
        forest.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy("label")
        .agg(F.count("*").alias("tree_edges"))
    )


@register(
    "dyn_apsp_insert_mid",
    f"""
WITH RECURSIVE {UEDGES_CTE},
ev AS (SELECT CAST(0 AS BIGINT) AS u, CAST(n // 2 + 1 AS BIGINT) AS v FROM nn),
post AS (
  SELECT src, dst FROM uedges
  UNION SELECT u, v FROM ev
  UNION SELECT v, u FROM ev
),
walk(s, node, dist) AS (
  SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents
  UNION
  SELECT w.s, e.dst, w.dist + 1
  FROM walk w JOIN post e ON w.node = e.src WHERE w.dist < 12
)
SELECT s, node AS t, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY s, node
""",
)
def q_dyn_apsp_insert_mid(spark, sf_dir):
    """DynAPSP (``distance/DynAPSP.cpp:45-106``): init the (s, t, dist)
    pair table on the graph WITHOUT edge (0, n/2+1), apply that insertion
    event-granularly (closed-form affected-pair update), and return the
    distances; the oracle recomputes APSP from scratch on the post-insert
    graph by recursive BFS."""
    from networkit_spark.streaming.dyn_centrality import (
        dyn_apsp_distances,
        dyn_apsp_init,
        dyn_apsp_insert,
    )

    n = _n_docs(spark, sf_dir)
    u, v = 0, n // 2 + 1
    pre = doc_edges_undirected(spark, sf_dir).filter(
        ~(
            ((F.col("src") == u) & (F.col("dst") == v))
            | ((F.col("src") == v) & (F.col("dst") == u))
        )
    )
    P = dyn_apsp_init(pre.select("src", "dst"), nodes_range(spark, n))
    P = dyn_apsp_insert(P, u, v, directed=False)
    return dyn_apsp_distances(P).select(
        "s", "t", F.col("dist").cast("long").alias("dist")
    )


@register(
    "affected_nodes_add_mid",
    f"""
WITH RECURSIVE {UEDGES_CTE},
ev AS (SELECT CAST(1 AS BIGINT) AS u, CAST(n // 2 AS BIGINT) AS v FROM nn),
newe AS (
  SELECT src, dst FROM uedges
  UNION SELECT u, v FROM ev
  UNION SELECT v, u FROM ev
),
olde AS (
  SELECT e.src, e.dst FROM newe e, ev
  WHERE NOT ((e.src = ev.u AND e.dst = ev.v) OR (e.src = ev.v AND e.dst = ev.u))
),
wou(node, dist) AS (
  SELECT u, CAST(0 AS BIGINT) FROM ev
  UNION
  SELECT e.dst, w.dist + 1 FROM wou w JOIN olde e ON w.node = e.src WHERE w.dist < 30
),
wov(node, dist) AS (
  SELECT v, CAST(0 AS BIGINT) FROM ev
  UNION
  SELECT e.dst, w.dist + 1 FROM wov w JOIN olde e ON w.node = e.src WHERE w.dist < 30
),
wnu(node, dist) AS (
  SELECT u, CAST(0 AS BIGINT) FROM ev
  UNION
  SELECT e.dst, w.dist + 1 FROM wnu w JOIN newe e ON w.node = e.src WHERE w.dist < 30
),
wnv(node, dist) AS (
  SELECT v, CAST(0 AS BIGINT) FROM ev
  UNION
  SELECT e.dst, w.dist + 1 FROM wnv w JOIN newe e ON w.node = e.src WHERE w.dist < 30
),
dou AS (SELECT node, min(dist) AS d FROM wou GROUP BY node),
dov AS (SELECT node, min(dist) AS d FROM wov GROUP BY node),
dnu AS (SELECT node, min(dist) AS d FROM wnu GROUP BY node),
dnv AS (SELECT node, min(dist) AS d FROM wnv GROUP BY node),
big AS (SELECT CAST('infinity' AS DOUBLE) AS inf)
SELECT d.doc_id AS node,
       least(coalesce(dou.d, (SELECT inf FROM big)),
             coalesce(dov.d, (SELECT inf FROM big))) AS dist
FROM documents d
LEFT JOIN dou ON dou.node = d.doc_id
LEFT JOIN dov ON dov.node = d.doc_id
LEFT JOIN dnu ON dnu.node = d.doc_id
LEFT JOIN dnv ON dnv.node = d.doc_id
WHERE coalesce(dnu.d, (SELECT inf FROM big)) < coalesce(dou.d, (SELECT inf FROM big))
   OR coalesce(dnv.d, (SELECT inf FROM big)) < coalesce(dov.d, (SELECT inf FROM big))
""",
)
def q_affected_nodes_add_mid(spark, sf_dir):
    """AffectedNodes for the undirected addition (1, n/2)
    (``distance/AffectedNodes.cpp:31-174``): nodes whose hop distance from
    u or v improved, reported at their PRE-event distance min(d_old_u,
    d_old_v); the oracle re-derives both BFS frontiers by recursive CTE."""
    from networkit_spark.operators.affected import affected_nodes

    n = _n_docs(spark, sf_dir)
    u, v = 1, n // 2
    base = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    ev = spark.createDataFrame([(u, v), (v, u)], "src long, dst long")
    post = base.union(ev).distinct()
    nodes_df, _imp = affected_nodes(post, "EDGE_ADDITION", u, v, directed=False)
    return nodes_df.select("node", F.col("dist").cast("double").alias("dist"))


# ---------------------------------------------------------------------------
# NeighborhoodFunctionHeuristic (distance/NeighborhoodFunctionHeuristic.cpp)
# ---------------------------------------------------------------------------

from networkit_spark.entry_queries_graph import _msbfs_oracle_sql  # noqa: E402

_NFH_FINAL = """
, deg AS (SELECT d.doc_id AS id, count(e.src) AS dg
          FROM documents d LEFT JOIN uedges e ON e.src = d.doc_id
          GROUP BY d.doc_id)
, par AS (SELECT n, m, ns, greatest(1, n // ns) AS sw FROM (
    SELECT n, m, CAST(ceil(greatest(0.15 * n, sqrt(m))) AS BIGINT) AS ns
    FROM (SELECT (SELECT n FROM nn) AS n,
                 (SELECT count(*) // 2 FROM uedges) AS m)))
, ranked AS (SELECT id, row_number() OVER (ORDER BY dg, id) - 1 AS rk FROM deg)
, sources AS (SELECT id FROM ranked, par WHERE rk % sw = 0 AND rk < ns * sw)
, dia AS (SELECT max(dist) AS dia FROM {last} WHERE dist < {big})
, hist AS (SELECT dist, count(*) AS c
           FROM {last} t JOIN sources s ON t.source = s.id
           WHERE dist >= 1 AND dist < {big} GROUP BY dist)
, series AS (SELECT unnest(generate_series(1, (SELECT dia FROM dia))) AS h)
, scaled AS (
   SELECT s.h,
          CASE WHEN s.h = 1 THEN 0
               ELSE CAST(floor(coalesce(hi.c, 0) * p.n / p.ns + 0.5) AS BIGINT)
          END AS a,
          p.n AS n, p.m AS m
   FROM series s CROSS JOIN par p LEFT JOIN hist hi ON hi.dist = s.h)
SELECT h, CAST(CASE WHEN h = (SELECT dia FROM dia) AND h > 1 THEN n * (n - 1)
               ELSE 2 * m + sum(a) OVER (ORDER BY h) END AS BIGINT) AS nf
FROM scaled
"""


@register("neighborhood_function_heuristic", _msbfs_oracle_sql(8, _NFH_FINAL))
def q_neighborhood_function_heuristic(spark, sf_dir):
    """Sampled-BFS neighborhood function, split strategy
    (``NeighborhoodFunctionHeuristic.cpp:42-129``; ties in the degree sort
    pinned by node id): the oracle re-derives the degree-ranked sample set,
    the distance histogram (from the full multi-source BFS restricted to
    the samples), and the endpoint-pinned cumulative scaling in SQL."""
    from networkit_spark.operators.anf import neighborhood_function_heuristic

    e = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    nf = neighborhood_function_heuristic(e, nodes_range(spark, n))
    return spark.createDataFrame(
        [(int(h), int(v)) for h, v in nf], "h bigint, nf bigint"
    )


# ---------------------------------------------------------------------------
# DynPrunedLandmarkLabeling (distance/DynPrunedLandmarkLabeling.cpp)
# ---------------------------------------------------------------------------

@register(
    "dyn_pll_distances_sub40",
    f"""
WITH RECURSIVE {UEDGES_CTE},
sub AS (SELECT src, dst FROM uedges WHERE src < 40 AND dst < 40
        UNION SELECT 5, 38 UNION SELECT 38, 5),
walk(u, node, dist) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id < 40
  UNION
  SELECT w.u, e.dst, w.dist + 1 FROM walk w JOIN sub e ON w.node = e.src WHERE w.dist < 30
)
SELECT u, node AS v, CAST(min(dist) AS BIGINT) AS dist
FROM walk WHERE u < node GROUP BY u, node
""",
)
def q_dyn_pll_distances(spark, sf_dir):
    """Incremental PLL: build labels on the <40-node doc subgraph WITHOUT
    edge (5, 38), insert it via the dynamic pruned-BFS repair, answer every
    pair from the repaired labels; the oracle recomputes post-insert
    distances by recursive BFS — exactness of the repaired cover is what is
    checked."""
    from networkit_spark.operators.hublabels import (
        dyn_pll_insert,
        hub_distances,
        pll_order,
        pruned_landmark_labels,
    )

    e = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 40) & (F.col("dst") < 40)
    ).select("src", "dst")
    pre = e.filter(
        ~(((F.col("src") == 5) & (F.col("dst") == 38))
          | ((F.col("src") == 38) & (F.col("dst") == 5)))
    )
    nodes = spark.range(40).select(F.col("id").alias("id"))
    labels = pruned_landmark_labels(pre, nodes, batch=8)
    order = pll_order(
        pre.union(pre.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct(),
        nodes,
    )
    ev = spark.createDataFrame([(5, 38), (38, 5)], "src long, dst long")
    post = pre.union(ev).distinct()
    labels = dyn_pll_insert(labels, order, post, 5, 38)
    pairs = (
        spark.range(40).select(F.col("id").alias("u"))
        .crossJoin(spark.range(40).select(F.col("id").alias("v")))
        .filter(F.col("u") < F.col("v"))
    )
    return hub_distances(labels, pairs)


# ---------------------------------------------------------------------------
# ApproxGroupBetweenness (centrality/ApproxGroupBetweenness.cpp)
# ---------------------------------------------------------------------------

def _agb_oracle_sql(samples: int, group_size: int, seed: int, walk_levels: int) -> str:
    big = 1 << 40
    parts = [
        f""", par AS (SELECT (SELECT n FROM nn) AS n)
, adraws AS (
    SELECT i AS l, {draw_sql('agb_s', seed, 'i')} % n AS s
    FROM range({samples}) t(i), par)
, adraws2 AS (
    SELECT l, s, (s + 1 + {draw_sql('agb_t', seed, 'l')} % (n - 1)) % n AS t
    FROM adraws, par)
, w0 AS (
    SELECT d.l, d.s, d.t AS cur, x.dist AS lev
    FROM adraws2 d JOIN dlast x ON x.source = d.s AND x.node = d.t
    WHERE x.dist >= 2 AND x.dist < {big})""",
    ]
    for k in range(1, walk_levels + 1):
        parts.append(
            f""", w{k} AS (
    SELECT l, s, cur, lev FROM (
      SELECT w.l, w.s, e.src AS cur, w.lev - 1 AS lev,
             row_number() OVER (PARTITION BY w.l
               ORDER BY {draw_sql('agb_pick', seed, 'w.l', 'w.lev', 'e.src')}, e.src) AS rk
      FROM w{k - 1} w
      JOIN uedges e ON e.dst = w.cur
      JOIN dlast dx ON dx.source = w.s AND dx.node = e.src AND dx.dist = w.lev - 1
      WHERE w.lev >= 2
    ) WHERE rk = 1)"""
        )
    hyper_union = " UNION ALL ".join(
        f"SELECT l, cur AS node FROM w{k}" for k in range(1, walk_levels + 1)
    )
    parts.append(f", h0 AS ({hyper_union})")
    for j in range(1, group_size + 1):
        parts.append(
            f""", g{j} AS (
    SELECT node FROM (
      SELECT node, count(*) AS c FROM h{j - 1} GROUP BY node
      ORDER BY c DESC, node LIMIT 1))
, h{j} AS (
    SELECT h.l, h.node FROM h{j - 1} h
    WHERE h.l NOT IN (SELECT hh.l FROM h{j - 1} hh JOIN g{j} g ON hh.node = g.node))"""
        )
    final = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS rank, node FROM g{j}"
        for j in range(1, group_size + 1)
    )
    return "".join(parts) + "\n" + final


@register(
    "approx_group_betweenness_k4",
    _msbfs_oracle_sql(8, ", dlast AS (SELECT * FROM {last})" + _agb_oracle_sql(64, 4, 7, 8)),
)
def q_approx_group_betweenness(spark, sf_dir):
    """Mahmoody-style sampled group betweenness, 64 portable-draw (s, t)
    samples, one hash-argmin shortest path each, greedy 4-node max
    coverage; the oracle replays the identical draws, backward walks, and
    greedy rounds over the all-pairs fixed-round BFS — full unrolled SQL."""
    from networkit_spark.operators.group_centrality import approx_group_betweenness

    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    n = _n_docs(spark, sf_dir)
    grp = approx_group_betweenness(
        e, nodes_range(spark, n), group_size=4, samples=64, seed=7
    )
    return spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(grp)], "rank long, node long"
    )


@register("group_closeness_local_search_k3")  # iterative swap search -> rows-only
def q_group_closeness_local_search(spark, sf_dir):
    """Exact-evaluation single-swap local search for group closeness
    (``GroupClosenessLocalSearch.cpp`` semantics); rows-only — local
    optimality and farness exactness are pytest-pinned
    (tests/test_round4c.py)."""
    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
    )

    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    n = _n_docs(spark, sf_dir)
    S, far = group_closeness_local_search(
        e, nodes_range(spark, n), [0, 1, 2], max_swaps=3, batch=256
    )
    return spark.createDataFrame(
        [(i + 1, v, float(far)) for i, v in enumerate(sorted(S))],
        "rank long, node long, farness double",
    )


@register("pivot_mds_coords")  # eigendecomposition -> rows-only
def q_pivot_mds_coords(spark, sf_dir):
    """PivotMDS 2-D layout (``viz/PivotMDS.cpp``), 16 seeded pivots;
    rows-only (numpy-replica parity pinned in tests/test_round4c.py)."""
    from networkit_spark.operators.layout import pivot_mds

    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    n = _n_docs(spark, sf_dir)
    out = pivot_mds(e, nodes_range(spark, n), dim=2, num_pivots=16, seed=42)
    return out.select("node", F.round("x0", 6).alias("x0"), F.round("x1", 6).alias("x1"))


@register(
    "dynamic_path_events50",
    """
WITH s AS (SELECT unnest(generate_series(0, 49)) AS i)
SELECT CAST(0 AS BIGINT) AS seq, 'NODE_ADDITION' AS etype,
       CAST(0 AS BIGINT) AS u, CAST(NULL AS BIGINT) AS v, CAST(NULL AS DOUBLE) AS w
UNION ALL SELECT 3*i+1, 'NODE_ADDITION', i+1, NULL, NULL FROM s
UNION ALL SELECT 3*i+2, 'EDGE_ADDITION', i, i+1, 1.0 FROM s
UNION ALL SELECT 3*i+3, 'TIME_STEP', NULL, NULL, NULL FROM s
""",
)
def q_dynamic_path_events(spark, sf_dir):
    """DynamicPathGenerator event stream (``DynamicPathGenerator.cpp``),
    50 steps — fully deterministic, so the oracle reconstructs the exact
    (seq, etype, u, v, w) rows."""
    from networkit_spark.sources.dynamic_generators import dynamic_path_events

    return dynamic_path_events(spark, 50)


# ---------------------------------------------------------------------------
# AlgebraicDistanceIndex (linkprediction/AlgebraicDistanceIndex.cpp)
# ---------------------------------------------------------------------------

def _adi_oracle_sql(systems: int, iters: int, seed: int) -> str:
    u01 = (
        "('0x'||substr(md5(concat_ws('|','ad{seed}', CAST({n} AS VARCHAR),"
        " CAST({s} AS VARCHAR))),1,13))::BIGINT / 4503599627370496.0"
    )
    parts = [
        f"WITH {UEDGES_CTE}",
        f", sysx AS (SELECT unnest(generate_series(0, {systems - 1})) AS s)",
        ", wdeg AS (SELECT src AS node, sum(weight) AS wd FROM uedges GROUP BY src)",
        ", l0 AS (SELECT d.doc_id AS node, sysx.s, "
        + u01.format(seed=seed, n="d.doc_id", s="sysx.s")
        + " AS load FROM documents d, sysx)",
    ]
    for k in range(1, iters + 1):
        prev = f"l{k - 1}"
        parts.append(
            f""", l{k} AS MATERIALIZED (
  SELECT n.node, n.s,
         CASE WHEN t.acc IS NOT NULL
              THEN 0.5 * n.load + 0.5 * t.acc / w.wd
              ELSE n.load END AS load
  FROM {prev} n
  LEFT JOIN (SELECT e.src AS node, p.s, sum(e.weight * p.load) AS acc
             FROM uedges e JOIN {prev} p ON e.dst = p.node GROUP BY e.src, p.s) t
    ON n.node = t.node AND n.s = t.s
  LEFT JOIN wdeg w ON n.node = w.node)"""
        )
    parts.append(
        f""", qp AS (SELECT i AS u, (i * 37 + 11) % n AS v
         FROM range(100) t(i), nn WHERE i <> (i * 37 + 11) % n)
SELECT q.u, q.v,
       round(sqrt(sum((a.load - b.load) * (a.load - b.load))), 7) AS score
FROM qp q
JOIN l{iters} a ON a.node = q.u
JOIN l{iters} b ON b.node = q.v AND b.s = a.s
GROUP BY q.u, q.v"""
    )
    return "\n".join(parts)


@register("algebraic_distance_pred", _adi_oracle_sql(4, 4, 42))
def q_algebraic_distance_pred(spark, sf_dir):
    """AlgebraicDistanceIndex over 100 deterministic query pairs
    (``AlgebraicDistanceIndex.cpp:23-73``, omega 0.5, 4 systems, 4
    iterations, 2-norm, raw loads): the oracle unrolls the load smoothing
    with the identical md5 initialization."""
    from networkit_spark.operators.algebraic import algebraic_distance_pairs

    e = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    qp = (
        spark.range(100)
        .select(F.col("id").alias("u"), ((F.col("id") * 37 + 11) % n).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    out = algebraic_distance_pairs(
        e, nodes_range(spark, n), qp, num_systems=4, num_iterations=4,
        omega=0.5, seed=42, norm=2,
    )
    return out.select("u", "v", F.round("score", 7).alias("score"))


@register("planarity_checks")  # LR conflict-pair machinery -> rows-only
def q_planarity_checks(spark, sf_dir):
    """LeftRightPlanarityCheck verdicts (``planarity/
    LeftRightPlanarityCheck.cpp``): the doc graph (Euler-rejected without a
    collect), its maximum spanning forest (a forest — planar), and the
    <40-node subgraph (LR-tested).  Rows-only: the conflict-pair stack is
    not SQL-expressible; the LR core is fuzz-pinned against networkx in
    tests/test_round4c.py."""
    from networkit_spark.operators.planarity import is_planar
    from networkit_spark.operators.spanning import max_spanning_forest

    full = doc_edges_undirected(spark, sf_dir)
    sub = full.filter((F.col("src") < 40) & (F.col("dst") < 40))
    forest = max_spanning_forest(full).forest_df.select("src", "dst")
    rows = [
        ("doc_graph", bool(is_planar(full))),
        ("doc_sub40", bool(is_planar(sub))),
        ("doc_msf", bool(is_planar(forest))),
    ]
    return spark.createDataFrame(rows, "graph string, planar boolean")


# ---------------------------------------------------------------------------
# KADABRA pilot phase (centrality/KadabraBetweenness.cpp) — oracle twin
# ---------------------------------------------------------------------------

_M31 = 2_147_483_647


def _lcg_sql(col: str, salt: int, seed: int) -> str:
    """SQL twin of approx_betweenness._lcg — portable uniform in
    [0, 2^31-1). (col % M) * 1103515245 stays within int64."""
    return (f"((({col}) % {_M31}) * 1103515245 + {salt * 12345 + seed})"
            f" % {_M31}")


def _kadabra_sidhits_parts(samples: int, seed: int, rounds: int = 8) -> list[str]:
    """Shared CTE prefix replaying KADABRA's sampling engine for sample ids
    [0, samples): LCG pair draws -> batched sigma BFS -> sigma-weighted
    uniform path walk, ending in ``sidhits(sid, node)`` — one row per
    interior node per sample. Used by the pilot twin (aggregate over all
    sids) and the fixed-epoch twin (split pilot/epoch sids)."""
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", dr AS (
    SELECT i AS sid, {_lcg_sql('i', 1, seed)} % n AS u,
           ({_lcg_sql('i', 1, seed)} % n + 1 + {_lcg_sql('i', 2, seed)} % (n - 1)) % n AS v
    FROM range({samples}) t(i), nn)
, srcs AS (SELECT DISTINCT u AS s FROM dr)
, k0 AS (SELECT s AS source, s AS node, 0 AS dist, CAST(1.0 AS DOUBLE) AS sigma FROM srcs)""",
    ]
    for k in range(1, rounds + 1):
        prev = f"k{k - 1}"
        parts.append(
            f""", k{k} AS MATERIALIZED (
  SELECT source, node, dist, sigma FROM {prev}
  UNION ALL
  SELECT nw.source, nw.node, {k} AS dist, nw.sigma FROM (
    SELECT p.source, e.dst AS node, sum(p.sigma) AS sigma
    FROM uedges e JOIN {prev} p ON e.src = p.node AND p.dist = {k - 1}
    GROUP BY p.source, e.dst
  ) nw LEFT JOIN {prev} old ON old.source = nw.source AND old.node = nw.node
  WHERE old.node IS NULL)"""
        )
    parts.append(
        f""", sig AS (SELECT * FROM k{rounds})
, kpreds AS (
    SELECT a.source, a.node, e.src AS pred, b.sigma AS sigma_pred
    FROM sig a JOIN uedges e ON e.dst = a.node
    JOIN sig b ON b.source = a.source AND b.node = e.src AND b.dist = a.dist - 1)
, w0 AS (
    SELECT p.sid, p.u, p.v AS t
    FROM dr p JOIN sig x ON x.source = p.u AND x.node = p.v
    WHERE p.u <> p.v)"""
    )
    for k in range(1, rounds + 1):
        prev = f"w{k - 1}"
        parts.append(
            f""", w{k} AS MATERIALIZED (
  SELECT sid, u, pred AS t FROM (
    SELECT sid, u, pred,
           row_number() OVER (PARTITION BY sid ORDER BY pred) AS rk
    FROM (
      SELECT w.sid, w.u, p.pred,
             sum(p.sigma_pred) OVER (PARTITION BY w.sid ORDER BY p.pred) AS cum,
             sum(p.sigma_pred) OVER (PARTITION BY w.sid) AS tot,
             CAST({_lcg_sql('w.sid * 31 + w.t', 3, seed)} AS DOUBLE)
               / {_M31} AS ur
      FROM {prev} w JOIN kpreds p ON p.source = w.u AND p.node = w.t
      WHERE w.t <> w.u
    ) WHERE cum > ur * tot
  ) WHERE rk = 1)"""
        )
    union = " UNION ALL ".join(
        f"SELECT sid, t AS node FROM w{k} WHERE t <> u" for k in range(1, rounds + 1)
    )
    parts.append(f", sidhits AS ({union})")
    return parts


def _kadabra_pilot_oracle_sql(samples: int, seed: int, rounds: int = 8) -> str:
    """Full SQL replay of KADABRA's sampling engine for a FIXED pilot batch
    (the tau phase of ``KadabraBetweenness.cpp:305-330`` before the
    adaptive stopping rule takes over): the identical LCG pair draws
    (``approx_betweenness.sample_pairs``), a level-synchronous forward
    Brandes BFS with path counts from the sampled sources, and the
    sigma-weighted backward walk that picks ONE uniformly-random shortest
    path per pair (``_path_sample_walk`` — cumulative-sigma threshold with
    the per-step LCG draw), unrolled level by level."""
    parts = _kadabra_sidhits_parts(samples, seed, rounds)
    parts.append(
        f"""
, hits AS (SELECT node, count(*) AS h FROM sidhits GROUP BY node)
SELECT d.doc_id AS node,
       round(coalesce(h.h, 0)::DOUBLE / {samples}, 6) AS score
FROM documents d LEFT JOIN hits h ON d.doc_id = h.node"""
    )
    return "\n".join(parts)


@register("kadabra_pilot_tau64", _kadabra_pilot_oracle_sql(64, 11))
def q_kadabra_pilot_tau64(spark, sf_dir):
    """Oracle twin for the adaptive `kadabra_betweenness` query: the exact
    sampling engine KADABRA iterates (LCG pair draws -> batched forward
    Brandes BFS -> sigma-weighted uniform shortest-path walk,
    ``KadabraBetweenness.cpp:330-380`` randomPath) run for one FIXED pilot
    batch of tau=64 samples, scores = hits/tau.  The adaptive variant only
    repeats this engine with a data-dependent stopping rule
    (``checkConvergence:447-479``), which is what keeps it rows-only; this
    twin pins the engine itself against a fully unrolled SQL replay
    (draws + sigma BFS + cumulative-threshold walk), the same pattern
    plm_fixed2 uses for PLM."""
    from networkit_spark.operators.approx_betweenness import (
        path_sample_hits,
        sample_pairs,
    )

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    nodes = nodes_range(spark, n)
    nd = nodes.select(F.col("id").alias("idx"), F.col("id").alias("id"))
    samples = sample_pairs(nd, n, 0, 64, seed=11)
    hits = path_sample_hits(e, samples, seed=11)
    return (
        nodes.select(F.col("id").alias("node"))
        .join(hits, "node", "left")
        .select(
            "node",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)).cast("double") / 64, 6
            ).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# GCE fixed-round engine twin (scd/GCE.cpp greedy objective-M expansion)
# ---------------------------------------------------------------------------


def _gce_fixed_oracle_sql(rounds: int, sub: int = 60) -> str:
    """Full SQL replay of the GCE greedy engine (``GCE.cpp:40-110``) for a
    FIXED number of add-rounds from seed 0 on the <``sub``-node undirected
    doc subgraph: per round, community stats (intw = internal weight, cut),
    shell-node gains dQ = (intw + intDeg)/(cut - intDeg + extDeg) - intw/cut
    (den <= 0 -> +inf, the reference's double-division absorb case), argmax
    with min-id tiebreak, unrolled round by round. Rounds where no shell
    node has dQ > 0 add nothing (stationary), matching the early break in
    ``operators/scd.gce``."""
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", su AS (SELECT src, dst, weight FROM uedges
             WHERE src < {sub} AND dst < {sub})
, c1 AS (SELECT CAST(0 AS BIGINT) AS node)""",
    ]
    for k in range(1, rounds + 1):
        c, nxt = f"c{k}", f"c{k + 1}"
        parts.append(
            f""", s{k} AS (
    SELECT coalesce(sum(CASE WHEN d.node IS NOT NULL THEN e.weight END) / 2, 0) AS intw,
           coalesce(sum(CASE WHEN d.node IS NULL THEN e.weight END), 0) AS cut
    FROM su e JOIN {c} m ON e.src = m.node LEFT JOIN {c} d ON e.dst = d.node)
, g{k} AS (
    SELECT e.src AS cand,
           sum(CASE WHEN d.node IS NOT NULL THEN e.weight END) AS intd,
           coalesce(sum(CASE WHEN d.node IS NULL THEN e.weight END), 0) AS extd
    FROM su e LEFT JOIN {c} m ON e.src = m.node LEFT JOIN {c} d ON e.dst = d.node
    WHERE m.node IS NULL
    GROUP BY e.src
    HAVING sum(CASE WHEN d.node IS NOT NULL THEN e.weight END) > 0)
, p{k} AS (
    SELECT cand FROM g{k}, s{k}
    WHERE cut > 0
      AND (CASE WHEN cut - intd + extd > 0
                THEN (intw + intd) / (cut - intd + extd) - intw / cut
                ELSE 1e308 END) > 0
    ORDER BY (CASE WHEN cut - intd + extd > 0
                   THEN (intw + intd) / (cut - intd + extd) - intw / cut
                   ELSE 1e308 END) DESC, cand ASC
    LIMIT 1)
, {nxt} AS (SELECT node FROM {c} UNION SELECT cand AS node FROM p{k})"""
        )
    parts.append(f"\nSELECT node FROM c{rounds + 1} ORDER BY node")
    return "\n".join(parts)


@register("gce_expand4_seed0", _gce_fixed_oracle_sql(4))
def q_gce_expand4_seed0(spark, sf_dir):
    """Oracle twin for the adaptive `gce_community_seed0` query: the exact
    greedy engine GCE iterates (community stats -> shell dQ scan -> argmax
    add with min-id ties, ``GCE.cpp:40-110``) run for a FIXED 4 add-rounds
    from seed 0, against a fully unrolled SQL replay. The adaptive variant
    only repeats this engine until no positive-dQ shell node remains, which
    is what keeps it rows-only."""
    from networkit_spark.operators.scd import gce

    e = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 60) & (F.col("dst") < 60)
    )
    com = gce(e, {0}, max_additions=4)
    return spark.createDataFrame([(int(v),) for v in sorted(com)], "node long")


# ---------------------------------------------------------------------------
# PivotMDS centered-matrix pilot twin (viz/PivotMDS.cpp:49-71)
# ---------------------------------------------------------------------------


def _pivot_centered_oracle_sql(k: int, seed: int, rounds: int = 10) -> str:
    """SQL replay of everything PivotMDS computes before the (k x k,
    driver-side) eigensolve: the seeded portable-md5 pivot draw
    (``sampling._draw``), a multi-source BFS from the k pivots unrolled
    level by level, and the double centering over the full node x pivot
    grid with unreached entries as zeros."""
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", drw AS (
    SELECT doc_id AS id,
           ('0x' || substr(md5('pmds_pivot|{seed}|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS dr
    FROM documents)
, piv AS (
    SELECT id AS s, ROW_NUMBER() OVER (ORDER BY dr, id) - 1 AS j
    FROM drw ORDER BY dr, id LIMIT {k})
, b0 AS (SELECT j, s AS node, 0 AS dist FROM piv)""",
    ]
    for r in range(1, rounds + 1):
        prev = f"b{r - 1}"
        parts.append(
            f""", b{r} AS MATERIALIZED (
  SELECT j, node, dist FROM {prev}
  UNION ALL
  SELECT nw.j, nw.node, {r} AS dist FROM (
    SELECT DISTINCT p.j, e.dst AS node
    FROM uedges e JOIN {prev} p ON e.src = p.node AND p.dist = {r - 1}) nw
  LEFT JOIN {prev} old ON old.j = nw.j AND old.node = nw.node
  WHERE old.node IS NULL)"""
        )
    parts.append(
        f""", dd AS (SELECT j, node, CAST(dist AS DOUBLE) AS v FROM b{rounds})
, rm AS (SELECT node, sum(v) / {k} AS rm FROM dd GROUP BY node)
, cmx AS (SELECT j, sum(v) AS sv FROM dd GROUP BY j)
, cm AS (SELECT t.j, coalesce(c.sv, 0) / n AS cm
         FROM range({k}) t(j) LEFT JOIN cmx c ON c.j = t.j, nn)
, gr AS (SELECT (SELECT sum(rm) FROM rm) / (2.0 * n)
              + (SELECT sum(cm) FROM cm) / (2.0 * {k}) AS grand FROM nn)
SELECT g.node, g.j,
       round(coalesce(dd.v, 0) - coalesce(rm.rm, 0) - g.cm + gr.grand, 6) AS c
FROM (SELECT doc_id AS node, cm.j, cm.cm FROM documents CROSS JOIN cm) g
LEFT JOIN dd ON dd.node = g.node AND dd.j = g.j
LEFT JOIN rm ON rm.node = g.node
CROSS JOIN gr"""
    )
    return "\n".join(parts)


@register("pivot_mds_centered16", _pivot_centered_oracle_sql(16, 42))
def q_pivot_mds_centered16(spark, sf_dir):
    """Oracle twin for the rows-only `pivot_mds_coords` query: pins the
    whole PivotMDS pipeline up to the k x k eigensolve — seeded pivot draw,
    multi-source BFS hop distances, double centering with zero-filled
    unreached entries (``viz/PivotMDS.cpp:49-71``) — against a fully
    unrolled SQL replay. Only the (driver-side, 16 x 16, numpy) eigensolve
    and the resulting coordinates stay rows-only."""
    from networkit_spark.operators.layout import pivot_centered_matrix

    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    n = _n_docs(spark, sf_dir)
    C, _k = pivot_centered_matrix(e, nodes_range(spark, n), num_pivots=16, seed=42)
    return C.select("node", "j", F.round("c", 6).alias("c"))


# ---------------------------------------------------------------------------
# GroupClosenessLocalSearch one-swap engine twin
# ---------------------------------------------------------------------------

_GCLS_BIG = 1 << 40


def _gcls_swap1_oracle_sql(group: list[int], rounds: int = 10) -> str:
    """SQL replay of ONE exact-evaluation swap round of
    ``GroupClosenessLocalSearch.cpp`` (the engine `group_closeness_local_
    search` iterates): |S|-source BFS -> per-node (d1, owner, d2), shell
    candidates, per-candidate BFS, exact new_far(v, u) = base(v) +
    delta(v, u), best strictly-improving swap with (nf, v, u) min
    tiebreak, group after the swap."""
    g = ", ".join(f"({m})" for m in group)
    big = _GCLS_BIG
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", grp AS (SELECT CAST(m AS BIGINT) AS m FROM (VALUES {g}) t(m))
, s0 AS (SELECT m AS source, m AS node, 0 AS dist FROM grp)""",
    ]
    # BFS from the group members
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""", s{r} AS MATERIALIZED (
  SELECT source, node, dist FROM {prev}
  UNION ALL
  SELECT nw.source, nw.node, {r} AS dist FROM (
    SELECT DISTINCT p.source, e.dst AS node
    FROM uedges e JOIN {prev} p ON e.src = p.node AND p.dist = {r - 1}) nw
  LEFT JOIN {prev} old ON old.source = nw.source AND old.node = nw.node
  WHERE old.node IS NULL)"""
        )
    parts.append(
        f""", ds AS (SELECT source, node, dist FROM s{rounds})
, m1 AS (
    SELECT node, dist AS d1, source AS owner FROM (
      SELECT node, dist, source,
             row_number() OVER (PARTITION BY node ORDER BY dist, source) AS rk
      FROM ds) WHERE rk = 1)
, st AS (
    SELECT m1.node, m1.d1, m1.owner, coalesce(d2.d2, {big}) AS d2
    FROM m1 LEFT JOIN (
      SELECT ds.node, min(ds.dist) AS d2
      FROM ds JOIN m1 ON m1.node = ds.node AND ds.source <> m1.owner
      GROUP BY ds.node) d2 ON d2.node = m1.node)
, farv AS (SELECT sum(d1) AS far FROM st)
, shell AS (
    SELECT DISTINCT e.dst AS v FROM uedges e
    JOIN grp ON grp.m = e.src
    WHERE e.dst NOT IN (SELECT m FROM grp))
, v0 AS (SELECT v AS source, v AS node, 0 AS dist FROM shell)""",
    )
    # BFS from every shell candidate
    for r in range(1, rounds + 1):
        prev = f"v{r - 1}"
        parts.append(
            f""", v{r} AS MATERIALIZED (
  SELECT source, node, dist FROM {prev}
  UNION ALL
  SELECT nw.source, nw.node, {r} AS dist FROM (
    SELECT DISTINCT p.source, e.dst AS node
    FROM uedges e JOIN {prev} p ON e.src = p.node AND p.dist = {r - 1}) nw
  LEFT JOIN {prev} old ON old.source = nw.source AND old.node = nw.node
  WHERE old.node IS NULL)"""
        )
    parts.append(
        f""", dv AS (SELECT source AS v, node, dist AS dvx FROM v{rounds})
, joined AS (
    SELECT sh.v, st.owner,
           least(st.d1, coalesce(dv.dvx, {big})) AS n1,
           least(st.d2, coalesce(dv.dvx, {big})) AS n2
    FROM st CROSS JOIN shell sh
    LEFT JOIN dv ON dv.v = sh.v AND dv.node = st.node)
, base AS (SELECT v, sum(n1) AS base FROM joined WHERE n1 < {big} GROUP BY v)
, delta AS (
    SELECT v, owner, sum(n2 - n1) AS delta FROM joined
    WHERE n2 < {big} GROUP BY v, owner)
, nf AS (
    SELECT sh.v, grp.m AS u, base.base + coalesce(delta.delta, 0) AS nf
    FROM shell sh CROSS JOIN grp
    JOIN base ON base.v = sh.v
    LEFT JOIN delta ON delta.v = sh.v AND delta.owner = grp.m)
, best AS (
    SELECT v, u, nf FROM nf, farv WHERE nf < farv.far
    ORDER BY nf, v, u LIMIT 1)
SELECT CAST(coalesce(b.u, -1) AS BIGINT) AS swap_u,
       CAST(coalesce(b.v, -1) AS BIGINT) AS swap_v,
       CAST(f.far AS BIGINT) AS far0
FROM farv f LEFT JOIN best b ON TRUE"""
    )
    return "\n".join(parts)


@register("gcls_swap1_012", _gcls_swap1_oracle_sql([0, 1, 2]))
def q_gcls_swap1_012(spark, sf_dir):
    """Oracle twin for the rows-only `group_closeness_local_search_k3`
    query: ONE exact swap round of the identical engine (multi-source BFS
    stats, shell scan, batched exact new_far evaluation, strict-improvement
    argmin swap) from group {0,1,2}, against a fully unrolled SQL replay.
    The adaptive variant only repeats this round until a 1-swap local
    optimum, which is what keeps it rows-only."""
    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
    )

    e = doc_edges_undirected(spark, sf_dir).select("src", "dst")
    n = _n_docs(spark, sf_dir)
    S0 = [0, 1, 2]
    S1, far0 = group_closeness_local_search(
        e, nodes_range(spark, n), S0, max_swaps=1, batch=256
    )
    swapped = [(u, v) for u, v in zip(S0, S1) if u != v]
    u, v = swapped[0] if swapped else (-1, -1)
    return spark.createDataFrame(
        [(int(u), int(v), int(far0))], "swap_u long, swap_v long, far0 long"
    )


# ---------------------------------------------------------------------------
# Articulation points: independent brute-force oracle for the biconnected
# engine (components/BiconnectedComponents.cpp)
# ---------------------------------------------------------------------------


def _artic_oracle_sql(sub: int = 60, rounds: int = 8) -> str:
    """INDEPENDENT brute-force oracle: v is an articulation point iff
    removing v increases the connected-component count. Per candidate v,
    min-label propagation with pointer jumping (l' = least(l, min neighbor
    l, l[l])) over G\\v, all candidates in one unrolled recursion; base
    count from the same machinery on G."""
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", su AS (SELECT src, dst FROM uedges WHERE src < {sub} AND dst < {sub})
, vn AS (SELECT DISTINCT src AS node FROM su)
, bl0 AS (SELECT node, node AS lab FROM vn)""",
    ]
    for r in range(1, rounds + 1):
        prev = f"bl{r - 1}"
        parts.append(
            f""", bl{r} AS MATERIALIZED (
  SELECT a.node, least(a.lab, coalesce(nb.ml, a.lab), ll.lab) AS lab
  FROM {prev} a
  LEFT JOIN (SELECT e.dst AS node, min(p.lab) AS ml
             FROM su e JOIN {prev} p ON p.node = e.src
             GROUP BY e.dst) nb ON nb.node = a.node
  JOIN {prev} ll ON ll.node = a.lab)"""
        )
    parts.append(
        f""", basec AS (SELECT count(DISTINCT lab) AS c FROM bl{rounds})
, l0 AS (SELECT c.node AS v, n.node, n.node AS lab
         FROM vn c JOIN vn n ON n.node <> c.node)"""
    )
    for r in range(1, rounds + 1):
        prev = f"l{r - 1}"
        parts.append(
            f""", l{r} AS MATERIALIZED (
  SELECT a.v, a.node, least(a.lab, coalesce(nb.ml, a.lab), ll.lab) AS lab
  FROM {prev} a
  LEFT JOIN (SELECT p.v, e.dst AS node, min(p.lab) AS ml
             FROM su e JOIN {prev} p ON p.node = e.src AND e.src <> p.v AND e.dst <> p.v
             GROUP BY p.v, e.dst) nb ON nb.v = a.v AND nb.node = a.node
  JOIN {prev} ll ON ll.v = a.v AND ll.node = a.lab)"""
        )
    parts.append(
        f"""
SELECT x.v AS node, (x.c > basec.c) AS is_articulation
FROM (SELECT v, count(DISTINCT lab) AS c FROM l{rounds} GROUP BY v) x, basec
ORDER BY node"""
    )
    return "\n".join(parts)


@register("articulation_points_sub60", _artic_oracle_sql())
def q_articulation_points_sub60(spark, sf_dir):
    """Independent cross-check of the biconnected engine: articulation
    points derived from the edge partition (a non-isolated node is a cut
    vertex iff its incident edges span >= 2 biconnected components —
    the block-tree theorem), verified against a brute-force remove-v
    component-count SQL oracle that shares NO machinery with the engine."""
    from networkit_spark.operators.biconnected import BiconnectedComponents

    e = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 60) & (F.col("dst") < 60)
    )
    nodes = (
        e.select(F.col("src").alias("id")).distinct()
    )
    res = BiconnectedComponents().run(e, nodes)
    ep = res.get_edge_partition()
    inc = ep.select(F.col("u").alias("node"), "label").union(
        ep.select(F.col("v").alias("node"), "label")
    )
    return (
        inc.groupBy("node")
        .agg((F.count_distinct("label") >= 2).alias("is_articulation"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Push-relabel 2-superstep engine twin (flow/EdmondsKarp.cpp semantics via
# Goldberg-Tarjan; operators/flow._push_relabel_multi)
# ---------------------------------------------------------------------------


def _push_relabel_oracle_sql(sub: int = 120, t: int = 119,
                             bfs_rounds: int = 24, supersteps: int = 2) -> str:
    """Full SQL replay of the synchronous push-relabel engine for a FIXED
    number of supersteps from s=0: canonical pair state with net flow,
    source-saturating preflow, one exact global relabel (dual-target
    residual BFS, unrolled), then per superstep the admissible-arc scan,
    the deterministic cumulative-excess push allocation (cumsum over v
    asc), net-flow pair updates, excess deltas, and the min-neighbor+1
    relabel lift. Unit-free integer capacities 1+(src+dst)%5 keep every
    quantity exactly representable, so the value hash is stable."""
    parts = [
        f"WITH {EDGES_CTE}",
        f""", arcs AS (
    SELECT src, dst, 1.0 + (src + dst) % 5 AS capacity
    FROM edges WHERE src < {sub} AND dst < {sub})
, pp0 AS (
    SELECT lo, hi, sum(cfw) AS cap_fw, sum(cbw) AS cap_bw FROM (
      SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
             CASE WHEN src < dst THEN capacity ELSE 0 END AS cfw,
             CASE WHEN src > dst THEN capacity ELSE 0 END AS cbw
      FROM arcs WHERE src <> dst)
    GROUP BY lo, hi)
, nd AS (SELECT DISTINCT node FROM
         (SELECT lo AS node FROM pp0 UNION ALL SELECT hi FROM pp0))
, nc AS (SELECT count(*) AS n FROM nd)
, pf0 AS (
    SELECT lo, hi, cap_fw, cap_bw,
           CASE WHEN lo = 0 THEN cap_fw WHEN hi = 0 THEN -cap_bw
                ELSE 0.0 END AS flow
    FROM pp0)
, ex0 AS (
    SELECT node, -sum(o) AS ex FROM (
      SELECT lo AS node, flow AS o FROM pf0
      UNION ALL SELECT hi, -flow FROM pf0) GROUP BY node)
, st0 AS (
    SELECT nd.node, CAST(CASE WHEN nd.node = 0 THEN n ELSE 0 END AS BIGINT) AS h,
           coalesce(ex0.ex, 0.0) AS ex
    FROM nd LEFT JOIN ex0 ON ex0.node = nd.node, nc)
, r0 AS (
    SELECT u, v, res FROM (
      SELECT lo AS u, hi AS v, cap_fw - flow AS res FROM pf0
      UNION ALL SELECT hi, lo, cap_bw + flow FROM pf0)
    WHERE res > 1e-12)
, g0 AS (SELECT CAST({t} AS BIGINT) AS node, 0 AS src, 0 AS dist
         UNION ALL SELECT 0, 1, 0)""",
    ]
    for d in range(1, bfs_rounds + 1):
        prev = f"g{d - 1}"
        parts.append(
            f""", g{d} AS MATERIALIZED (
  SELECT node, src, dist FROM {prev}
  UNION ALL
  SELECT nw.node, nw.src, {d} AS dist FROM (
    SELECT DISTINCT r.u AS node, f.src
    FROM r0 r JOIN {prev} f ON f.node = r.v AND f.dist = {d - 1}) nw
  LEFT JOIN {prev} old ON old.node = nw.node AND old.src = nw.src
  WHERE old.node IS NULL)"""
        )
    parts.append(
        f""", d2 AS (SELECT node,
           min(CASE WHEN src = 0 THEN dist END) AS dt,
           min(CASE WHEN src = 1 THEN dist END) AS ds
    FROM g{bfs_rounds} GROUP BY node)
, ss0 AS (
    SELECT s.node,
           greatest(s.h, CASE WHEN s.node = 0 THEN n
                              WHEN d2.dt IS NOT NULL THEN d2.dt
                              WHEN d2.ds IS NOT NULL THEN n + d2.ds
                              ELSE 2 * n END) AS h,
           s.ex
    FROM st0 s LEFT JOIN d2 ON d2.node = s.node, nc)"""
    )
    for i in range(1, supersteps + 1):
        pp, st = f"pf{i - 1}", f"ss{i - 1}"
        parts.append(
            f""", r{i} AS (
    SELECT u, v, res FROM (
      SELECT lo AS u, hi AS v, cap_fw - flow AS res FROM {pp}
      UNION ALL SELECT hi, lo, cap_bw + flow FROM {pp})
    WHERE res > 1e-12)
, act{i} AS (
    SELECT node, h, ex FROM {st}, nc
    WHERE ex > 1e-12 AND node <> 0 AND node <> {t} AND h < 2 * n)
, psh{i} AS (
    SELECT u, v, greatest(0, least(res, ex - (cum - res))) AS amt FROM (
      SELECT a.node AS u, r.v, r.res AS res, a.ex AS ex,
             sum(r.res) OVER (PARTITION BY a.node ORDER BY r.v) AS cum
      FROM r{i} r
      JOIN act{i} a ON a.node = r.u
      JOIN {st} sv ON sv.node = r.v
      WHERE a.h = sv.h + 1)
    WHERE greatest(0, least(res, ex - (cum - res))) > 1e-12)
, del{i} AS (
    SELECT least(u, v) AS lo, greatest(u, v) AS hi,
           sum(CASE WHEN u < v THEN amt ELSE -amt END) AS d
    FROM psh{i} GROUP BY 1, 2)
, pf{i} AS (
    SELECT p.lo, p.hi, p.cap_fw, p.cap_bw,
           p.flow + coalesce(d.d, 0.0) AS flow
    FROM {pp} p LEFT JOIN del{i} d ON d.lo = p.lo AND d.hi = p.hi)
, exd{i} AS (
    SELECT node, sum(d) AS d FROM (
      SELECT u AS node, -amt AS d FROM psh{i}
      UNION ALL SELECT v, amt FROM psh{i}) GROUP BY node)
, lift{i} AS (
    SELECT a.node, min(sv.h) + 1 AS newh
    FROM act{i} a
    JOIN r{i} r ON r.u = a.node
    JOIN {st} sv ON sv.node = r.v
    WHERE a.node NOT IN (SELECT u FROM psh{i})
    GROUP BY a.node)
, ss{i} AS (
    SELECT s.node,
           least(greatest(coalesce(l.newh, s.h), s.h), 2 * n) AS h,
           s.ex + coalesce(e.d, 0.0) AS ex
    FROM {st} s
    LEFT JOIN exd{i} e ON e.node = s.node
    LEFT JOIN lift{i} l ON l.node = s.node, nc)"""
        )
    parts.append(
        f"""
SELECT lo, hi, CAST(flow AS BIGINT) AS flow FROM pf{supersteps} ORDER BY lo, hi"""
    )
    return "\n".join(parts)


@register("push_relabel_2rounds_0_119", _push_relabel_oracle_sql())
def q_push_relabel_2rounds(spark, sf_dir):
    """Oracle twin for the rows-only `max_flow_value` query (and the
    cut-clustering family built on the same engine): the exact synchronous
    push-relabel superstep loop (`operators/flow._push_relabel_multi`) run
    for a FIXED 2 supersteps — preflow, one exact global relabel,
    deterministic cumulative push allocation, relabel lifts — with the
    resulting per-pair net flows pinned against a fully unrolled SQL
    replay. The adaptive variant only repeats this superstep until no
    excess remains, which is what keeps it rows-only."""
    from networkit_spark.operators.flow import _push_relabel_multi

    e = (
        doc_edges(spark, sf_dir)
        .filter((F.col("src") < 120) & (F.col("dst") < 120))
        .select(
            "src", "dst",
            (1.0 + (F.col("src") + F.col("dst")) % 5).alias("capacity"),
        )
        .coalesce(2)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        res = _push_relabel_multi(e, [0], 119, max_rounds=2, relabel_every=8)
        out = res.pairs_df.select(
            "lo", "hi", F.col("flow").cast("long").alias("flow")
        ).orderBy("lo", "hi")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


# ---------------------------------------------------------------------------
# TwoPhaseL phase-1 add-round engine twin (scd/TwoPhaseL.cpp:13-89)
# ---------------------------------------------------------------------------


def _tpl_add1_oracle_sql(seeds: list[int]) -> str:
    """SQL replay of ONE phase-1 greedy add round of TwoPhaseL for a seed
    batch: member int/ext degrees -> per-seed (W, C, B, size), the
    boundary-size correction (members whose ONLY external neighbor is the
    candidate), shell candidate L = Lin/Lex gains with the reference's
    +-inf edge cases, and the per-seed argmax pick (ties -> smallest
    node)."""
    sv = ", ".join(f"({s})" for s in seeds)
    inf = "CAST('infinity' AS DOUBLE)"
    return f"""WITH {UEDGES_CTE}
, mem AS (SELECT CAST(s AS BIGINT) AS seed, CAST(s AS BIGINT) AS node
          FROM (VALUES {sv}) t(s))
, wdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM uedges GROUP BY src)
, mcon AS (
    SELECT m.seed, e.src AS node,
           sum(CASE WHEN md.node IS NOT NULL THEN e.weight ELSE 0 END) AS intdeg,
           sum(CASE WHEN md.node IS NULL THEN e.weight ELSE 0 END) AS extdeg
    FROM uedges e
    JOIN mem m ON m.node = e.src
    LEFT JOIN mem md ON md.seed = m.seed AND md.node = e.dst
    GROUP BY m.seed, e.src)
, ps AS (
    SELECT seed, sum(intdeg) / 2 AS W, sum(extdeg) AS C,
           sum(CASE WHEN extdeg > 0 THEN 1 ELSE 0 END) AS B,
           count(*) AS size
    FROM mcon GROUP BY seed)
, extp AS (
    SELECT m.seed, e.src AS member, e.dst AS x
    FROM uedges e JOIN mem m ON m.node = e.src
    WHERE NOT EXISTS (SELECT 1 FROM mem md
                      WHERE md.seed = m.seed AND md.node = e.dst))
, unq AS (
    SELECT seed, onlyx AS node, count(*) AS uniq_cnt FROM (
      SELECT seed, member, count(DISTINCT x) AS k, max(x) AS onlyx
      FROM extp GROUP BY seed, member)
    WHERE k = 1 GROUP BY seed, onlyx)
, sh AS (
    SELECT s.seed, s.node, s.intdeg, w.wdeg - s.intdeg AS extdeg,
           coalesce(u.uniq_cnt, 0) AS uniq_cnt
    FROM (SELECT m.seed, e.dst AS node, sum(e.weight) AS intdeg
          FROM uedges e JOIN mem m ON m.node = e.src
          WHERE NOT EXISTS (SELECT 1 FROM mem md
                            WHERE md.seed = m.seed AND md.node = e.dst)
          GROUP BY m.seed, e.dst) s
    JOIN wdeg w ON w.node = s.node
    LEFT JOIN unq u ON u.seed = s.seed AND u.node = s.node)
, cands AS (
    SELECT seed, node, n_lin, cur_lin,
           CASE WHEN n_lex > 0 THEN n_lin / n_lex
                WHEN lex_den <= 0 THEN -{inf} ELSE {inf} END AS nl,
           CASE WHEN cur_lex > 0 THEN cur_lin / cur_lex ELSE {inf} END AS cur_l
    FROM (
      SELECT sh.seed, sh.node,
             2.0 * (ps.W + sh.intdeg) / (ps.size + 1) AS n_lin,
             CAST(ps.B + (CASE WHEN sh.extdeg > 0 THEN 1 ELSE 0 END)
                  - sh.uniq_cnt AS DOUBLE) AS lex_den,
             (ps.C - sh.intdeg + sh.extdeg)
               / CAST(ps.B + (CASE WHEN sh.extdeg > 0 THEN 1 ELSE 0 END)
                      - sh.uniq_cnt AS DOUBLE) AS n_lex,
             2.0 * ps.W / ps.size AS cur_lin,
             CASE WHEN ps.B > 0 THEN ps.C / ps.B ELSE 0.0 END AS cur_lex
      FROM sh JOIN ps ON ps.seed = sh.seed))
SELECT seed, node AS first_add FROM (
    SELECT seed, node,
           row_number() OVER (PARTITION BY seed ORDER BY nl DESC, node ASC) AS rk
    FROM cands WHERE n_lin > cur_lin AND nl > cur_l)
WHERE rk = 1 ORDER BY seed"""


@register("tpl_add1_hubs", _tpl_add1_oracle_sql([0, 1, 2, 3]))
def q_tpl_add1_hubs(spark, sf_dir):
    """Oracle twin for the rows-only `two_phase_l_hubs` query: ONE phase-1
    greedy add round of the identical engine (`operators/scd.tpl_add_round`
    — the exact code `two_phase_l` iterates), seeds {0,1,2,3}, against a
    SQL replay of the L = Lin/Lex gain scan and argmax pick. Phase 2's
    community-sized removal sweep and the data-dependent round count are
    what keep the full query rows-only."""
    from networkit_spark.operators.scd import tpl_add_round

    e = doc_edges_undirected(spark, sf_dir).select("src", "dst", "weight")
    wdeg_df = e.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("wdeg")
    )
    seeds = [0, 1, 2, 3]
    members = spark.createDataFrame(
        [(s, s) for s in seeds], "seed long, node long"
    )
    picks = tpl_add_round(e, wdeg_df, members, set(seeds))
    return spark.createDataFrame(
        sorted([(int(r["seed"]), int(r["node"])) for r in picks]),
        "seed long, first_add long",
    )


@register(
    "planarity_euler_bounds",
    f"""WITH {UEDGES_CTE}
, canon AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM uedges WHERE src <> dst)
, g AS (
    SELECT 'doc_graph' AS graph,
           (SELECT count(DISTINCT x) FROM
             (SELECT a AS x FROM canon UNION ALL SELECT b FROM canon)) AS n,
           (SELECT count(*) FROM canon) AS m
    UNION ALL
    SELECT 'doc_sub40',
           (SELECT count(DISTINCT x) FROM
             (SELECT a AS x FROM canon WHERE a < 40 AND b < 40
              UNION ALL SELECT b FROM canon WHERE a < 40 AND b < 40)),
           (SELECT count(*) FROM canon WHERE a < 40 AND b < 40))
SELECT graph, CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
       (n > 2 AND m > 3 * n - 6) AS euler_reject
FROM g ORDER BY graph""",
)
def q_planarity_euler_bounds(spark, sf_dir):
    """Oracle twin for the distributed half of the rows-only
    `planarity_checks` query: the O(1)-aggregate Euler-bound pre-check
    (``planarity/LeftRightPlanarityCheck.cpp`` via
    `operators/planarity.euler_precheck`) on the doc graph and its <40-node
    subgraph — exactly the path that rejects a 10^12-edge crawl graph
    without collecting anything. Only the per-component LR conflict-pair
    core (driver-side, Euler-bounded to O(n) rows) stays rows-only."""
    from networkit_spark.operators.planarity import euler_precheck

    full = doc_edges_undirected(spark, sf_dir)
    sub = full.filter((F.col("src") < 40) & (F.col("dst") < 40))
    rows = []
    for name, g in (("doc_graph", full), ("doc_sub40", sub)):
        n, m, rej = euler_precheck(g)
        rows.append((name, n, m, rej))
    return spark.createDataFrame(
        sorted(rows), "graph string, n long, m long, euler_reject boolean"
    )
