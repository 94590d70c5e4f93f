"""Round-4d gate queries: GraphClusteringTools battery (communication
graph, imbalance + the partition predicates, per-(node,cluster) weighted
degree), CoverHubDominance, Kruskal/Prim minimum spanning forest, the
ChibaNishizeki triangle edge score, the distributed Bloom filter, and the
SNAP edge-list partition (cover) reader roundtrip.

Every query pairs the Spark operator with an independently-derived DuckDB
oracle over the shared deterministic documents graph (``testgraph.py``).
The Bloom oracle replays the EXACT filter (same md5 positions), expressed
as set membership over hashed positions — semantically identical to the
bit-array words without relying on DuckDB's 64-bit shift overflow
behavior.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.entry_queries_graph import (
    MSF_JUMPS,
    MSF_ROUNDS,
    MSF_W_SQL,
    _msf_oracle_sql,
)
from networkit_spark.graph import nodes_range
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
# KruskalMSF / PrimMSF — MINIMUM spanning forest (graph/KruskalMSF.cpp,
# graph/PrimMSF.cpp). Same Boruvka engine as max_spanning_forest with the
# order flipped; oracle = the identical algorithm unrolled to SQL with
# maximum=False.
# ---------------------------------------------------------------------------

@register("min_spanning_forest", _msf_oracle_sql(maximum=False))
def q_min_spanning_forest(spark, sf_dir):
    """Kruskal/Prim minimum spanning forest over the gate graph with
    portable hash weights (unique forest under the (weight asc, (lo,hi)
    asc) total order)."""
    from networkit_spark.operators.spanning import max_spanning_forest_fixed

    n = _n_docs(spark, sf_dir)
    ue = doc_edges_undirected(spark, sf_dir)
    cedges = ue.filter(F.col("src") < F.col("dst")).select(
        "src", "dst",
        ((F.col("src") * 131071 + F.col("dst") * 524287) % 999983 + 1)
        .cast("double").alias("weight"),
    )
    return max_spanning_forest_fixed(
        cedges, nodes_range(spark, n), rounds=MSF_ROUNDS, jumps=MSF_JUMPS,
        maximum=False,
    )


# ---------------------------------------------------------------------------
# GraphClusteringTools::communicationGraph — inter-community quotient graph
# on the mod-7 partition. Compacted ids = dense ascending-label rank.
# ---------------------------------------------------------------------------

@register(
    "communication_graph_mod7",
    f"""WITH {UEDGES_CTE},
lab AS (SELECT CAST(doc_id AS BIGINT) AS node, CAST(doc_id % 7 AS BIGINT) AS label FROM documents),
m AS (
  SELECT label, CAST(dense_rank() OVER (ORDER BY label) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT label FROM lab)
),
je AS (
  SELECT ma.cid AS ca, mb.cid AS cb, e.weight
  FROM (SELECT src, dst, weight FROM uedges WHERE src < dst) e
  JOIN lab ls ON ls.node = e.src
  JOIN lab ld ON ld.node = e.dst
  JOIN m ma ON ma.label = ls.label
  JOIN m mb ON mb.label = ld.label
  WHERE ls.label <> ld.label
)
SELECT least(ca, cb) AS ca, greatest(ca, cb) AS cb,
       CAST(sum(weight) AS DOUBLE) AS weight
FROM je GROUP BY 1, 2""",
)
def q_communication_graph_mod7(spark, sf_dir):
    from networkit_spark.operators.community import communication_graph

    ue = doc_edges_undirected(spark, sf_dir)
    return communication_graph(ue, _mod_labels(spark, sf_dir, 7))


# ---------------------------------------------------------------------------
# GraphClusteringTools predicates + imbalance, one single-row scalar query:
# imbalance of the mod-7 partition, isProperClustering, isSingleton, isOne,
# equalClusterings(mod7, relabeled mod7) and equalClusterings(mod7, mod5).
# ---------------------------------------------------------------------------

@register(
    "partition_predicates",
    """WITH lab AS (SELECT CAST(doc_id AS BIGINT) AS node, doc_id % 7 AS label FROM documents),
sizes AS (SELECT label, count(*) AS c FROM lab GROUP BY label),
imb AS (
  SELECT CAST(max(c) AS DOUBLE) / ceil(CAST(sum(c) AS DOUBLE) / count(*)) AS imbalance
  FROM sizes
),
pairs75 AS (
  SELECT DISTINCT doc_id % 7 AS la, doc_id % 5 AS lb FROM documents
),
eq75 AS (
  SELECT CAST((SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM pairs75 GROUP BY la)) = 1
          AND (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM pairs75 GROUP BY lb)) = 1
          AS INT) AS equal_mod7_mod5
)
SELECT round(imb.imbalance, 7) AS imbalance,
       1 AS is_proper,
       CAST((SELECT count(*) FROM documents) = (SELECT count(*) FROM sizes) AS INT) AS is_singleton,
       CAST((SELECT count(*) FROM sizes) = 1 AS INT) AS is_one,
       1 AS equal_mod7_relabel,
       eq75.equal_mod7_mod5
FROM imb CROSS JOIN eq75""",
)
def q_partition_predicates(spark, sf_dir):
    from networkit_spark.operators.community import (
        equal_clusterings,
        get_imbalance,
        is_one_clustering,
        is_proper_clustering,
        is_singleton_clustering,
    )

    lab7 = _mod_labels(spark, sf_dir, 7)
    lab5 = _mod_labels(spark, sf_dir, 5)
    relab = lab7.select("node", (F.col("label") * 13 + 2).alias("label"))
    nodes = lab7.select("node")
    row = (
        round(get_imbalance(lab7), 7),
        int(is_proper_clustering(nodes, lab7)),
        int(is_singleton_clustering(lab7)),
        int(is_one_clustering(lab7)),
        int(equal_clusterings(lab7, relab)),
        int(equal_clusterings(lab7, lab5)),
    )
    return spark.createDataFrame(
        [row],
        "imbalance double, is_proper int, is_singleton int, is_one int, "
        "equal_mod7_relabel int, equal_mod7_mod5 int",
    )


# ---------------------------------------------------------------------------
# GraphClusteringTools::weightedDegreeWithCluster — batched (node, cid)
# incident weight on the symmetrized graph, mod-7 partition.
# ---------------------------------------------------------------------------

@register(
    "weighted_degree_by_cluster",
    f"""WITH {UEDGES_CTE},
lab AS (SELECT CAST(doc_id AS BIGINT) AS node, CAST(doc_id % 7 AS BIGINT) AS cid FROM documents)
SELECT e.src AS node, lab.cid, CAST(sum(e.weight) AS DOUBLE) AS wdeg
FROM uedges e JOIN lab ON lab.node = e.dst
GROUP BY e.src, lab.cid""",
)
def q_weighted_degree_by_cluster(spark, sf_dir):
    from networkit_spark.operators.community import weighted_degree_with_cluster

    ue = doc_edges_undirected(spark, sf_dir)
    return weighted_degree_with_cluster(ue, _mod_labels(spark, sf_dir, 7))


# ---------------------------------------------------------------------------
# CoverHubDominance — overlapping cover: every node is in subset
# (node % 5); even nodes additionally in subset 5 + (node % 3).
# ---------------------------------------------------------------------------

COVER_CTE = """cov AS (
  SELECT CAST(doc_id AS BIGINT) AS node, CAST(doc_id % 5 AS BIGINT) AS label FROM documents
  UNION
  SELECT CAST(doc_id AS BIGINT), CAST(5 + doc_id % 3 AS BIGINT) FROM documents WHERE doc_id % 2 = 0
)"""


@register(
    "cover_hub_dominance",
    f"""WITH {UEDGES_CTE},
{COVER_CTE},
ideg AS (
  SELECT e.src AS node, ca.label, count(*) AS idg
  FROM uedges e
  JOIN cov ca ON ca.node = e.src
  JOIN cov cb ON cb.node = e.dst AND cb.label = ca.label
  GROUP BY e.src, ca.label
),
sizes AS (SELECT label, count(*) AS size FROM cov GROUP BY label),
top AS (SELECT label, max(idg) AS mx FROM ideg GROUP BY label)
SELECT s.label, s.size,
       CASE WHEN s.size > 1
            THEN CAST(coalesce(t.mx, 0) AS DOUBLE) / (s.size - 1)
            ELSE 1.0 END AS hub_dominance
FROM sizes s LEFT JOIN top t ON t.label = s.label""",
)
def q_cover_hub_dominance(spark, sf_dir):
    from networkit_spark.operators.community import cover_hub_dominance

    ue = doc_edges_undirected(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        F.col("doc_id").cast("long").alias("node"),
        (F.col("doc_id") % 5).cast("long").alias("label"),
    )
    extra = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("long").alias("node"),
        (5 + F.col("doc_id") % 3).cast("long").alias("label"),
    )
    return cover_hub_dominance(ue, base.union(extra))


# ---------------------------------------------------------------------------
# ChibaNishizekiTriangleEdgeScore — identical output contract to
# TriangleEdgeScore (triangles per edge); registered under its own name so
# the reference's second entry point has its own gate line.
# ---------------------------------------------------------------------------

from networkit_spark.entry_queries import ORACLES as _ORACLES  # noqa: E402


@register("chiba_nishizeki_score", _ORACLES["triangle_edge_score"])
def q_chiba_nishizeki_score(spark, sf_dir):
    from networkit_spark.operators.triangles import chiba_nishizeki_triangle_score

    return chiba_nishizeki_triangle_score(doc_edges_undirected(spark, sf_dir))


# ---------------------------------------------------------------------------
# Bloom filter (auxiliary/BloomFilter.cpp): members = even doc ids, probes =
# all doc ids; m = 4096 bits, k = 3 salted md5 positions. The oracle
# replays the exact same hashed positions (portable md5 fold), so the
# handful of deterministic false positives match bit-for-bit.
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 3
_BLOOM_SEED = 42


def _bloom_oracle() -> str:
    from networkit_spark.functions.bloom import pos_sql

    mpos = pos_sql("m.v", "i.i", _BLOOM_SEED, _BLOOM_M)
    ppos = pos_sql("p.v", "i.i", _BLOOM_SEED, _BLOOM_M)
    return f"""WITH ks AS (SELECT unnest(range({_BLOOM_K})) AS i),
members AS (SELECT CAST(doc_id AS BIGINT) AS v FROM documents WHERE doc_id % 2 = 0),
mpos AS (SELECT DISTINCT {mpos} AS pos FROM members m CROSS JOIN ks i),
probes AS (SELECT CAST(doc_id AS BIGINT) AS v FROM documents),
ppos AS (SELECT p.v, {ppos} AS pos FROM probes p CROSS JOIN ks i)
SELECT ppos.v AS node,
       CAST(min(CASE WHEN mpos.pos IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS maybe
FROM ppos LEFT JOIN mpos ON mpos.pos = ppos.pos
GROUP BY ppos.v"""


@register("bloom_membership", _bloom_oracle())
def q_bloom_membership(spark, sf_dir):
    from networkit_spark.functions.bloom import bloom_build, bloom_contains

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    members = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("long").alias("v")
    )
    probes = docs.select(F.col("doc_id").cast("long").alias("v"))
    bloom = bloom_build(members, "v", _BLOOM_M, _BLOOM_K, seed=_BLOOM_SEED)
    out = bloom_contains(probes, bloom, "v", _BLOOM_M, _BLOOM_K, seed=_BLOOM_SEED)
    return out.select(F.col("v").alias("node"), F.col("maybe").cast("int").alias("maybe"))


# ---------------------------------------------------------------------------
# SNAPEdgeListPartitionReader roundtrip: write a cover file (one community
# per line, with a leading comment line that CONSUMES subset id 1 — the
# reference increments before the skip check), read it back distributed.
# ---------------------------------------------------------------------------

@register(
    "snap_cover_roundtrip",
    """SELECT CAST(doc_id AS BIGINT) AS node, CAST(2 + doc_id % 4 AS BIGINT) AS subset
FROM documents WHERE doc_id < 40""",
)
def q_snap_cover_roundtrip(spark, sf_dir):
    from networkit_spark.sources.partitions import read_snap_cover

    n = min(40, _n_docs(spark, sf_dir))
    lines = ["# communities"]
    for g in range(4):
        lines.append(" ".join(str(i) for i in range(n) if i % 4 == g))
    d = tempfile.mkdtemp(prefix="snapcov")
    path = os.path.join(d, "cover.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return read_snap_cover(spark, path)


# ---------------------------------------------------------------------------
# Extended LinkPredictor battery (NeighborhoodDistance / NeighborsMeasure /
# AdjustedRand-with-reference-quirk / SameCommunity / U-V degree) over all
# pairs u < v with both endpoints < 60.
# ---------------------------------------------------------------------------

@register(
    "link_pred_extended",
    f"""WITH {UEDGES_CTE},
n60 AS (SELECT CAST(doc_id AS BIGINT) AS x FROM documents WHERE doc_id < 60),
p AS (SELECT a.x AS u, b.x AS v FROM n60 a JOIN n60 b ON a.x < b.x),
deg AS (SELECT src AS node, count(*) AS deg FROM uedges GROUP BY src),
cn AS (
  SELECT p.u, p.v, count(*) AS cn
  FROM p JOIN uedges e1 ON e1.src = p.u
         JOIN uedges e2 ON e2.src = p.v AND e2.dst = e1.dst
  GROUP BY p.u, p.v
),
pp AS (
  SELECT p.u, p.v, count(*) AS pp
  FROM p JOIN uedges e1 ON e1.src = p.u
         JOIN uedges e2 ON e2.src = p.v
         JOIN uedges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
  GROUP BY p.u, p.v
),
base AS (
  SELECT p.u, p.v,
         coalesce(cn.cn, 0) AS cn,
         coalesce(pp.pp, 0) AS pp,
         coalesce(du.deg, 0) AS u_deg,
         coalesce(dv.deg, 0) AS v_deg
  FROM p
  LEFT JOIN cn ON cn.u = p.u AND cn.v = p.v
  LEFT JOIN pp ON pp.u = p.u AND pp.v = p.v
  LEFT JOIN deg du ON du.node = p.u
  LEFT JOIN deg dv ON dv.node = p.v
)
SELECT u, v,
       CASE WHEN u_deg > 0 AND v_deg > 0
            THEN round(CAST(cn AS DOUBLE) / sqrt(CAST(u_deg AS DOUBLE) * v_deg), 7)
            ELSE 0.0 END AS nbhd_distance,
       CAST(cn + pp AS BIGINT) AS neighbors_measure,
       CASE WHEN (cn*(u_deg+v_deg-cn) + cn*(u_deg+v_deg-cn)
                  + 2*cn*((SELECT n FROM nn) - (u_deg+v_deg-cn))
                  + (u_deg+v_deg-cn)*(u_deg+v_deg-cn)
                  + (u_deg+v_deg-cn)*((SELECT n FROM nn) - (u_deg+v_deg-cn))
                  + (u_deg+v_deg-cn)*(u_deg+v_deg-cn)
                  + (u_deg+v_deg-cn)*((SELECT n FROM nn) - (u_deg+v_deg-cn))) <> 0
            THEN round(2.0 * (cn * ((SELECT n FROM nn) - (u_deg+v_deg-cn))
                              - CAST(u_deg+v_deg-cn AS DOUBLE) * (u_deg+v_deg-cn))
                       / (cn*(u_deg+v_deg-cn) + cn*(u_deg+v_deg-cn)
                          + 2*cn*((SELECT n FROM nn) - (u_deg+v_deg-cn))
                          + (u_deg+v_deg-cn)*(u_deg+v_deg-cn)
                          + (u_deg+v_deg-cn)*((SELECT n FROM nn) - (u_deg+v_deg-cn))
                          + (u_deg+v_deg-cn)*(u_deg+v_deg-cn)
                          + (u_deg+v_deg-cn)*((SELECT n FROM nn) - (u_deg+v_deg-cn))), 7)
            ELSE 0.0 END AS adjusted_rand,
       CAST(u % 7 = v % 7 AS INT) AS same_community,
       CAST(u_deg + v_deg - cn AS BIGINT) AS total_neighbors,
       CAST(u_deg AS BIGINT) AS u_deg,
       CAST(v_deg AS BIGINT) AS v_deg
FROM base""",
)
def q_link_pred_extended(spark, sf_dir):
    from networkit_spark.operators.linkprediction import extended_link_prediction

    ue = doc_edges_undirected(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    nodes60 = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select(F.col("doc_id").cast("long").alias("x"))
    )
    pairs = (
        nodes60.alias("a")
        .join(nodes60.alias("b"), F.col("a.x") < F.col("b.x"))
        .select(F.col("a.x").alias("u"), F.col("b.x").alias("v"))
    )
    out = extended_link_prediction(ue, pairs, _mod_labels(spark, sf_dir, 7), n_nodes=n)
    return out.select(
        "u", "v", "nbhd_distance", "neighbors_measure", "adjusted_rand",
        "same_community", "total_neighbors",
        F.col("u_deg").cast("long").alias("u_deg"),
        F.col("v_deg").cast("long").alias("v_deg"),
    )


# ---------------------------------------------------------------------------
# PowerlawDegreeSequence (generators/PowerlawDegreeSequence.cpp) — the
# standalone degree-sequence sampler with the even-sum repair; breakpoints
# inlined identically on both sides so the oracle replays every draw.
# ---------------------------------------------------------------------------

_PL_MIN, _PL_MAX, _PL_GAMMA, _PL_SEED = 2, 12, -2.5, 7


def _powerlaw_oracle() -> str:
    from networkit_spark.operators.sampling import draw_sql
    from networkit_spark.sources.generators import _PL_MOD, _powerlaw_cumprob

    cum = _powerlaw_cumprob(_PL_MIN, _PL_MAX, _PL_GAMMA)
    d = draw_sql("pldeg", _PL_SEED, "doc_id")
    idx = " + ".join(
        f"CASE WHEN {c!r} < u THEN 1 ELSE 0 END" for c in cum[:-1]
    )
    return f"""WITH draws AS (
  SELECT CAST(doc_id AS BIGINT) AS node,
         CAST({d} % {_PL_MOD} AS DOUBLE) / {_PL_MOD}.0 AS u
  FROM documents
),
base AS (SELECT node, CAST({_PL_MAX} - ({idx}) AS BIGINT) AS degree FROM draws),
par AS (SELECT sum(degree) % 2 AS odd FROM base),
fx AS (SELECT node FROM base ORDER BY degree DESC, node ASC LIMIT 1)
SELECT b.node,
       b.degree - CASE WHEN (SELECT odd FROM par) = 1
                        AND b.node = (SELECT node FROM fx)
                       THEN 1 ELSE 0 END AS degree
FROM base b"""


@register("powerlaw_degrees", _powerlaw_oracle())
def q_powerlaw_degrees(spark, sf_dir):
    from networkit_spark.sources.generators import powerlaw_degree_sequence

    n = _n_docs(spark, sf_dir)
    return powerlaw_degree_sequence(
        spark, n, _PL_MIN, _PL_MAX, _PL_GAMMA, seed=_PL_SEED
    )


# ---------------------------------------------------------------------------
# SpectralPartitioner (community.pyx:2040-2215) — eigendecomposition is not
# SQL-expressible, so rows-only here; the pytest replica + planted-structure
# tests are the correctness pin (tests/test_round4d.py).
# ---------------------------------------------------------------------------


@register("spectral_partition_k4")
def q_spectral_partition_k4(spark, sf_dir):
    from networkit_spark.operators.spectral import spectral_partition

    ue = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 100) & (F.col("dst") < 100)
    )
    return spectral_partition(ue, 100, 4).orderBy("node")


# ---------------------------------------------------------------------------
# MaxentStress layout (viz/MaxentStress.cpp) — iterative CG solves + the
# grid Barnes-Hut entropy term; rows-only (pytest pins quality/determinism,
# tests/test_maxent.py). Runs on the largest connected component of the
# <60-node induced gate subgraph (the reference rejects disconnected input).
# ---------------------------------------------------------------------------


@register("maxent_layout")
def q_maxent_layout(spark, sf_dir):
    from networkit_spark.operators.components import ConnectedComponents
    from networkit_spark.operators.maxent import maxent_stress

    ue = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 60) & (F.col("dst") < 60)
    )
    labels = ConnectedComponents().run(ue).labels_df
    top = (
        labels.groupBy("label").count().orderBy(F.desc("count"), "label").first()["label"]
    )
    keep = labels.filter(F.col("label") == top).select(F.col("node"))
    ue_cc = (
        ue.join(keep.withColumnRenamed("node", "src"), "src")
        .join(keep.withColumnRenamed("node", "dst"), "dst")
    )
    out = maxent_stress(
        ue_cc, dim=2, k=2, seed=11,
        max_solves_per_alpha=2, final_alpha=0.5,
        cg_max_iterations=25, fast_computation=True, grid=4,
    )
    return out.select(
        "node",
        F.round(F.element_at("x", 1), 7).alias("x0"),
        F.round(F.element_at("x", 2), 7).alias("x1"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# stats.pyx / centrality.pyx module helpers (gini, rankPerNode,
# relativeRankErrors) — reference stats.pyx:16, centrality.pyx:2691,2720.
# All three are rank computations: the Spark side uses the distributed
# range-sort rank (plans/ids.py), the oracle the equivalent SQL window.
# Sums are integer-exact in doubles here, so round(…,7) matches bit-for-bit.
# ---------------------------------------------------------------------------


def _deg_cte(direction: str) -> str:
    col = "src" if direction == "out" else "dst"
    return f"""
{direction}deg AS (
    SELECT d.doc_id AS node, CAST(coalesce(cnt, 0) AS DOUBLE) AS sc
    FROM documents d
    LEFT JOIN (SELECT {col}, count(*) AS cnt FROM edges GROUP BY {col}) t
      ON d.doc_id = t.{col}
)"""


@register(
    "degree_gini",
    f"""
WITH {EDGES_CTE},
{_deg_cte('out')},
r AS (SELECT sc, row_number() OVER (ORDER BY sc) AS j FROM outdeg)
SELECT round(2.0*sum(j*sc)/(count(*)*sum(sc)) - (count(*)+1.0)/count(*), 7) AS gini
FROM r
""",
)
def q_degree_gini(spark, sf_dir):
    """Gini coefficient of the out-degree distribution (stats.pyx:16)."""
    from networkit_spark.plans.ids import dense_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("node")
    )
    deg = doc_edges(spark, sf_dir).groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("cnt")
    )
    x = (
        docs.join(deg, "node", "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("double").alias("x"))
    )
    ranked = dense_ids(x, "x", id_col="j", distinct=False)
    return ranked.agg(
        F.round(
            2.0 * F.sum((F.col("j") + 1) * F.col("x")) / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1.0) / F.count("*"),
            7,
        ).alias("gini")
    )


@register(
    "degree_rank_per_node",
    f"""
WITH {EDGES_CTE},
{_deg_cte('out')}
SELECT node, CAST(rank() OVER (ORDER BY sc DESC) - 1 AS BIGINT) AS rk
FROM outdeg
""",
)
def q_degree_rank_per_node(spark, sf_dir):
    """rankPerNode of the out-degree ranking (centrality.pyx:2691):
    0-based position, ties share the first equal-score entry's rank."""
    from networkit_spark.stats import rank_per_node

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("node")
    )
    deg = doc_edges(spark, sf_dir).groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("cnt")
    )
    ranking = docs.join(deg, "node", "left").select(
        "node", F.coalesce(F.col("cnt"), F.lit(0)).cast("double").alias("score")
    )
    return rank_per_node(ranking).withColumnRenamed("rank", "rk")


@register(
    "rank_errors_out_vs_in",
    f"""
WITH {EDGES_CTE},
{_deg_cte('out')},
{_deg_cte('in')},
rx AS (SELECT node, rank() OVER (ORDER BY sc DESC) AS r FROM outdeg),
ry AS (SELECT node, rank() OVER (ORDER BY sc DESC) AS r FROM indeg)
SELECT rx.node AS node, round(rx.r / CAST(ry.r AS DOUBLE), 7) AS error
FROM rx JOIN ry ON rx.node = ry.node
""",
)
def q_rank_errors_out_vs_in(spark, sf_dir):
    """relativeRankErrors between the out- and in-degree rankings
    (centrality.pyx:2720): (rank_x+1)/(rank_y+1) per node, 0-based ranks."""
    from networkit_spark.stats import relative_rank_errors

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("node")
    )
    e = doc_edges(spark, sf_dir)

    def ranking(col):
        deg = e.groupBy(F.col(col).alias("node")).agg(F.count("*").alias("cnt"))
        return docs.join(deg, "node", "left").select(
            "node", F.coalesce(F.col("cnt"), F.lit(0)).cast("double").alias("score")
        )

    out = relative_rank_errors(ranking("src"), ranking("dst"))
    return out.select("node", F.round("error", 7).alias("error"))


@register(
    "inspect_communities_mod10",
    f"""
WITH {UEDGES_CTE},
lab AS (SELECT doc_id AS node, doc_id % 10 AS label FROM documents),
sizes AS (SELECT label, count(*) AS sz FROM lab GROUP BY label),
szagg AS (SELECT count(*) AS k, min(sz) AS mn, max(sz) AS mx, sum(sz) AS n FROM sizes),
m AS (SELECT sum(weight)/2.0 AS w, count(*)/2.0 AS cnt FROM uedges),
intra AS (
  SELECT coalesce(sum(e.weight), 0)/2.0 AS w
  FROM uedges e JOIN lab a ON e.src = a.node JOIN lab b ON e.dst = b.node
  WHERE a.label = b.label
),
vols AS (
  SELECT l.label, coalesce(sum(t.wdeg), 0) AS vol
  FROM lab l LEFT JOIN (SELECT src, sum(weight) AS wdeg FROM uedges GROUP BY src) t
    ON l.node = t.src
  GROUP BY l.label
),
sv AS (SELECT sum(vol*vol) AS s FROM vols)
SELECT '# communities' AS property, round(k*1.0, 7) AS val FROM szagg
UNION ALL SELECT 'min community size', round(mn*1.0, 7) FROM szagg
UNION ALL SELECT 'max community size', round(mx*1.0, 7) FROM szagg
UNION ALL SELECT 'avg. community size', round(n*1.0/k, 7) FROM szagg
UNION ALL SELECT 'imbalance', round(mx / ceil(n*1.0/k), 7) FROM szagg
UNION ALL SELECT 'edge cut', round(m.w - intra.w, 7) FROM m, intra
UNION ALL SELECT 'edge cut (portion)', round((m.w - intra.w)/m.cnt, 7) FROM m, intra
UNION ALL SELECT 'modularity', round(intra.w/m.w - sv.s/(4*m.w*m.w), 7) FROM m, intra, sv
""",
)
def q_inspect_communities_mod10(spark, sf_dir):
    """inspectCommunities property battery (community.pyx:1673-1707) on the
    deterministic node%10 partition of the undirected gate graph."""
    from networkit_spark.operators.community import inspect_communities

    ue = doc_edges_undirected(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labels = docs.select(
        F.col("doc_id").alias("node"), (F.col("doc_id") % 10).alias("label")
    )
    out = inspect_communities(ue, labels)
    return out.select("property", F.round("value", 7).alias("val"))


# ---------------------------------------------------------------------------
# ClusteringCoefficient::approxAvgLocal (global/ClusteringCoefficient.cpp:
# 130-162) — Schank-Wagner wedge sampling with portable-md5 draws, so the
# oracle replays the exact estimate (same node index, same neighbor pair).
# ---------------------------------------------------------------------------

_ACC_TRIALS = 500
_ACC_SEED = 7


def _acc_oracle_sql() -> str:
    from networkit_spark.operators.sampling import draw_sql

    d_node = draw_sql("cc", _ACC_SEED, "k")
    d_u = draw_sql("ccu", _ACC_SEED, "k")
    d_w = draw_sql("ccw", _ACC_SEED, "k")
    return f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
elig AS (
  SELECT node, d, row_number() OVER (ORDER BY node) - 1 AS idx
  FROM deg WHERE d >= 2
),
kk AS (SELECT count(*) AS c FROM elig),
nbr AS (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn
  FROM uedges
),
tr AS (
  SELECT k, {d_node} % (SELECT c FROM kk) AS ridx
  FROM range({_ACC_TRIALS}) t(k)
),
tv AS (
  SELECT tr.k, e.node AS v, e.d,
         {d_u} % e.d AS i0,
         {d_w} % (e.d - 1) AS j0
  FROM tr JOIN elig e ON e.idx = tr.ridx
),
ij AS (
  SELECT k, v, i0 AS i,
         j0 + CASE WHEN j0 >= i0 THEN 1 ELSE 0 END AS j
  FROM tv
),
uw AS (
  SELECT ij.k, nu.dst AS u, nw.dst AS w
  FROM ij
  JOIN nbr nu ON nu.src = ij.v AND nu.rn = ij.i
  JOIN nbr nw ON nw.src = ij.v AND nw.rn = ij.j
)
SELECT round(
  sum(CASE WHEN e.src IS NOT NULL THEN 1.0 ELSE 0.0 END) / {_ACC_TRIALS}, 7
) AS acc
FROM uw LEFT JOIN uedges e ON e.src = uw.u AND e.dst = uw.w
"""


@register("approx_avg_local_cc", _acc_oracle_sql())
def q_approx_avg_local_cc(spark, sf_dir):
    from networkit_spark.operators.triangles import approx_avg_local_clustering

    ue = doc_edges_undirected(spark, sf_dir)
    est = approx_avg_local_clustering(ue, _ACC_TRIALS, seed=_ACC_SEED)
    return spark.range(1).select(F.round(F.lit(est), 7).alias("acc"))


# ---------------------------------------------------------------------------
# Dinic max flow (flow/Dinic.cpp — level graph + blocking flow;
# operators/dinic.py). Two gate lines: the rows-only full run (adaptive
# phase count is not SQL-expressible) and an oracle-checked engine twin
# pinning the phase-1 level-graph construction the phases iterate.
# ---------------------------------------------------------------------------

_DINIC_SUB = 80
_DINIC_T = 79


def _dinic_arcs(spark, sf_dir):
    return (
        doc_edges(spark, sf_dir)
        .filter((F.col("src") < _DINIC_SUB) & (F.col("dst") < _DINIC_SUB))
        .select(
            "src", "dst",
            (1.0 + (F.col("src") + F.col("dst")) % 5).alias("capacity"),
        )
        .coalesce(2)
    )


@register("dinic_max_flow_0_79")  # no SQL oracle: the phase loop is
# adaptive (shortest-path length strictly increases until disconnection);
# value/feasibility/min-cut pinned by tests/test_dinic.py vs networkx AND
# vs the independent push-relabel kernel; the level-graph engine is
# oracle-pinned by `dinic_level_graph_0_79` below
def q_dinic_max_flow(spark, sf_dir):
    """Dinic max s-t flow on the deterministic doc-subgraph (nodes < 80,
    capacity = 1 + (src+dst) % 5, s=0, t=79): single row
    (value, source_set_size, phases)."""
    from networkit_spark.operators.dinic import dinic_max_flow

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        res = dinic_max_flow(_dinic_arcs(spark, sf_dir), s=0, t=_DINIC_T)
        ss = res.source_set_df.count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.createDataFrame(
        [(float(res.value), int(ss), int(res.phases))],
        "value double, source_set_size long, phases long",
    )


def _dinic_levels_oracle_sql(rounds: int = 12) -> str:
    parts = [
        f"WITH {EDGES_CTE}",
        f", sub AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges"
        f"  WHERE src < {_DINIC_SUB} AND dst < {_DINIC_SUB})",
        # all capacities are >= 1 > tol, so the flow-0 residual graph the
        # engine BFS walks is exactly the (deduped) directed arc set
        f", d0 AS (SELECT CAST(0 AS BIGINT) AS node, 0 AS dist)",
    ]
    for k in range(1, rounds + 1):
        prev = f"d{k - 1}"
        seen = " UNION ALL ".join(f"SELECT node FROM d{j}" for j in range(k))
        parts.append(
            f", d{k} AS MATERIALIZED ("
            f" SELECT e.dst AS node, {k} AS dist FROM sub e"
            f" JOIN {prev} p ON e.src = p.node"
            f" WHERE e.dst NOT IN ({seen}) GROUP BY e.dst)"
        )
    alld = " UNION ALL ".join(f"SELECT * FROM d{j}" for j in range(rounds + 1))
    parts.append(
        f", lv AS (SELECT node, dist FROM ({alld}))"
        f" SELECT node, CAST(dist AS BIGINT) AS level FROM lv"
        f" WHERE dist <= (SELECT dist FROM lv WHERE node = {_DINIC_T})"
    )
    return "\n".join(parts)


@register("dinic_level_graph_0_79", _dinic_levels_oracle_sql())
def q_dinic_level_graph(spark, sf_dir):
    """Engine twin for `dinic_max_flow_0_79`: the phase-1 BFS level table
    (node, level) the Dinic phases are built on — the engine's
    `_residual` + `_bfs_levels` (target-layer truncated) on the same
    subgraph, vs a fully unrolled min-dist BFS SQL replay truncated at
    the target's distance."""
    from networkit_spark.operators.dinic import (
        RELATIVE_TOLERANCE, _bfs_levels, _residual,
    )
    from networkit_spark.operators.flow import _pairs_from_arcs

    arcs = _dinic_arcs(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        pairs = _pairs_from_arcs(arcs).withColumn("flow", F.lit(0.0))
        tol = 5.0 * RELATIVE_TOLERANCE  # max capacity is 5.0
        levels = _bfs_levels(
            _residual(pairs, tol), 0, _DINIC_T, _DINIC_SUB + 2
        ).select("node", F.col("level").cast("long").alias("level"))
        levels = levels.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return levels


# ---------------------------------------------------------------------------
# plot.py chart-series data producers (networkit/plot.py — the data side of
# degreeDistribution / connectedComponentsSizes / coreDecompositionSequence /
# clusteringPerDegree; hopPlot's series is the existing `hop_distribution`).
# Rendering is presentation layer; the SERIES are distributed aggregates
# (networkit_spark/plotdata.py) and each gets its own oracle line.
# ---------------------------------------------------------------------------

from networkit_spark.entry_queries_graph import (  # noqa: E402
    CC_ITERS,
    TRI_CTE,
    _cc_oracle_sql,
    _coreness_oracle_sql,
    q_connected_components,
)


@register(
    "degree_distribution",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT d.doc_id AS node, coalesce(c.d, 0) AS degree
        FROM documents d LEFT JOIN
        (SELECT src, count(*) AS d FROM uedges GROUP BY src) c
        ON d.doc_id = c.src),
hist AS (SELECT degree, count(*) AS c FROM deg GROUP BY degree),
grid AS (SELECT unnest(generate_series(0, (SELECT max(degree) FROM deg))) AS degree)
SELECT g.degree, CAST(coalesce(h.c, 0) AS BIGINT) AS num_nodes
FROM grid g LEFT JOIN hist h ON g.degree = h.degree
""",
)
def q_degree_distribution(spark, sf_dir):
    from networkit_spark.plotdata import degree_distribution

    n = _n_docs(spark, sf_dir)
    return degree_distribution(
        doc_edges_undirected(spark, sf_dir), nodes_range(spark, n)
    )


@register(
    "component_size_distribution",
    _cc_oracle_sql(
        CC_ITERS,
        "SELECT CAST(row_number() OVER (ORDER BY s.size DESC, s.label) AS BIGINT) AS rnk,"
        " s.size FROM (SELECT label, CAST(count(*) AS BIGINT) AS size"
        " FROM {last} GROUP BY label) s",
    ),
)
def q_component_size_distribution(spark, sf_dir):
    from networkit_spark.plotdata import component_size_distribution

    return component_size_distribution(q_connected_components(spark, sf_dir))


@register(
    "core_shell_sizes",
    "SELECT core, CAST(count(*) AS BIGINT) AS size FROM ("
    + _coreness_oracle_sql(8)
    + ") GROUP BY core",
)
def q_core_shell_sizes(spark, sf_dir):
    from networkit_spark.operators.kcore import coreness_fixed
    from networkit_spark.plotdata import core_decomposition_sequence

    n = _n_docs(spark, sf_dir)
    c = coreness_fixed(doc_edges_undirected(spark, sf_dir),
                       nodes_range(spark, n), iterations=8)
    return core_decomposition_sequence(c)


@register(
    "clustering_per_degree",
    f"""
WITH {TRI_CTE},
corners AS (
    SELECT ta AS node FROM tri UNION ALL SELECT tb FROM tri UNION ALL SELECT tc FROM tri
),
tc AS (SELECT node, count(*) AS c FROM corners GROUP BY node),
lccd AS (
    SELECT coalesce(u.d, 0) AS deg,
           CASE WHEN coalesce(u.d, 0) >= 2
                THEN CAST(2.0 AS DOUBLE) * coalesce(t.c, 0) / (u.d * (u.d - 1))
                ELSE CAST(0.0 AS DOUBLE) END AS lcc
    FROM documents d
    LEFT JOIN udeg u ON d.doc_id = u.node
    LEFT JOIN tc t ON d.doc_id = t.node
)
SELECT CAST(deg AS BIGINT) AS deg, round(avg(lcc), 7) AS mean_lcc
FROM lccd GROUP BY deg
""",
)
def q_clustering_per_degree(spark, sf_dir):
    from networkit_spark.plotdata import clustering_per_degree

    n = _n_docs(spark, sf_dir)
    return clustering_per_degree(
        doc_edges_undirected(spark, sf_dir), nodes_range(spark, n)
    )


# ---------------------------------------------------------------------------
# FloydWarshall (distance/FloydWarshall.cpp — negative-weight APSP with
# hop tie-breaks and negative-cycle tagging; operators/floydwarshall.py).
# Gate output maps the reference's -inf pairs to (NULL dist, NULL hops,
# in_neg=1) so both engines hash identically (no IEEE infinities in the
# compare protocol).
# ---------------------------------------------------------------------------

_FW_SUB = 24


def _fw_oracle_sql(n: int = _FW_SUB) -> str:
    parts = [
        f"WITH {EDGES_CTE}",
        f", arcs AS MATERIALIZED (SELECT src, dst,"
        f"   CAST((src * 7 + dst * 3) % 11 - 2 AS DOUBLE) AS w"
        f"  FROM edges WHERE src < {n} AND dst < {n})",
        f", grid AS (SELECT unnest(generate_series(0, {n - 1})) AS node)",
        f", r0 AS (SELECT node AS source, node, CAST(0 AS DOUBLE) AS dist,"
        f"   CAST(0 AS BIGINT) AS hops FROM grid)",
    ]
    for k in range(1, n + 1):
        prev = f"r{k - 1}"
        parts.append(
            f", r{k} AS MATERIALIZED ("
            f" SELECT source, node, dist, hops FROM ("
            f"  SELECT source, node, dist, hops, row_number() OVER ("
            f"    PARTITION BY source, node ORDER BY dist, hops) AS rn"
            f"  FROM (SELECT source, node, dist, hops FROM {prev}"
            f"        UNION ALL"
            f"        SELECT p.source, a.dst AS node, p.dist + a.w AS dist,"
            f"               p.hops + 1 AS hops"
            f"        FROM {prev} p JOIN arcs a ON a.src = p.node)"
            f" ) WHERE rn = 1)"
        )
    last = f"r{n}"
    parts.append(
        f", cyc AS (SELECT node AS w FROM {last} WHERE source = node AND dist < 0)"
        f", rin AS (SELECT DISTINCT r.source AS u, r.node AS w"
        f"          FROM {last} r JOIN cyc c ON r.node = c.w)"
        f", rout AS (SELECT DISTINCT r.source AS w, r.node AS v"
        f"           FROM {last} r JOIN cyc c ON r.source = c.w)"
        f", bad AS (SELECT DISTINCT i.u AS source, o.v AS node"
        f"          FROM rin i JOIN rout o ON i.w = o.w)"
        f" SELECT r.source, r.node AS target,"
        f"   CASE WHEN b.source IS NOT NULL THEN NULL"
        f"        ELSE round(r.dist, 7) END AS dist,"
        f"   CASE WHEN b.source IS NOT NULL THEN NULL ELSE r.hops END AS hops,"
        f"   CAST(CASE WHEN b.source IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)"
        f"     AS in_neg"
        f" FROM {last} r LEFT JOIN bad b"
        f"   ON r.source = b.source AND r.node = b.node"
    )
    return "\n".join(parts)


@register("floyd_warshall_neg", _fw_oracle_sql())
def q_floyd_warshall_neg(spark, sf_dir):
    """Negative-weight APSP on the deterministic doc-subgraph (nodes < 24,
    weight = (src*7 + dst*3) % 11 - 2, so some arcs are negative): per
    reachable pair (source, target, dist, hops, in_neg), where pairs the
    reference marks -inf (through a negative cycle) carry NULLs + in_neg=1.
    The oracle is a fully unrolled lexicographic (dist, hops) min-plus
    relaxation + the tagNegativeCycles replay."""
    from networkit_spark.operators.floydwarshall import floyd_warshall

    e = (
        doc_edges(spark, sf_dir)
        .filter((F.col("src") < _FW_SUB) & (F.col("dst") < _FW_SUB))
        .select(
            "src", "dst",
            ((F.col("src") * 7 + F.col("dst") * 3) % 11 - 2)
            .cast("double").alias("weight"),
        )
        .coalesce(2)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        res = floyd_warshall(e, nodes_range(spark, _FW_SUB),
                             max_rounds=_FW_SUB)
        neg = F.col("dist") == float("-inf")
        out = res.distances.select(
            "source", "target",
            F.when(neg, F.lit(None).cast("double"))
            .otherwise(F.round("dist", 7)).alias("dist"),
            "hops",
            neg.cast("long").alias("in_neg"),
        ).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


@register(
    "fractional_degree_ranks",
    f"""
WITH {EDGES_CTE},
{_deg_cte('out')}
SELECT node,
       CAST(rank() OVER (ORDER BY sc)
            + (count(*) OVER (PARTITION BY sc) - 1) / 2.0 AS DOUBLE) AS frank
FROM outdeg
""",
)
def q_fractional_degree_ranks(spark, sf_dir):
    """helpers.ranked twin (helpers.pyx:19): fractional average-tie 1-based
    ranks of the out-degree distribution — min-rank via the distributed
    range-sort plan + one tie-count join, no global window."""
    from networkit_spark.stats import fractional_ranks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("node")
    )
    deg = doc_edges(spark, sf_dir).groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("cnt")
    )
    x = docs.join(deg, "node", "left").select(
        "node", F.coalesce(F.col("cnt"), F.lit(0)).cast("double").alias("sc")
    )
    return fractional_ranks(x, "node", "sc")
