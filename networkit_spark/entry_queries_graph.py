"""Graph-kernel query registrations: connected components, PLP, triangles,
clustering coefficients, modularity. Each pairs the Spark operator from
``networkit_spark.operators.*`` with an unrolled ANSI-SQL oracle over the
same deterministic documents-derived graph (``testgraph.py``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.graph import nodes_range
from networkit_spark.operators.community import modularity
from networkit_spark.operators.components import components_fixed
from networkit_spark.operators.plp import plp_fixed
from networkit_spark.operators.triangles import (
    global_clustering_coefficient,
    local_clustering_coefficient,
    total_triangles,
    triangle_counts,
    triangle_edge_score,
)
from networkit_spark.testgraph import EDGES_CTE, UEDGES_CTE, doc_edges_undirected

CC_ITERS = 15
PLP_ITERS = 5


def _n_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


# ---------------------------------------------------------------------------
# Connected components (SURVEY §2.4)
# ---------------------------------------------------------------------------

def _cc_oracle_sql(iterations: int, final: str) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)",
    ]
    for k in range(1, iterations + 1):
        prev = f"l{k - 1}"
        parts.append(
            f", l{k} AS MATERIALIZED ("
            f" SELECT n.node, least(n.label, coalesce(t.ml, n.label)) AS label"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT e.dst AS node, min(p.label) AS ml"
            f"   FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.node)"
        )
    parts.append(final.format(last=f"l{iterations}"))
    return "\n".join(parts)


@register(
    "connected_components",
    _cc_oracle_sql(CC_ITERS, "SELECT node, label FROM {last}"),
)
def q_connected_components(spark, sf_dir):
    """Hash-min CC, labels = min node id per component (fixed 15 rounds —
    beyond convergence for this graph; pytest asserts equality with the
    convergence-driven engine)."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return components_fixed(e, nodes_range(spark, n), iterations=CC_ITERS)


@register(
    "component_sizes",
    _cc_oracle_sql(
        CC_ITERS,
        "SELECT label, CAST(count(*) AS BIGINT) AS size FROM {last} GROUP BY label",
    ),
)
def q_component_sizes(spark, sf_dir):
    return q_connected_components(spark, sf_dir).groupBy("label").agg(
        F.count("*").alias("size")
    )


# ---------------------------------------------------------------------------
# PLP label propagation (SURVEY §2.5)
# ---------------------------------------------------------------------------

def _plp_oracle_sql(iterations: int, final: str) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", p0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)",
    ]
    for k in range(1, iterations + 1):
        prev = f"p{k - 1}"
        parts.append(
            f", p{k} AS MATERIALIZED ("
            f" SELECT n.node, coalesce(t.nlabel, n.label) AS label"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT node, nlabel FROM ("
            f"     SELECT e.dst AS node, p.label AS nlabel,"
            f"            row_number() OVER (PARTITION BY e.dst"
            f"              ORDER BY sum(e.weight) DESC, p.label ASC) AS rk"
            f"     FROM uedges e JOIN {prev} p ON e.src = p.node"
            f"     GROUP BY e.dst, p.label"
            f"   ) WHERE rk = 1"
            f" ) t ON n.node = t.node)"
        )
    parts.append(final.format(last=f"p{iterations}"))
    return "\n".join(parts)


@register("plp_fixed5", _plp_oracle_sql(PLP_ITERS, "SELECT node, label FROM {last}"))
def q_plp_fixed5(spark, sf_dir):
    """Synchronous PLP, 5 supersteps, argmax weight tie->smallest label."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return plp_fixed(e, nodes_range(spark, n), iterations=PLP_ITERS)


@register(
    "plp_community_sizes",
    _plp_oracle_sql(
        PLP_ITERS,
        "SELECT label, CAST(count(*) AS BIGINT) AS size FROM {last} GROUP BY label",
    ),
)
def q_plp_community_sizes(spark, sf_dir):
    return q_plp_fixed5(spark, sf_dir).groupBy("label").agg(F.count("*").alias("size"))


# ---------------------------------------------------------------------------
# Triangles / clustering coefficients (SURVEY §2.6)
# ---------------------------------------------------------------------------

TRI_CTE = (
    UEDGES_CTE
    + """,
udeg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
eo AS (
    SELECT e.src, e.dst, d2.d AS degdst
    FROM uedges e
    JOIN udeg d1 ON e.src = d1.node
    JOIN udeg d2 ON e.dst = d2.node
    WHERE d1.d < d2.d OR (d1.d = d2.d AND e.src < e.dst)
),
tri AS (
    SELECT a.src AS ta, a.dst AS tb, b.dst AS tc
    FROM eo a JOIN eo b ON a.src = b.src
    WHERE (a.degdst < b.degdst OR (a.degdst = b.degdst AND a.dst < b.dst))
      AND EXISTS (SELECT 1 FROM eo x WHERE x.src = a.dst AND x.dst = b.dst)
)
"""
)


@register(
    "triangle_total",
    f"WITH {TRI_CTE} SELECT CAST(count(*) AS BIGINT) AS triangles FROM tri",
)
def q_triangle_total(spark, sf_dir):
    e = doc_edges_undirected(spark, sf_dir)
    t = total_triangles(e)
    return e.sparkSession.createDataFrame([(t,)], "triangles long")


@register(
    "triangle_per_node",
    f"""
WITH {TRI_CTE},
corners AS (
    SELECT ta AS node FROM tri UNION ALL SELECT tb FROM tri UNION ALL SELECT tc FROM tri
)
SELECT d.doc_id AS node, CAST(coalesce(t.c, 0) AS BIGINT) AS triangles
FROM documents d
LEFT JOIN (SELECT node, count(*) AS c FROM corners GROUP BY node) t ON d.doc_id = t.node
""",
)
def q_triangle_per_node(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return triangle_counts(e, nodes_range(spark, n))


@register(
    "local_clustering_coefficient",
    f"""
WITH {TRI_CTE},
corners AS (
    SELECT ta AS node FROM tri UNION ALL SELECT tb FROM tri UNION ALL SELECT tc FROM tri
),
tc AS (SELECT node, count(*) AS c FROM corners GROUP BY node)
SELECT d.doc_id AS node,
       round(CASE WHEN coalesce(u.d, 0) >= 2
             THEN CAST(2.0 AS DOUBLE) * coalesce(t.c, 0) / (u.d * (u.d - 1))
             ELSE CAST(0.0 AS DOUBLE) END, 7) AS lcc
FROM documents d
LEFT JOIN udeg u ON d.doc_id = u.node
LEFT JOIN tc t ON d.doc_id = t.node
""",
)
def q_lcc(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = local_clustering_coefficient(e, nodes_range(spark, n))
    return out.select("node", F.round("lcc", 7).alias("lcc"))


@register(
    "global_clustering_coefficient",
    f"""
WITH {TRI_CTE},
w AS (SELECT CAST(sum(d * (d - 1) / 2) AS DOUBLE) AS wedges FROM udeg),
t AS (SELECT count(*) AS n_tri FROM tri)
SELECT round(CASE WHEN wedges > 0 THEN 3.0 * n_tri / wedges ELSE 0.0 END, 7) AS global_cc
FROM w CROSS JOIN t
""",
)
def q_global_cc(spark, sf_dir):
    e = doc_edges_undirected(spark, sf_dir)
    v = global_clustering_coefficient(e)
    return e.sparkSession.createDataFrame([(round(v, 7),)], "global_cc double")


@register(
    "triangle_edge_score",
    f"""
WITH {TRI_CTE},
pairs AS (
    SELECT least(ta, tb) AS u, greatest(ta, tb) AS v FROM tri
    UNION ALL SELECT least(ta, tc), greatest(ta, tc) FROM tri
    UNION ALL SELECT least(tb, tc), greatest(tb, tc) FROM tri
),
cnt AS (SELECT u, v, count(*) AS c FROM pairs GROUP BY u, v)
SELECT e.src, e.dst, CAST(coalesce(cnt.c, 0) AS BIGINT) AS score
FROM (SELECT src, dst FROM uedges WHERE src < dst) e
LEFT JOIN cnt ON e.src = cnt.u AND e.dst = cnt.v
""",
)
def q_triangle_edge_score(spark, sf_dir):
    e = doc_edges_undirected(spark, sf_dir)
    return triangle_edge_score(e)


# ---------------------------------------------------------------------------
# Modularity of the PLP partition (SURVEY §2.7 quality measures)
# ---------------------------------------------------------------------------

@register(
    "modularity_plp",
    _plp_oracle_sql(
        PLP_ITERS,
        """
, m AS (SELECT CAST(sum(weight) AS DOUBLE) / 2 AS m FROM uedges)
, wdeg AS (SELECT src AS node, CAST(sum(weight) AS DOUBLE) AS wdeg FROM uedges GROUP BY src)
, intra AS (
    SELECT CAST(coalesce(sum(e.weight), 0) AS DOUBLE) / 2 AS iw
    FROM uedges e
    JOIN {last} a ON e.src = a.node
    JOIN {last} b ON e.dst = b.node
    WHERE a.label = b.label
)
, vols AS (
    SELECT l.label, CAST(sum(coalesce(w.wdeg, 0)) AS DOUBLE) AS vol
    FROM {last} l LEFT JOIN wdeg w ON l.node = w.node GROUP BY l.label
)
SELECT round(intra.iw / m.m - (SELECT sum(vol * vol) FROM vols) / (4 * m.m * m.m), 7) AS q
FROM intra CROSS JOIN m
""",
    ),
)
def q_modularity_plp(spark, sf_dir):
    """Modularity.cpp:23-70 semantics over the PLP(5) partition."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    labels = plp_fixed(e, nodes_range(spark, n), iterations=PLP_ITERS)
    q = modularity(e, labels)
    return e.sparkSession.createDataFrame([(round(q, 7),)], "q double")


# ---------------------------------------------------------------------------
# Centrality family (SURVEY §2.7): degree / eigenvector / Katz
# ---------------------------------------------------------------------------

from networkit_spark.operators.centrality import (  # noqa: E402
    degree_centrality,
    eigenvector_fixed,
    katz_fixed,
)
from networkit_spark.operators.distance import bfs_fixed  # noqa: E402
from networkit_spark.operators.kcore import coreness_fixed, k_core  # noqa: E402
from networkit_spark.operators.linkprediction import link_prediction_scores  # noqa: E402


@register(
    "degree_centrality_normalized",
    f"""
WITH {UEDGES_CTE},
nn2 AS (SELECT count(*) AS n FROM documents),
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src)
SELECT dd.doc_id AS node,
       round(coalesce(deg.d, 0)::DOUBLE / (nn2.n - 1), 7) AS score
FROM documents dd CROSS JOIN nn2 LEFT JOIN deg ON dd.doc_id = deg.node
""",
)
def q_degree_centrality_normalized(spark, sf_dir):
    """DegreeCentrality.cpp:16-56 — normalized by theoretical max n-1."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = degree_centrality(e, nodes_range(spark, n), normalized=True)
    return out.select("node", F.round("score", 7).alias("score"))


def _eigenvector_oracle_sql(iterations: int) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", nodes AS (SELECT doc_id AS node FROM documents)",
        ", s0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS score FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        prev = f"s{k - 1}"
        parts.append(
            f", r{k} AS MATERIALIZED ("
            f" SELECT n.node, coalesce(t.m, CAST(0.0 AS DOUBLE)) AS raw"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.dst, sum(e.weight * p.score) AS m"
            f"   FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.dst)"
            f", s{k} AS MATERIALIZED ("
            f" SELECT node, raw / (SELECT sqrt(sum(raw*raw)) FROM r{k}) AS score FROM r{k})"
        )
    parts.append(f"SELECT node, round(score, 7) AS score FROM s{iterations}")
    return "\n".join(parts)


@register("eigenvector_fixed10", _eigenvector_oracle_sql(10))
def q_eigenvector_fixed10(spark, sf_dir):
    """EigenvectorCentrality.cpp:18-56 — power iteration, per-step L2 norm."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = eigenvector_fixed(e, nodes_range(spark, n), iterations=10)
    return out.select("node", F.round("score", 7).alias("score"))


KATZ_ALPHA = 0.05
KATZ_BETA = 1.0


def _katz_oracle_sql(iterations: int) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", nodes AS (SELECT doc_id AS node FROM documents)",
        ", s0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS score FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        prev = f"s{k - 1}"
        parts.append(
            f", s{k} AS MATERIALIZED ("
            f" SELECT n.node, coalesce(t.m, CAST(0.0 AS DOUBLE)) + {KATZ_BETA} AS score"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.dst, sum(e.weight * {KATZ_ALPHA} * (1.0 + p.score)) AS m"
            f"   FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.dst)"
        )
    last = f"s{iterations}"
    parts.append(
        f"SELECT node, round(score / (SELECT sqrt(sum(score*score)) FROM {last}), 7) AS score"
        f" FROM {last}"
    )
    return "\n".join(parts)


@register("katz_fixed10", _katz_oracle_sql(10))
def q_katz_fixed10(spark, sf_dir):
    """KatzCentrality.cpp:26-77 — beta + alpha*sum_in w*(1+score); end-normalized."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = katz_fixed(e, nodes_range(spark, n), iterations=10, alpha=KATZ_ALPHA, beta=KATZ_BETA)
    return out.select("node", F.round("score", 7).alias("score"))


# ---------------------------------------------------------------------------
# k-core / coreness (SURVEY §2.7 CoreDecomposition)
# ---------------------------------------------------------------------------

def _coreness_oracle_sql(iterations: int) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", nodes AS (SELECT doc_id AS node FROM documents)",
        ", c0 AS (SELECT n.node, coalesce(d.d, 0) AS c FROM nodes n LEFT JOIN"
        "   (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src) d ON n.node = d.node)",
    ]
    for k in range(1, iterations + 1):
        prev = f"c{k - 1}"
        parts.append(
            f", c{k} AS MATERIALIZED ("
            f" SELECT n.node, coalesce(t.h, 0) AS c"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT node, max(rk) AS h FROM ("
            f"     SELECT e.dst AS node, p.c AS cv,"
            f"            row_number() OVER (PARTITION BY e.dst ORDER BY p.c DESC) AS rk"
            f"     FROM uedges e JOIN {prev} p ON e.src = p.node"
            f"   ) WHERE cv >= rk GROUP BY node"
            f" ) t ON n.node = t.node)"
        )
    parts.append(f"SELECT node, CAST(c AS BIGINT) AS core FROM c{iterations}")
    return "\n".join(parts)


@register("coreness_fixed8", _coreness_oracle_sql(8))
def q_coreness_fixed8(spark, sf_dir):
    """CoreDecomposition analog via h-index iteration (8 rounds; pytest
    asserts the fixed point equals iterated peeling)."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return coreness_fixed(e, nodes_range(spark, n), iterations=8)


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    parts = [f"WITH {UEDGES_CTE}", ", e0 AS (SELECT src, dst FROM uedges)"]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        parts.append(
            f", k{r} AS MATERIALIZED (SELECT src AS node FROM {prev} GROUP BY src HAVING count(*) >= {k})"
            f", e{r} AS MATERIALIZED ("
            f" SELECT e.src, e.dst FROM {prev} e"
            f" JOIN k{r} a ON e.src = a.node JOIN k{r} b ON e.dst = b.node)"
        )
    parts.append(f"SELECT src, dst FROM e{rounds}")
    return "\n".join(parts)


@register("kcore3_edges", _kcore_oracle_sql(3, 8))
def q_kcore3_edges(spark, sf_dir):
    e = doc_edges_undirected(spark, sf_dir)
    return k_core(e, 3, max_rounds=8).select("src", "dst")


# ---------------------------------------------------------------------------
# BFS (SURVEY §2.7 distance)
# ---------------------------------------------------------------------------

def _bfs_oracle_sql(source: int, rounds: int) -> str:
    big = 1 << 40
    parts = [
        f"WITH {UEDGES_CTE}",
        f", d0 AS (SELECT doc_id AS node, CASE WHEN doc_id = {source} THEN 0 ELSE {big} END AS dist FROM documents)",
    ]
    for k in range(1, rounds + 1):
        prev = f"d{k - 1}"
        parts.append(
            f", d{k} AS MATERIALIZED ("
            f" SELECT n.node, least(n.dist, coalesce(t.nd, n.dist)) AS dist"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT e.dst AS node, min(p.dist + 1) AS nd"
            f"   FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.node)"
        )
    parts.append(
        f"SELECT node, CAST(CASE WHEN dist >= {big} THEN -1 ELSE dist END AS BIGINT) AS dist"
        f" FROM d{rounds}"
    )
    return "\n".join(parts)


@register("bfs_from0_fixed10", _bfs_oracle_sql(0, 10))
def q_bfs_from0_fixed10(spark, sf_dir):
    """BFS.cpp level-synchronous semantics, 10 fixed rounds, unreached=-1."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return bfs_fixed(e, nodes_range(spark, n), source=0, rounds=10)


# ---------------------------------------------------------------------------
# Link prediction (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "link_prediction",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS deg FROM uedges GROUP BY src),
wp AS (
  SELECT a.dst AS u, b.dst AS v,
         count(*) AS cn,
         sum(1.0 / ln(d.deg)) AS aa,
         sum(1.0 / d.deg) AS ra
  FROM uedges a
  JOIN uedges b ON a.src = b.src AND a.dst < b.dst
  JOIN deg d ON a.src = d.node
  GROUP BY 1, 2
)
SELECT wp.u, wp.v, CAST(wp.cn AS BIGINT) AS cn,
       round(wp.cn::DOUBLE / (du.deg + dv.deg - wp.cn), 7) AS jaccard,
       round(wp.aa, 7) AS aa, round(wp.ra, 7) AS ra,
       CAST(du.deg * dv.deg AS BIGINT) AS pa
FROM wp JOIN deg du ON wp.u = du.node JOIN deg dv ON wp.v = dv.node
""",
)
def q_link_prediction(spark, sf_dir):
    """CN/Jaccard/AA/RA/PA over all wedge-connected pairs
    (linkprediction.pyx formulas; one fused wedge join)."""
    e = doc_edges_undirected(spark, sf_dir)
    out = link_prediction_scores(e)
    return out.select(
        "u", "v", "cn",
        F.round("jaccard", 7).alias("jaccard"),
        F.round("aa", 7).alias("aa"),
        F.round("ra", 7).alias("ra"),
        "pa",
    )


# ---------------------------------------------------------------------------
# Graph transforms (SURVEY §2.2 GraphTools) + assortativity + topo levels
# ---------------------------------------------------------------------------

from networkit_spark.graph import compact_node_ids, subgraph_from_nodes, transpose  # noqa: E402
from networkit_spark.operators.correlation import degree_assortativity  # noqa: E402
from networkit_spark.operators.plm import PLM  # noqa: E402
from networkit_spark.operators.scc import strongly_connected_components  # noqa: E402
from networkit_spark.operators.sparsification import (  # noqa: E402
    global_threshold_filter,
    local_degree_score,
)
from networkit_spark.testgraph import doc_edges  # noqa: E402


@register(
    "transpose_edges",
    f"WITH {EDGES_CTE} SELECT dst AS src, src AS dst, CAST(weight AS DOUBLE) AS weight FROM edges"
    if False else
    f"WITH {UEDGES_CTE} SELECT e.dst AS src, e.src AS dst, CAST(e.weight AS DOUBLE) AS weight FROM edges e",
)
def q_transpose_edges(spark, sf_dir):
    """GraphTools.cpp:344 transpose."""
    return transpose(doc_edges(spark, sf_dir))


@register(
    "subgraph_nodes_lt100",
    f"""
WITH {UEDGES_CTE}
SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) AS weight
FROM edges e WHERE e.src < 100 AND e.dst < 100
""",
)
def q_subgraph_nodes_lt100(spark, sf_dir):
    """GraphTools.cpp:260 subgraphFromNodes — double semi-join."""
    e = doc_edges(spark, sf_dir)
    keep = spark.range(100).select(F.col("id").cast("long").alias("id"))
    return subgraph_from_nodes(e, keep)


@register(
    "compact_subgraph_ids",
    f"""
WITH {UEDGES_CTE},
sub AS (SELECT src, dst, weight FROM edges WHERE src % 3 = 0 AND dst % 3 = 0),
ids AS (SELECT DISTINCT src AS id FROM sub UNION SELECT DISTINCT dst FROM sub),
dict AS (SELECT id, dense_rank() OVER (ORDER BY id) - 1 AS nid FROM ids)
SELECT a.nid AS src, b.nid AS dst, CAST(s.weight AS DOUBLE) AS weight
FROM sub s JOIN dict a ON s.src = a.id JOIN dict b ON s.dst = b.id
""",
)
def q_compact_subgraph_ids(spark, sf_dir):
    """getCompactedGraph/getContinuousNodeIds (GraphTools.cpp:424-439)."""
    e = doc_edges(spark, sf_dir).filter((F.col("src") % 3 == 0) & (F.col("dst") % 3 == 0))
    _, out = compact_node_ids(e)
    return out


@register(
    "degree_assortativity",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src)
SELECT round(corr(ds.d, dd.d), 7) AS r
FROM uedges e JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
""",
)
def q_degree_assortativity(spark, sf_dir):
    """Assortativity.cpp — Pearson correlation of endpoint degrees."""
    e = doc_edges_undirected(spark, sf_dir)
    r = degree_assortativity(e)
    return spark.createDataFrame([(round(r, 7),)], "r double")


def _topo_levels_sql(rounds: int) -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        ", dag AS (SELECT src, dst FROM edges WHERE src < dst)",
        ", t0 AS (SELECT doc_id AS node, 0 AS lvl FROM documents)",
    ]
    for k in range(1, rounds + 1):
        prev = f"t{k - 1}"
        parts.append(
            f", t{k} AS MATERIALIZED ("
            f" SELECT n.node, greatest(n.lvl, coalesce(t.ml, n.lvl)) AS lvl"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT e.dst AS node, max(p.lvl + 1) AS ml"
            f"   FROM dag e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.node)"
        )
    parts.append(f"SELECT node, CAST(lvl AS BIGINT) AS lvl FROM t{rounds}")
    return "\n".join(parts)


@register("topological_levels", _topo_levels_sql(12))
def q_topological_levels(spark, sf_dir):
    """TopologicalSort analog, made deterministic: longest-path level per
    node on the acyclic src<dst orientation (a valid topological key —
    sorting by (lvl, node) is a topological order)."""
    n = _n_docs(spark, sf_dir)
    dag = doc_edges(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    lvl = nodes_range(spark, n).select(F.col("id").alias("node"), F.lit(0).alias("lvl"))
    for _ in range(12):
        cand = (
            dag.join(lvl.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.max(F.col("lvl") + 1).alias("ml"))
        )
        lvl = (
            lvl.join(cand, "node", "left")
            .select(
                "node",
                F.greatest(F.col("lvl"), F.coalesce(F.col("ml"), F.col("lvl"))).alias("lvl"),
            )
            .localCheckpoint(eager=True)
        )
    return lvl.select("node", F.col("lvl").cast("long").alias("lvl"))


@register(
    "local_degree_sparsify",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
ranked AS (
  SELECT e.src, e.dst, ds.d AS ds,
         row_number() OVER (PARTITION BY e.src ORDER BY dd.d DESC, e.dst ASC) AS rk
  FROM uedges e JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
),
dscore AS (
  SELECT src, dst,
         CASE WHEN ds > 1 THEN 1.0 - ln(rk) / ln(ds) ELSE 1.0 END AS s
  FROM ranked
),
escore AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst, max(s) AS score
  FROM dscore GROUP BY 1, 2
),
keep AS (SELECT src, dst FROM escore WHERE score >= 0.5)
SELECT u.src, u.dst, CAST(u.weight AS DOUBLE) AS weight
FROM uedges u
JOIN keep k ON least(u.src, u.dst) = k.src AND greatest(u.src, u.dst) = k.dst
""",
)
def q_local_degree_sparsify(spark, sf_dir):
    """LocalDegreeScore + GlobalThresholdFilter(0.5) backbone."""
    e = doc_edges_undirected(spark, sf_dir)
    scores = local_degree_score(e)
    return global_threshold_filter(e, scores, 0.5)


@register("plm_communities")  # multi-level heuristic -> rows-only check
def q_plm_communities(spark, sf_dir):
    """Capped PLM (2 levels, 6 sweeps each) — representative gate variant;
    full-depth PLM is exercised by pytest on planted-community fixtures."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return PLM(max_sweeps_per_level=6, max_levels=2).run(e, nodes_range(spark, n)).get_partition()


PLM_SWEEPS = 2


def _plm_oracle_sql(iterations: int) -> str:
    """Unrolled synchronous Louvain move sweeps (``plm_fixed_sweeps``
    formulas, ``PLM.cpp:84+``): per sweep, community volumes + per-node
    neighbor-community weights, gain ``w_uc - wdeg*(vol - [c=cur]*wdeg)/2m``
    rounded to 9 decimals in both engines, stay option with w_uc = 0,
    tie-break (score desc, prefer current, smallest c), node%2 parity
    staging. Output labels normalized to min member node id."""
    parts = [
        f"WITH {UEDGES_CTE}",
        ", tv AS (SELECT sum(weight) AS m2 FROM uedges)",
        ", wd AS (SELECT d.doc_id AS node, coalesce(w.wdeg, 0) AS wdeg"
        "  FROM documents d LEFT JOIN ("
        "    SELECT src AS node, sum(weight) AS wdeg FROM uedges GROUP BY src"
        "  ) w ON d.doc_id = w.node)",
        ", pm0 AS (SELECT doc_id AS node, doc_id AS comm FROM documents)",
    ]
    for k in range(1, iterations + 1):
        prev = f"pm{k - 1}"
        parity = (k - 1) % 2
        parts.append(
            f""", vol{k} AS (
  SELECT m.comm AS c, sum(d.wdeg) AS vol
  FROM {prev} m JOIN wd d ON m.node = d.node GROUP BY m.comm
), wuc{k} AS (
  SELECT e.dst AS node, a.comm AS c, sum(e.weight) AS wuc
  FROM uedges e JOIN {prev} a ON e.src = a.node GROUP BY e.dst, a.comm
), cand{k} AS (
  SELECT w.node, w.c, m.comm AS cur,
         round(w.wuc - d.wdeg * (v.vol - CASE WHEN w.c = m.comm THEN d.wdeg ELSE 0 END) / t.m2, 9) AS score
  FROM wuc{k} w JOIN {prev} m ON w.node = m.node
  JOIN wd d ON w.node = d.node JOIN vol{k} v ON v.c = w.c CROSS JOIN tv t
), stay{k} AS (
  SELECT m.node, m.comm AS c, m.comm AS cur,
         round(-d.wdeg * (v.vol - d.wdeg) / t.m2, 9) AS score
  FROM {prev} m JOIN wd d ON m.node = d.node JOIN vol{k} v ON v.c = m.comm CROSS JOIN tv t
), bst{k} AS (
  SELECT node, c FROM (
    SELECT node, c,
           row_number() OVER (PARTITION BY node ORDER BY score DESC, (c = cur) DESC, c ASC) AS rk
    FROM (SELECT * FROM cand{k} UNION ALL SELECT * FROM stay{k})) WHERE rk = 1
), pm{k} AS MATERIALIZED (
  SELECT m.node, CASE WHEN (m.node % 2) = {parity} THEN b.c ELSE m.comm END AS comm
  FROM {prev} m JOIN bst{k} b ON m.node = b.node
)"""
        )
    parts.append(
        f"""SELECT m.node, mn.label FROM pm{iterations} m
JOIN (SELECT comm, min(node) AS label FROM pm{iterations} GROUP BY comm) mn
  ON m.comm = mn.comm"""
    )
    return "\n".join(parts)


@register("plm_fixed2", _plm_oracle_sql(PLM_SWEEPS))
def q_plm_fixed2(spark, sf_dir):
    """Fixed-2-sweep synchronous Louvain move phase (oracle-portable twin of
    the PLM move phase, ``PLM.cpp:84+``) — the SQL-checkable counterpart to
    the rows-only ``plm_communities`` multi-level heuristic."""
    from networkit_spark.operators.plm import plm_fixed_sweeps

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return plm_fixed_sweeps(e, nodes_range(spark, n), iterations=PLM_SWEEPS)


def _scc_oracle_sql(steps: int = 20) -> str:
    """SCC labels via transitive closure: label(u) = min{v : u->*v and v->*u}.

    Linear closure expansion (r_{k+1} = r_k ∪ r_k∘edges, ``steps`` >= the
    directed diameter of the gate graph) — the SQL dual of the engine's
    FB-coloring result, which also labels each SCC by its min member id.
    """
    from networkit_spark.testgraph import EDGES_CTE

    parts = [
        f"WITH {EDGES_CTE}",
        """, r0 AS MATERIALIZED (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION SELECT src, dst FROM edges)""",
    ]
    for k in range(1, steps + 1):
        prev = f"r{k - 1}"
        parts.append(
            f", r{k} AS MATERIALIZED ("
            f" SELECT DISTINCT src, dst FROM ("
            f"   SELECT src, dst FROM {prev}"
            f"   UNION ALL"
            f"   SELECT r.src, e.dst FROM {prev} r JOIN edges e ON e.src = r.dst))"
        )
    parts.append(
        f"SELECT a.src AS node, min(a.dst) AS label "
        f"FROM r{steps} a JOIN r{steps} b ON a.src = b.dst AND a.dst = b.src "
        f"GROUP BY a.src"
    )
    return "\n".join(parts)


@register("scc_labels", _scc_oracle_sql())
def q_scc_labels(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    e = doc_edges(spark, sf_dir)
    return strongly_connected_components(e, nodes_range(spark, n))


# ---------------------------------------------------------------------------
# Closeness / betweenness / matching / walks (SURVEY §2.7 remainder)
# ---------------------------------------------------------------------------

from networkit_spark.operators.betweenness import betweenness  # noqa: E402
from networkit_spark.operators.closeness import closeness  # noqa: E402
from networkit_spark.operators.matching import local_max_matching  # noqa: E402
from networkit_spark.operators.walks import random_walks  # noqa: E402


def _msbfs_oracle_sql(rounds: int, final: str) -> str:
    """All-sources fixed-round BFS state (source, node, dist) with sentinel."""
    big = 1 << 40
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", d0 AS (
  SELECT s.doc_id AS source, v.doc_id AS node,
         CASE WHEN s.doc_id = v.doc_id THEN 0 ELSE {big} END AS dist
  FROM documents s CROSS JOIN documents v)""",
    ]
    for k in range(1, rounds + 1):
        prev = f"d{k - 1}"
        parts.append(
            f", d{k} AS MATERIALIZED ("
            f" SELECT n.source, n.node, least(n.dist, coalesce(t.nd, n.dist)) AS dist"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT p.source, e.dst AS node, min(p.dist + 1) AS nd"
            f"   FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY p.source, e.dst"
            f" ) t ON n.source = t.source AND n.node = t.node)"
        )
    parts.append(final.format(last=f"d{rounds}", big=big))
    return "\n".join(parts)


@register(
    "closeness_fixed8",
    _msbfs_oracle_sql(
        8,
        """
SELECT node, round(CASE WHEN sum_d > 0 THEN r::DOUBLE / sum_d ELSE 0.0 END, 7) AS score
FROM (
  SELECT node, sum(dist) AS sum_d, count(*) AS r
  FROM {last} WHERE dist > 0 AND dist < {big} GROUP BY node
)
""",
    ),
)
def q_closeness_fixed8(spark, sf_dir):
    """Closeness.cpp GENERALIZED form over an 8-round multi-source BFS
    (rounds >= diameter on this graph — pytest asserts convergence)."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = closeness(e, nodes_range(spark, n))
    return out.select("node", F.round("score", 7).alias("score"))


@register(
    "harmonic_fixed8",
    _msbfs_oracle_sql(
        8,
        """
SELECT node, round(coalesce(s, 0.0), 7) AS score
FROM (SELECT doc_id AS node FROM documents) d
LEFT JOIN (
  SELECT node, sum(1.0 / dist) AS s
  FROM {last} WHERE dist > 0 AND dist < {big} GROUP BY node
) t USING (node)
""",
    ),
)
def q_harmonic_fixed8(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = closeness(e, nodes_range(spark, n), harmonic=True)
    return out.select("node", F.round("score", 7).alias("score"))


def _betweenness_oracle_sql(rounds: int = 8, srcs_sql: str | None = None) -> str:
    """Brandes unrolled: level-synchronous forward BFS with path counts
    sigma from the fixed source set (default: the 10 doc_id%50==0 pivots;
    ``srcs_sql`` overrides with any SELECT yielding one column ``s``), then
    backward dependency accumulation level by level (``delta(u@l) =
    sum_{w@l+1 adj} sigma_u/sigma_w * (1+delta_w)``), scale n/k
    (EstimateBetweenness semantics)."""
    srcs = srcs_sql or "SELECT doc_id AS s FROM documents WHERE doc_id % 50 = 0"
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", srcs AS ({srcs}),
b0 AS (SELECT s AS source, s AS node, 0 AS dist, CAST(1.0 AS DOUBLE) AS sigma FROM srcs)""",
    ]
    for k in range(1, rounds + 1):
        prev = f"b{k - 1}"
        parts.append(
            f""", b{k} AS MATERIALIZED (
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
        f", del{rounds} AS MATERIALIZED (SELECT source, node, dist, sigma, CAST(0.0 AS DOUBLE) AS delta FROM b{rounds})"
    )
    for level in range(rounds - 1, -1, -1):
        prev = f"del{level + 1}"
        parts.append(
            f""", del{level} AS MATERIALIZED (
  SELECT t.source, t.node, t.dist, t.sigma,
         CASE WHEN t.dist = {level} THEN coalesce(c.add_d, 0.0) ELSE t.delta END AS delta
  FROM {prev} t LEFT JOIN (
    SELECT w.source, e.src AS node, sum(v.sigma / w.sigma * (1.0 + w.delta)) AS add_d
    FROM uedges e
    JOIN {prev} w ON w.node = e.dst AND w.dist = {level + 1}
    JOIN {prev} v ON v.source = w.source AND v.node = e.src AND v.dist = {level}
    GROUP BY w.source, e.src
  ) c ON t.source = c.source AND t.node = c.node)"""
        )
    parts.append(
        f"""SELECT d.doc_id AS node,
       round((SELECT count(*) FROM documents)::DOUBLE / (SELECT count(*) FROM srcs)
             * coalesce(t.sc, 0.0), 6) AS score
FROM documents d LEFT JOIN (
  SELECT node, sum(delta) AS sc FROM del0 WHERE node <> source GROUP BY node
) t ON d.doc_id = t.node"""
    )
    return "\n".join(parts)


@register("betweenness_sampled", _betweenness_oracle_sql(8))
def q_betweenness_sampled(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    nodes = nodes_range(spark, n)
    srcs = nodes.filter(F.col("id") % 50 == 0)  # 10 deterministic sources
    out = betweenness(e, nodes, sources=srcs)
    return out.select("node", F.round("score", 6).alias("score"))


@register("kadabra_betweenness")  # adaptive sampling -> rows-only check
def q_kadabra_betweenness(spark, sf_dir):
    """Absolute-mode KADABRA (KadabraBetweenness.cpp) — the adaptive
    stopping rule makes the sample count data-dependent, so like the other
    genuinely non-SQL iterative queries this is rows-only in the gate;
    accuracy is pinned by tests/test_kadabra.py against the reference's own
    looptest1 golden scores."""
    from networkit_spark.operators.kadabra import kadabra_betweenness

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = kadabra_betweenness(
        e, nodes_range(spark, n), err=0.2, delta=0.2, seed=42
    )
    return out.select("node", F.round("score", 6).alias("score"))


def _matching_oracle_sql(rounds: int = 6) -> str:
    """Fixed-round local-max handshake unrolled: per round, every node
    points at its heaviest neighbor (ties -> smallest id); mutual pointers
    match; matched nodes' edges drop."""
    parts = [f"WITH {UEDGES_CTE}", ", live0 AS (SELECT src, dst, weight FROM uedges)"]
    for r in range(rounds):
        parts.append(
            f""", pref{r} AS MATERIALIZED (
  SELECT src AS node, dst AS partner, weight AS w FROM (
    SELECT src, dst, weight,
           row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst ASC) AS rk
    FROM live{r}) WHERE rk = 1),
pairs{r} AS MATERIALIZED (
  SELECT p.node AS u, p.partner AS v, p.w AS weight
  FROM pref{r} p JOIN pref{r} q ON p.node = q.partner AND p.partner = q.node
  WHERE p.node < p.partner),
hit{r} AS (SELECT u AS node FROM pairs{r} UNION SELECT v FROM pairs{r}),
live{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst, e.weight FROM live{r} e
  WHERE e.src NOT IN (SELECT node FROM hit{r})
    AND e.dst NOT IN (SELECT node FROM hit{r}))"""
        )
    union = " UNION ALL ".join(
        f"SELECT u, v, CAST(weight AS DOUBLE) AS weight FROM pairs{r}" for r in range(rounds)
    )
    parts.append(union)
    return "\n".join(parts)


@register("max_matching", _matching_oracle_sql(16))
def q_max_matching(spark, sf_dir):
    """Fixed-16-round handshake (converges in 14 rounds on the gate graph ==
    the converged matching; pytest asserts fixed == converged there)."""
    from networkit_spark.operators.matching import local_max_matching_fixed

    e = doc_edges_undirected(spark, sf_dir)
    return local_max_matching_fixed(e, rounds=16)


def _walks_oracle_sql(length: int = 4, seed: int = 42, cap: int = 10_000) -> str:
    """Portable-LCG random walks over sorted capped adjacency (the exact
    dual of operators/walks.py: h = ((walk_id % M)*1103515245 + step*12345
    + seed) % M, M = 2^31-1; neighbor = nbrs[1 + h % deg])."""
    M = 2147483647
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", ranked AS (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rk
  FROM uedges),
adj AS MATERIALIZED (
  SELECT src, list_sort(list(dst)) AS nbrs FROM ranked WHERE rk <= {cap} GROUP BY src),
w0 AS (SELECT src AS walk_id, 0 AS step, src AS cur FROM adj)""",
    ]
    for step in range(1, length):
        c = step * 12345 + seed
        parts.append(
            f", w{step} AS MATERIALIZED ("
            f" SELECT w.walk_id, {step} AS step,"
            f" a.nbrs[CAST(1 + (((w.walk_id % {M}) * 1103515245 + {c}) % {M}) % len(a.nbrs) AS INT)] AS cur"
            f" FROM w{step - 1} w JOIN adj a ON a.src = w.cur)"
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, CAST(step AS INT) AS step, cur AS node FROM w{s}"
        for s in range(length)
    )
    parts.append(union)
    return "\n".join(parts)


@register("random_walk_corpus", _walks_oracle_sql(4))
def q_random_walk_corpus(spark, sf_dir):
    e = doc_edges_undirected(spark, sf_dir)
    return random_walks(e, walks_per_node=1, length=4)


def _node2vec_oracle_sql(
    length: int, p: float, q: float, seed: int = 42
) -> str:
    """Dual of operators/walks.py:node2vec_walks — step 1 uniform over the
    dst-sorted adjacency; steps >= 2 inverse-CDF over the p/q-biased weights
    with the cumsum evaluated in dst-ascending order (identical float op
    order to the engine's two array folds, so values match bitwise)."""
    M = 2147483647
    parts = [
        f"WITH {UEDGES_CTE}",
        """, n2vs0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM uedges),
n2vr1 AS (
  SELECT s.walk_id, s.cur AS prev, e.dst,
         row_number() OVER (PARTITION BY s.walk_id ORDER BY e.dst) AS rn,
         count(*) OVER (PARTITION BY s.walk_id) AS degc
  FROM n2vs0 s JOIN uedges e ON e.src = s.cur)""",
        f""", n2vs1 AS MATERIALIZED (
  SELECT walk_id, prev, dst AS cur FROM n2vr1
  WHERE rn = (((walk_id % {M}) * 1103515245 + {1 * 12345 + seed}) % {M}) % degc + 1)""",
    ]
    for step in range(2, length):
        c = step * 12345 + seed
        prev_cte = f"n2vs{step - 1}"
        parts.append(
            f""", n2vc{step} AS (
  SELECT s.walk_id, s.cur, e.dst,
         e.weight * (CASE WHEN e.dst = s.prev THEN {1.0 / p!r}
              WHEN EXISTS (SELECT 1 FROM uedges pe
                           WHERE pe.src = s.prev AND pe.dst = e.dst) THEN 1.0
              ELSE {1.0 / q!r} END) AS wgt
  FROM {prev_cte} s JOIN uedges e ON e.src = s.cur),
n2vm{step} AS (
  SELECT *, sum(wgt) OVER (PARTITION BY walk_id ORDER BY dst
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM n2vc{step}),
n2vs{step} AS MATERIALIZED (
  SELECT walk_id, cur AS prev, dst AS cur FROM (
    SELECT *, row_number() OVER (PARTITION BY walk_id ORDER BY dst) AS pick_rn
    FROM (SELECT *, max(cum) OVER (PARTITION BY walk_id) AS total FROM n2vm{step})
    WHERE cum >= ((((walk_id % {M}) * 1103515245 + {c}) % {M}) / {float(M)!r}) * total
  ) WHERE pick_rn = 1)"""
        )
    union = " UNION ALL ".join(
        ["SELECT walk_id, CAST(0 AS INT) AS step, walk_id AS node FROM n2vs0"]
        + [
            f"SELECT walk_id, CAST({s} AS INT) AS step, cur AS node FROM n2vs{s}"
            for s in range(1, length)
        ]
    )
    parts.append(union)
    return "\n".join(parts)


N2V_P, N2V_Q = 4.0, 0.25


@register("node2vec_walks", _node2vec_oracle_sql(4, N2V_P, N2V_Q))
def q_node2vec_walks(spark, sf_dir):
    """p/q-biased second-order node2vec walks (BiasedRandomWalk.cpp:65-99),
    p=4 (return-averse), q=0.25 (DFS-leaning), length 4, deterministic."""
    from networkit_spark.operators.walks import node2vec_walks

    e = doc_edges_undirected(spark, sf_dir)
    return node2vec_walks(e, p=N2V_P, q=N2V_Q, walks_per_node=1, length=4)


# ---------------------------------------------------------------------------
# Distance family extras: diameter / eccentricity / hop plot (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "eccentricity_fixed8",
    _msbfs_oracle_sql(
        8,
        """
SELECT node, CAST(max(dist) AS BIGINT) AS ecc
FROM {last} WHERE dist < {big} GROUP BY node
""",
    ),
)
def q_eccentricity_fixed8(spark, sf_dir):
    """Per-node eccentricity over an 8-round all-sources BFS
    (``Eccentricity.cpp``; 8 >= diameter on the gate graph)."""
    from networkit_spark.operators.distance import multi_source_bfs

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    d = multi_source_bfs(e, nodes_range(spark, n))
    return (
        d.groupBy(F.col("source").alias("node"))
        .agg(F.max("dist").cast("long").alias("ecc"))
    )


@register(
    "diameter_exact",
    _msbfs_oracle_sql(
        8,
        "SELECT CAST(max(dist) AS BIGINT) AS diameter FROM {last} WHERE dist < {big}",
    ),
)
def q_diameter_exact(spark, sf_dir):
    """Exact diameter via iFub (``Diameter.cpp:22-32``); the oracle computes
    it as the max over the all-pairs fixed-round BFS."""
    from networkit_spark.operators.distance import diameter_ifub

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    d = diameter_ifub(e, nodes_range(spark, n))
    return e.sparkSession.createDataFrame([(d,)], "diameter long")


@register(
    "hop_distribution",
    _msbfs_oracle_sql(
        8,
        """
SELECT dist, CAST(count(*) AS BIGINT) AS pairs
FROM {last} WHERE dist > 0 AND dist < {big} GROUP BY dist
""",
    ),
)
def q_hop_distribution(spark, sf_dir):
    """Hop plot (``HopPlotApproximation`` exact twin): ordered-pair count
    per distance from the all-sources BFS."""
    from networkit_spark.operators.distance import multi_source_bfs

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    d = multi_source_bfs(e, nodes_range(spark, n))
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count("*").alias("pairs"))
        .select(F.col("dist").cast("long").alias("dist"), "pairs")
    )


# ---------------------------------------------------------------------------
# Katz link-prediction index + ROC evaluation (SURVEY §2.7 link prediction)
# ---------------------------------------------------------------------------

def _katz_oracle_sql(beta: float, max_len: int = 3) -> str:
    """Walk counts from every node via adjacency powers, truncated Katz."""
    parts = [
        f"WITH {UEDGES_CTE}",
        """, pairs AS (
  SELECT doc_id AS u, (doc_id * 11 + 3) % (SELECT count(*) FROM documents) AS v
  FROM documents WHERE doc_id % 5 = 0),
k1 AS (SELECT e.src AS u, e.dst AS node, CAST(count(*) AS DOUBLE) AS cnt
       FROM uedges e WHERE e.src IN (SELECT u FROM pairs) GROUP BY 1, 2)""",
    ]
    for l in range(2, max_len + 1):
        parts.append(
            f""", k{l} AS MATERIALIZED (
  SELECT p.u, e.dst AS node, CAST(sum(p.cnt) AS DOUBLE) AS cnt
  FROM k{l - 1} p JOIN uedges e ON e.src = p.node GROUP BY p.u, e.dst)"""
        )
    terms = " UNION ALL ".join(
        f"SELECT u, node, {beta ** l!r} * cnt AS s FROM k{l}" for l in range(1, max_len + 1)
    )
    parts.append(
        f""", allk AS ({terms})
SELECT p.u, p.v, round(coalesce(t.katz, 0.0), 9) AS katz
FROM pairs p LEFT JOIN (
  SELECT u, node AS v, sum(s) AS katz FROM allk GROUP BY u, node
) t ON p.u = t.u AND p.v = t.v"""
    )
    return "\n".join(parts)


@register("katz_link_pred", _katz_oracle_sql(0.05, 3))
def q_katz_link_pred(spark, sf_dir):
    """Truncated KatzIndex (``linkprediction.pyx:138``) on a deterministic
    pair set (u, (11u+3) mod n) for u % 5 == 0."""
    from networkit_spark.operators.linkprediction import katz_index

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    pairs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("u"),
            ((F.col("doc_id") * 11 + 3) % n).alias("v"),
        )
    )
    out = katz_index(e, pairs, beta=0.05, max_path_length=3)
    return out.select("u", "v", F.round("katz", 9).alias("katz"))


@register(
    "link_pred_roc",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
wedges AS (
  SELECT a.dst AS u, b.dst AS v, count(*) AS cn
  FROM uedges a JOIN uedges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2
),
lab AS (
  SELECT w.u, w.v, w.cn,
         CASE WHEN e.src IS NOT NULL THEN 1 ELSE 0 END AS y
  FROM wedges w LEFT JOIN uedges e ON e.src = w.u AND e.dst = w.v
),
per AS (SELECT cn, sum(y) AS pos, sum(1 - y) AS neg FROM lab GROUP BY cn),
tot AS (SELECT sum(pos) AS tp, sum(neg) AS fp FROM per),
cum AS (
  SELECT cn,
         sum(pos) OVER (ORDER BY cn DESC ROWS UNBOUNDED PRECEDING) AS tp,
         sum(neg) OVER (ORDER BY cn DESC ROWS UNBOUNDED PRECEDING) AS fp
  FROM per
)
SELECT CAST(c.cn AS DOUBLE) AS threshold,
       round(c.fp / greatest(t.fp, 1), 7) AS fpr,
       round(c.tp / greatest(t.tp, 1), 7) AS tpr
FROM cum c CROSS JOIN tot t
""",
)
def q_link_pred_roc(spark, sf_dir):
    """ROC of common-neighbor count as an edge predictor over wedge pairs
    (``ROCMetric``, ``linkprediction.pyx:677``): label = the pair is an
    actual edge. Thresholds = distinct cn values (bounded domain)."""
    from networkit_spark.operators.linkprediction import roc_curve, wedge_pairs

    e = doc_edges_undirected(spark, sf_dir)
    wp = wedge_pairs(e)
    lab = (
        wp.join(
            e.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).alias("y")),
            ["u", "v"],
            "left",
        )
        .select("u", "v", "cn", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    out = roc_curve(lab, score_col="cn", label_col="y", bins=None)
    return out.select(
        F.col("threshold").cast("double").alias("threshold"),
        F.round("fpr", 7).alias("fpr"),
        F.round("tpr", 7).alias("tpr"),
    )


# ---------------------------------------------------------------------------
# Sfigality / Laplacian centrality / HubDominance (SURVEY §2.7 extras)
# ---------------------------------------------------------------------------

@register(
    "sfigality",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
hi AS (
  SELECT e.src AS node,
         sum(CASE WHEN d2.d > d1.d THEN 1 ELSE 0 END) AS nhi,
         count(*) AS d
  FROM uedges e JOIN deg d1 ON e.src = d1.node JOIN deg d2 ON e.dst = d2.node
  GROUP BY e.src
)
SELECT doc.doc_id AS node,
       round(CASE WHEN h.d > 0 THEN h.nhi::DOUBLE / h.d ELSE 0.0 END, 7) AS score
FROM documents doc LEFT JOIN hi h ON doc.doc_id = h.node
""",
)
def q_sfigality(spark, sf_dir):
    """Sfigality (``centrality.pyx:2078``): fraction of neighbors with
    strictly higher degree."""
    from networkit_spark.operators.centrality import sfigality

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = sfigality(e, nodes_range(spark, n))
    return out.select("node", F.round("score", 7).alias("score"))


@register(
    "laplacian_centrality",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
ns AS (
  SELECT e.src AS node, sum(d2.d) AS sdd
  FROM uedges e JOIN deg d2 ON e.dst = d2.node GROUP BY e.src
)
SELECT doc.doc_id AS node,
       CAST(coalesce(d.d, 0) * coalesce(d.d, 0) + coalesce(d.d, 0)
            + 2 * coalesce(ns.sdd, 0) AS BIGINT) AS score
FROM documents doc
LEFT JOIN deg d ON doc.doc_id = d.node
LEFT JOIN ns ON doc.doc_id = ns.node
""",
)
def q_laplacian_centrality(spark, sf_dir):
    """Unweighted Laplacian centrality closed form
    (``LaplacianCentrality.cpp``): d^2 + d + 2*sum of neighbor degrees."""
    from networkit_spark.operators.centrality import laplacian_centrality_unweighted

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return laplacian_centrality_unweighted(e, nodes_range(spark, n))


@register(
    "hub_dominance",
    _plp_oracle_sql(
        PLP_ITERS,
        """
, sizes AS (SELECT label, count(*) AS sz FROM {last} GROUP BY label),
ideg AS (
  SELECT e.src AS node, a.label, count(*) AS idg
  FROM uedges e
  JOIN {last} a ON e.src = a.node
  JOIN {last} b ON e.dst = b.node
  WHERE a.label = b.label
  GROUP BY e.src, a.label
),
top AS (SELECT label, max(idg) AS mx FROM ideg GROUP BY label)
SELECT s.label,
       round(CASE WHEN s.sz > 1 THEN coalesce(t.mx, 0)::DOUBLE / (s.sz - 1)
             ELSE 0.0 END, 7) AS hub_dominance
FROM sizes s LEFT JOIN top t ON s.label = t.label
""",
    ),
)
def q_hub_dominance(spark, sf_dir):
    """HubDominance (``community.pyx:555``) over the PLP(5) partition."""
    from networkit_spark.operators.community import hub_dominance

    e = doc_edges_undirected(spark, sf_dir)
    labels = q_plp_fixed5(spark, sf_dir)
    out = hub_dominance(e, labels)
    return out.select("label", F.round("hub_dominance", 7).alias("hub_dominance"))


@register(
    "square_clustering",
    f"""
WITH {UEDGES_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
p AS (
  SELECT a.src AS u, a.dst AS v, b.dst AS w
  FROM uedges a JOIN uedges b ON a.src = b.src AND a.dst < b.dst
),
cn AS (
  SELECT a.dst AS v, b.dst AS w, count(*) AS cn
  FROM uedges a JOIN uedges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2
),
he AS (SELECT src AS v, dst AS w, 1 AS vw FROM uedges WHERE src < dst),
agg AS (
  SELECT p.u,
         sum(cn.cn - 1) AS sq,
         sum(dv.d + dw.d - cn.cn - 1 - 2 * coalesce(he.vw, 0)) AS pot
  FROM p
  JOIN cn ON p.v = cn.v AND p.w = cn.w
  JOIN deg dv ON p.v = dv.node
  JOIN deg dw ON p.w = dw.node
  LEFT JOIN he ON p.v = he.v AND p.w = he.w
  GROUP BY p.u
)
SELECT doc.doc_id AS node,
       round(CASE WHEN a.pot > 0 THEN a.sq::DOUBLE / a.pot ELSE 0.0 END, 7) AS score
FROM documents doc LEFT JOIN agg a ON doc.doc_id = a.u
""",
)
def q_square_clustering(spark, sf_dir):
    """Local square clustering coefficient (4-cycles) —
    ``LocalSquareClusteringCoefficient.cpp`` exact semantics."""
    from networkit_spark.operators.triangles import local_square_clustering

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = local_square_clustering(e, nodes_range(spark, n))
    return out.select("node", F.round("score", 7).alias("score"))


@register(
    "partition_quality",
    _plp_oracle_sql(
        PLP_ITERS,
        """
, m2 AS (SELECT sum(weight) AS w FROM uedges),
intra AS (
  SELECT sum(e.weight) AS w
  FROM uedges e JOIN {last} a ON e.src = a.node JOIN {last} b ON e.dst = b.node
  WHERE a.label = b.label
)
SELECT round(intra.w / m2.w, 7) AS coverage,
       round(1.0 - intra.w / m2.w, 7) AS edge_cut_frac
FROM intra CROSS JOIN m2
""",
    ),
)
def q_partition_quality(spark, sf_dir):
    """Coverage + edge-cut fraction of the PLP(5) partition
    (``Coverage`` / ``EdgeCut``, ``community.pyx:436,471``)."""
    from networkit_spark.operators.community import coverage

    e = doc_edges_undirected(spark, sf_dir)
    labels = q_plp_fixed5(spark, sf_dir)
    cov = coverage(e, labels)
    return e.sparkSession.createDataFrame(
        [(round(cov, 7), round(1.0 - cov, 7))], "coverage double, edge_cut_frac double"
    )


def _partition_similarity_oracle_sql() -> str:
    """Rand / ARI / Jaccard between the PLP(3) and PLP(5) partitions (one
    label chain, two snapshots), via the contingency-table pair formulas."""
    parts = [f"WITH {UEDGES_CTE}", ", p0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)"]
    for k in range(1, PLP_ITERS + 1):
        prev = f"p{k - 1}"
        parts.append(
            f", p{k} AS MATERIALIZED ("
            f" SELECT n.node, coalesce(t.nlabel, n.label) AS label"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT node, nlabel FROM ("
            f"     SELECT e.dst AS node, p.label AS nlabel,"
            f"            row_number() OVER (PARTITION BY e.dst"
            f"              ORDER BY sum(e.weight) DESC, p.label ASC) AS rk"
            f"     FROM uedges e JOIN {prev} p ON e.src = p.node"
            f"     GROUP BY e.dst, p.label"
            f"   ) WHERE rk = 1"
            f" ) t ON n.node = t.node)"
        )
    parts.append(
        f""", ct AS (
  SELECT a.label AS la, b.label AS lb, count(*) AS c
  FROM p3 a JOIN p{PLP_ITERS} b ON a.node = b.node GROUP BY 1, 2
),
sums AS (
  SELECT (SELECT sum(c) FROM ct) AS n,
         (SELECT sum(c * (c - 1) / 2.0) FROM ct) AS s,
         (SELECT sum(sc * (sc - 1) / 2.0) FROM (SELECT sum(c) AS sc FROM ct GROUP BY la)) AS sa,
         (SELECT sum(sc * (sc - 1) / 2.0) FROM (SELECT sum(c) AS sc FROM ct GROUP BY lb)) AS sb
)
SELECT round((n * (n - 1) / 2.0 - (sa + sb - 2 * s)) / (n * (n - 1) / 2.0), 7) AS rand,
       round((s - sa * sb / (n * (n - 1) / 2.0))
             / ((sa + sb) / 2.0 - sa * sb / (n * (n - 1) / 2.0)), 7) AS ari,
       round(s / (sa + sb - s), 7) AS jaccard
FROM sums"""
    )
    return "\n".join(parts)


@register("partition_similarity", _partition_similarity_oracle_sql())
def q_partition_similarity(spark, sf_dir):
    """Rand / AdjustedRand / Jaccard measures (``community.pyx:983,1141,
    1065``) between the PLP(3) and PLP(5) partitions."""
    from networkit_spark.operators.community import (
        adjusted_rand_index,
        jaccard_partition_similarity,
        rand_index,
    )

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    a = plp_fixed(e, nodes_range(spark, n), iterations=3)
    b = q_plp_fixed5(spark, sf_dir)
    r = rand_index(a, b)
    ari = adjusted_rand_index(a, b)
    j = jaccard_partition_similarity(a, b)
    return spark.createDataFrame(
        [(round(r, 7), round(ari, 7), round(j, 7))],
        "rand double, ari double, jaccard double",
    )


def _group_degree_oracle_sql(k: int = 4) -> str:
    """Greedy group-degree unrolled: per round, gain(u) = #neighbors outside
    the reachable set; argmax with min-id ties."""
    parts = [f"WITH {UEDGES_CTE}", ", reach0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE 1=0)"]
    sel_exprs = []
    for r in range(1, k + 1):
        prev_sel = (
            "SELECT node FROM (" + " UNION ALL ".join(sel_exprs) + ")"
            if sel_exprs
            else "SELECT CAST(NULL AS BIGINT) WHERE 1=0"
        )
        parts.append(
            f""", gains{r} AS MATERIALIZED (
  SELECT d.doc_id AS src, coalesce(g.c, 0) AS g
  FROM documents d LEFT JOIN (
    SELECT e.src, count(*) AS c FROM uedges e
    WHERE e.dst NOT IN (SELECT id FROM reach{r - 1}) GROUP BY e.src
  ) g ON d.doc_id = g.src
  WHERE d.doc_id NOT IN ({prev_sel})),
pick{r} AS (SELECT src AS node FROM gains{r} ORDER BY g DESC, src ASC LIMIT 1),
reach{r} AS MATERIALIZED (
  SELECT id FROM reach{r - 1}
  UNION SELECT node FROM pick{r}
  UNION SELECT e.dst FROM uedges e JOIN pick{r} p ON e.src = p.node)"""
        )
        sel_exprs.append(f"SELECT node FROM pick{r}")
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, node FROM pick{i + 1}" for i in range(k)
    )
    parts.append(finals)
    return "\n".join(parts)


@register("group_degree", _group_degree_oracle_sql(4))
def q_group_degree(spark, sf_dir):
    """Greedy group-degree, k=4 (``GroupDegree.cpp`` objective |N(S)\\S|,
    deterministic min-id ties)."""
    from networkit_spark.operators.group_centrality import group_degree

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    members, _score = group_degree(e, nodes_range(spark, n), k=4)
    return members


# ---------------------------------------------------------------------------
# Local partition evaluation + permanence (SURVEY §2.7: IntrapartitionDensity,
# IsolatedInterpartitionConductance/Expansion, StablePartitionNodes,
# PartitionFragmentation, PermanenceCentrality)
# ---------------------------------------------------------------------------

_LAB_CTE = (
    ", lab AS ("
    " SELECT e.src, e.dst, e.weight, a.label AS ls, b.label AS ld"
    " FROM uedges e JOIN {last} a ON e.src = a.node"
    " JOIN {last} b ON e.dst = b.node)"
)


@register(
    "local_partition_eval",
    _plp_oracle_sql(
        PLP_ITERS,
        _LAB_CTE
        + """,
per_label AS (
  SELECT ls AS label, sum(weight) AS vol,
         sum(CASE WHEN ls <> ld THEN weight ELSE 0 END) AS cut,
         sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) / 2.0 AS intra_cnt
  FROM lab GROUP BY ls
),
sizes AS (SELECT label, count(*) AS size FROM {last} GROUP BY label),
tot AS (SELECT sum(weight) AS tv FROM uedges),
nt AS (SELECT count(*) AS nn FROM {last})
SELECT s.label, CAST(s.size AS BIGINT) AS size,
  round(CASE WHEN s.size > 1
        THEN coalesce(p.intra_cnt, 0) / (s.size * (s.size - 1) / 2.0)
        ELSE 1.0 END, 7) AS intra_density,
  round(CASE WHEN least(coalesce(p.vol, 0), tot.tv - coalesce(p.vol, 0)) > 0
        THEN coalesce(p.cut, 0) / least(coalesce(p.vol, 0), tot.tv - coalesce(p.vol, 0))
        ELSE 0.0 END, 7) AS iso_conductance,
  round(CASE WHEN least(s.size, nt.nn - s.size) > 0
        THEN coalesce(p.cut, 0) / least(s.size, nt.nn - s.size)
        ELSE 0.0 END, 7) AS iso_expansion
FROM sizes s LEFT JOIN per_label p ON s.label = p.label, tot, nt""",
    ),
)
def q_local_partition_eval(spark, sf_dir):
    """Per-PLP(5)-community IntrapartitionDensity + isolated conductance /
    expansion (``IntrapartitionDensity.cpp:38``,
    ``IsolatedInterpartitionConductance.cpp:45``,
    ``IsolatedInterpartitionExpansion.cpp:38``)."""
    from networkit_spark.operators.community import local_partition_evaluation

    e = doc_edges_undirected(spark, sf_dir)
    labels = q_plp_fixed5(spark, sf_dir)
    out = local_partition_evaluation(e, labels)
    return out.select(
        "label",
        "size",
        F.round("intra_density", 7).alias("intra_density"),
        F.round("iso_conductance", 7).alias("iso_conductance"),
        F.round("iso_expansion", 7).alias("iso_expansion"),
    )


@register(
    "stable_partition_nodes",
    _plp_oracle_sql(
        PLP_ITERS,
        _LAB_CTE
        + """,
strength AS (
  SELECT src AS node, ls AS own, ld AS nl, sum(weight) AS w
  FROM lab GROUP BY 1, 2, 3
),
verdict AS (
  SELECT node,
         (max(CASE WHEN nl = own THEN w ELSE 0 END) > 0 AND
          max(CASE WHEN nl = own THEN w ELSE 0 END) >
          max(CASE WHEN nl <> own THEN w ELSE 0 END)) AS stable
  FROM strength GROUP BY node, own
),
pn AS (
  SELECT l.label, coalesce(v.stable, TRUE) AS stable
  FROM {last} l LEFT JOIN verdict v ON l.node = v.node
)
SELECT label, CAST(count(*) AS BIGINT) AS size,
       round(sum(CASE WHEN stable THEN 1.0 ELSE 0.0 END) / count(*), 7) AS stable_frac
FROM pn GROUP BY label""",
    ),
)
def q_stable_partition_nodes(spark, sf_dir):
    """Per-community fraction of stable nodes over PLP(5)
    (``StablePartitionNodes.cpp:20-52``: stable iff own-label neighbor
    weight positive and strictly above every foreign label's)."""
    from networkit_spark.operators.community import stable_partition_nodes

    e = doc_edges_undirected(spark, sf_dir)
    labels = q_plp_fixed5(spark, sf_dir)
    out = stable_partition_nodes(e, labels)
    return out.select("label", "size", F.round("stable_frac", 7).alias("stable_frac"))


def _plp_cc_chains_sql(final: str) -> str:
    """Both the PLP(5) chain (p0..p5) and the CC(15) chain (c0..c15) in one
    oracle; ``final`` formats with {p} and {c}."""
    parts = [
        f"WITH {UEDGES_CTE}",
        ", p0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)",
    ]
    for k in range(1, PLP_ITERS + 1):
        prev = f"p{k - 1}"
        parts.append(
            f", p{k} AS MATERIALIZED ("
            f" SELECT n.node, coalesce(t.nlabel, n.label) AS label"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT node, nlabel FROM ("
            f"     SELECT e.dst AS node, p.label AS nlabel,"
            f"            row_number() OVER (PARTITION BY e.dst"
            f"              ORDER BY sum(e.weight) DESC, p.label ASC) AS rk"
            f"     FROM uedges e JOIN {prev} p ON e.src = p.node"
            f"     GROUP BY e.dst, p.label"
            f"   ) WHERE rk = 1"
            f" ) t ON n.node = t.node)"
        )
    parts.append(", c0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)")
    for k in range(1, CC_ITERS + 1):
        prev = f"c{k - 1}"
        parts.append(
            f", c{k} AS MATERIALIZED ("
            f" SELECT n.node, least(n.label, coalesce(t.ml, n.label)) AS label"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT e.dst AS node, min(p.label) AS ml"
            f"   FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.node)"
        )
    parts.append(final.format(p=f"p{PLP_ITERS}", c=f"c{CC_ITERS}"))
    return "\n".join(parts)


def _frag_oracle_sql() -> str:
    """PLP(5) x CC(15) intersection pieces: both chains in one oracle."""
    return _plp_cc_chains_sql(
        """, pieces AS (
  SELECT p.label, c.label AS cc, count(*) AS piece
  FROM {p} p JOIN {c} c ON p.node = c.node
  GROUP BY p.label, c.label
)
SELECT label, CAST(sum(piece) AS BIGINT) AS size,
       round(1.0 - max(piece) * 1.0 / sum(piece), 7) AS fragmentation
FROM pieces GROUP BY label"""
    )


@register("partition_fragmentation", _frag_oracle_sql())
def q_partition_fragmentation(spark, sf_dir):
    """Per-PLP(5)-community fragmentation across CC(15) components
    (``PartitionFragmentation.cpp:30-60``: 1 - largest-connected-piece /
    community size)."""
    from networkit_spark.operators.community import partition_fragmentation

    labels = q_plp_fixed5(spark, sf_dir)
    cc = q_connected_components(spark, sf_dir)
    out = partition_fragmentation(labels, cc)
    return out.select("label", "size", F.round("fragmentation", 7).alias("fragmentation"))


@register(
    "permanence_centrality",
    _plp_oracle_sql(
        PLP_ITERS,
        _LAB_CTE
        + """,
pn AS (
  SELECT src AS node, count(*) AS deg,
         sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS intra_deg
  FROM lab GROUP BY src
),
mext AS (
  SELECT node, max(w) AS max_ext FROM (
    SELECT src AS node, ld, count(*) AS w FROM lab WHERE ls <> ld GROUP BY src, ld
  ) GROUP BY node
),
ie AS (SELECT src, dst FROM lab WHERE ls = ld),
tri AS (
  SELECT t1.src AS node, count(*) AS tri
  FROM ie t1 JOIN ie t2 ON t1.src = t2.src AND t1.dst < t2.dst
  JOIN ie t3 ON t3.src = t1.dst AND t3.dst = t2.dst
  GROUP BY t1.src
)
SELECT p.node,
  round(CAST(p.intra_deg AS DOUBLE) / greatest(coalesce(m.max_ext, 0), 1) / p.deg
        - (1.0 - CASE WHEN p.intra_deg >= 2
                 THEN coalesce(t.tri, 0) * 2.0 / (p.intra_deg * (p.intra_deg - 1))
                 ELSE 0.0 END), 7) AS permanence
FROM pn p LEFT JOIN mext m ON p.node = m.node LEFT JOIN tri t ON p.node = t.node""",
    ),
)
def q_permanence_centrality(spark, sf_dir):
    """Per-node permanence over the PLP(5) partition
    (``PermanenceCentrality.cpp:138-156``; intra clustering ``:109-135``)."""
    from networkit_spark.operators.centrality import permanence

    e = doc_edges_undirected(spark, sf_dir)
    labels = q_plp_fixed5(spark, sf_dir)
    out = permanence(e, labels)
    return out.select("node", F.round("permanence", 7).alias("permanence"))


# ---------------------------------------------------------------------------
# LouvainMapEquation (SURVEY §2.7) — synchronous map-equation local moving
# ---------------------------------------------------------------------------

ME_ITERS = 3


def _me_oracle_sql(iterations: int) -> str:
    """Unrolled synchronous map-equation sweeps (operator docstring formulas,
    ``LouvainMapEquation.cpp:349-391``), scores rounded to 9 decimals in both
    engines so the move decisions are engine-portable."""

    def plogp(x: str) -> str:
        return f"(CASE WHEN ({x}) > 0 THEN (({x})/t.tv)*ln(({x})/t.tv) ELSE 0.0 END)"

    parts = [
        f"WITH {UEDGES_CTE}",
        ", ue AS (SELECT src, dst, weight FROM uedges WHERE src <> dst)",
        ", tv AS (SELECT sum(weight) AS tv FROM ue)",
        ", wd AS (SELECT src AS node, sum(weight) AS wdeg FROM ue GROUP BY src)",
        ", m0 AS (SELECT doc_id AS node, doc_id AS comm FROM documents)",
    ]
    for k in range(1, iterations + 1):
        prev = f"m{k - 1}"
        parity = (k - 1) % 2
        cdc = "(2*b.wcur - b.wdeg)"  # cutDifferenceCurrent
        cdt = "(b.wdeg - 2*w.w)"  # cutDifferenceTarget
        parts.append(
            f""", lab{k} AS (
  SELECT e.src, e.dst, e.weight, a.comm AS ls, b.comm AS ld
  FROM ue e JOIN {prev} a ON e.src = a.node JOIN {prev} b ON e.dst = b.node
), st{k} AS (
  SELECT ls AS c, sum(weight) AS vol,
         sum(CASE WHEN ls <> ld THEN weight ELSE 0 END) AS cut
  FROM lab{k} GROUP BY ls
), tc{k} AS (SELECT sum(cut) AS totcut FROM st{k}),
wuc{k} AS (
  SELECT src AS node, ld AS c, sum(weight) AS w FROM lab{k} GROUP BY 1, 2
), base{k} AS (
  SELECT m.node, m.comm AS cur, d.wdeg, coalesce(wc.w, 0) AS wcur,
         s.vol AS vol_cur, s.cut AS cut_cur, c.totcut
  FROM {prev} m JOIN wd d ON m.node = d.node
  LEFT JOIN wuc{k} wc ON wc.node = m.node AND wc.c = m.comm
  JOIN st{k} s ON s.c = m.comm
  CROSS JOIN tc{k} c
), sb{k} AS (
  SELECT b.node, b.cur, b.wdeg, b.wcur, b.totcut,
    round({plogp("b.totcut")}
        + ({plogp("b.cut_cur + b.vol_cur")} - {plogp(f"b.cut_cur + {cdc} + b.vol_cur - b.wdeg")})
        - 2*({plogp("b.cut_cur")} - {plogp(f"b.cut_cur + {cdc}")}), 9) AS stay
  FROM base{k} b CROSS JOIN tv t
), cand{k} AS (
  SELECT b.node, w.c,
    round({plogp(f"b.totcut + (2*b.wcur - b.wdeg) + {cdt}")}
        + ({plogp(f"s.cut + {cdt} + s.vol + b.wdeg")} - {plogp("s.cut + s.vol")})
        - 2*({plogp(f"s.cut + {cdt}")} - {plogp("s.cut")}), 9) AS change
  FROM base{k} b JOIN wuc{k} w ON w.node = b.node AND w.c <> b.cur
  JOIN st{k} s ON s.c = w.c CROSS JOIN tv t
), bst{k} AS (
  SELECT node, change, c FROM (
    SELECT node, change, c,
           row_number() OVER (PARTITION BY node ORDER BY change ASC, c ASC) AS rk
    FROM cand{k}) WHERE rk = 1
), m{k} AS MATERIALIZED (
  SELECT s.node,
         CASE WHEN (s.node % 2) = {parity} AND b.change IS NOT NULL AND b.change < s.stay
              THEN b.c ELSE s.cur END AS comm
  FROM sb{k} s LEFT JOIN bst{k} b ON s.node = b.node
)"""
        )
    parts.append(
        f"""SELECT m.node, mn.label FROM m{iterations} m
JOIN (SELECT comm, min(node) AS label FROM m{iterations} GROUP BY comm) mn
  ON m.comm = mn.comm"""
    )
    return "\n".join(parts)


@register("map_equation_fixed3", _me_oracle_sql(ME_ITERS))
def q_map_equation_fixed3(spark, sf_dir):
    """Synchronous LouvainMapEquation local moving, 3 fixed sweeps
    (``LouvainMapEquation.cpp:349-391`` fitness; parity staging)."""
    from networkit_spark.operators.mapequation import map_equation_fixed

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return map_equation_fixed(e, nodes_range(spark, n), iterations=ME_ITERS)


# ---------------------------------------------------------------------------
# Biconnected components (SURVEY §2.7; BiconnectedComponents.cpp)
# ---------------------------------------------------------------------------

@register("biconnected_components")  # no SQL oracle: the cycle-closure
# equivalence needs data-dependent iteration counts (BFS forest + LCA walk
# + aux CC); correctness is pinned by tests/test_biconnected.py against a
# sequential Hopcroft-Tarjan oracle on fixed + random graphs
def q_biconnected_components(spark, sf_dir):
    """Edge partition into biconnected components; label = min tree-edge
    child id (deterministic), bridges are singletons."""
    from networkit_spark.operators.biconnected import BiconnectedComponents

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    res = BiconnectedComponents().run(e, nodes_range(spark, n))
    return res.get_edge_partition().select("u", "v", "label")


# ---------------------------------------------------------------------------
# Selective community detection: PageRankNibble (SURVEY §2.7; scd/)
# ---------------------------------------------------------------------------

PRN_ALPHA = 0.1
PRN_EPS = 1e-4
PRN_ROUNDS = 6
PRN_SEED = 0


def _prn_oracle_sql() -> str:
    """Unrolled synchronous ACL push (``ApproximatePageRank.cpp`` batched
    variant, residuals rounded to 12) + conductance sweep cut
    (``PageRankNibble.cpp:bestSweepSet``), scores rounded to 9."""
    a, eps = PRN_ALPHA, PRN_EPS
    parts = [
        f"WITH {UEDGES_CTE}",
        ", ue AS (SELECT src, dst, weight FROM uedges WHERE src <> dst)",
        ", dg AS (SELECT src AS node, sum(weight) AS deg FROM ue GROUP BY src)",
        ", tv AS (SELECT sum(weight) AS tv FROM ue)",
        f", s0 AS (SELECT CAST({PRN_SEED} AS BIGINT) AS node, 0.0 AS p, 1.0 AS res)",
    ]
    for k in range(1, PRN_ROUNDS + 1):
        prev = f"s{k - 1}"
        parts.append(
            f""", a{k} AS (
  SELECT s.node, s.res, d.deg FROM {prev} s JOIN dg d ON s.node = d.node
  WHERE s.res >= {eps} * d.deg
), g{k} AS (
  SELECT e.dst AS node, sum((1.0 - {a}) * x.res * e.weight / (2.0 * x.deg)) AS gain
  FROM ue e JOIN a{k} x ON e.src = x.node GROUP BY e.dst
), mv{k} AS (
  SELECT s.node,
         CASE WHEN x.node IS NOT NULL THEN s.p + {a} * s.res ELSE s.p END AS p,
         CASE WHEN x.node IS NOT NULL THEN (1.0 - {a}) * s.res / 2.0 ELSE s.res END AS res
  FROM {prev} s LEFT JOIN a{k} x ON s.node = x.node
), s{k} AS MATERIALIZED (
  SELECT coalesce(m.node, g.node) AS node,
         round(coalesce(m.p, 0), 12) AS p,
         round(coalesce(m.res, 0) + coalesce(g.gain, 0), 12) AS res
  FROM mv{k} m FULL OUTER JOIN g{k} g ON m.node = g.node
)"""
        )
    parts.append(
        f""", sup AS (
  SELECT s.node, d.deg, round(s.p / d.deg, 9) AS score
  FROM s{PRN_ROUNDS} s JOIN dg d ON s.node = d.node WHERE s.p > 0
), rkd AS (
  SELECT node, deg, row_number() OVER (ORDER BY score DESC, node ASC) AS rk FROM sup
), ie AS (
  SELECT b.rk AS rk, e.weight
  FROM ue e JOIN rkd a ON e.src = a.node JOIN rkd b ON e.dst = b.node
  WHERE a.rk < b.rk
), closed AS (SELECT rk, sum(weight) AS cw FROM ie GROUP BY rk),
swp AS (
  SELECT r.node, r.rk,
         sum(r.deg) OVER (ORDER BY r.rk) AS vol,
         sum(r.deg) OVER (ORDER BY r.rk)
           - 2 * sum(coalesce(c.cw, 0)) OVER (ORDER BY r.rk) AS cut
  FROM rkd r LEFT JOIN closed c ON r.rk = c.rk
), cnd AS (
  SELECT node, rk, round(cut / least(vol, t.tv - vol), 9) AS cond
  FROM swp CROSS JOIN tv t
  WHERE rk < (SELECT count(*) FROM documents)
), best AS (SELECT rk AS best_rk FROM cnd ORDER BY cond ASC, rk ASC LIMIT 1)
SELECT r.node FROM rkd r, best b WHERE r.rk <= b.best_rk"""
    )
    return "\n".join(parts)


@register("pagerank_nibble", _prn_oracle_sql())
def q_pagerank_nibble(spark, sf_dir):
    """Seed-set expansion around node 0: synchronous ACL push (6 rounds) +
    best conductance sweep (``PageRankNibble.cpp``, ``ApproximatePageRank.cpp``)."""
    from networkit_spark.operators.scd import page_rank_nibble

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return page_rank_nibble(
        e, PRN_SEED, n, alpha=PRN_ALPHA, eps=PRN_EPS, fixed_rounds=PRN_ROUNDS
    )


# ---------------------------------------------------------------------------
# ForestFire edge score (SURVEY §2.7; sparsification/ForestFireScore.cpp)
# ---------------------------------------------------------------------------

FF_FIRES = 32
FF_PF = 0.4
FF_ROUNDS = 4
_FF_THRESH = int(FF_PF * float(2**60))


def _forest_fire_oracle_sql() -> str:
    """Unrolled deterministic synchronous forest fire (operator docstring;
    portable 60-bit md5 burn decisions)."""
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", fr0 AS (
  SELECT fire, (('0x' || substr(md5('ff|' || fire), 1, 15))::BIGINT % n.n) AS node
  FROM (SELECT range AS fire FROM range({FF_FIRES})), nn n
), vis0 AS (SELECT fire, node FROM fr0)""",
    ]
    for r in range(FF_ROUNDS):
        parts.append(
            f""", c{r} AS (
  SELECT f.fire, e.src, e.dst
  FROM uedges e JOIN fr{r} f ON e.src = f.node
  WHERE e.src <> e.dst AND NOT EXISTS (
    SELECT 1 FROM vis{r} v WHERE v.fire = f.fire AND v.node = e.dst)
), b{r} AS (
  SELECT fire, src, dst FROM c{r}
  WHERE ('0x' || substr(md5(concat_ws('|', 'ffb', fire, {r}, src, dst)), 1, 15))::BIGINT
        < {_FF_THRESH}
), nw{r} AS (SELECT DISTINCT fire, dst AS node FROM b{r}),
vis{r + 1} AS MATERIALIZED (
  SELECT fire, node FROM vis{r} UNION SELECT fire, node FROM nw{r}
), fr{r + 1} AS (SELECT fire, node FROM nw{r})"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM b{r}" for r in range(FF_ROUNDS))
    parts.append(
        f""", allb AS ({union}),
burns AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst, count(*) AS b
  FROM allb GROUP BY 1, 2
), mx AS (SELECT coalesce(max(b), 1) AS m FROM burns)
SELECT e.src, e.dst, round(coalesce(b.b, 0) * 1.0 / mx.m, 7) AS score
FROM (SELECT DISTINCT src, dst FROM uedges WHERE src < dst) e
LEFT JOIN burns b ON e.src = b.src AND e.dst = b.dst
CROSS JOIN mx"""
    )
    return "\n".join(parts)


@register("forest_fire_score", _forest_fire_oracle_sql())
def q_forest_fire_score(spark, sf_dir):
    """Deterministic synchronous ForestFire burn scores
    (``ForestFireScore.cpp:24-80`` batched-binomial analog)."""
    from networkit_spark.operators.sparsification import forest_fire_score

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = forest_fire_score(e, n, n_fires=FF_FIRES, pf=FF_PF, rounds=FF_ROUNDS)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


# ---------------------------------------------------------------------------
# Partition intersection / graph-structural Rand / CoverF1 (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "partition_intersection",
    _plp_oracle_sql(
        PLP_ITERS,
        """, ab AS (
  SELECT a.node, a.label AS la, b.label AS lb
  FROM p3 a JOIN {last} b ON a.node = b.node
), mins AS (SELECT la, lb, min(node) AS label FROM ab GROUP BY la, lb)
SELECT b.node, m.label FROM ab b JOIN mins m ON b.la = m.la AND b.lb = m.lb""",
    ),
)
def q_partition_intersection(spark, sf_dir):
    """Coarsest common refinement of PLP(3) and PLP(5)
    (``PartitionIntersection.cpp``; min-node-id class labels)."""
    from networkit_spark.operators.community import partition_intersection
    from networkit_spark.operators.plp import plp_fixed

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    a = plp_fixed(e, nodes_range(spark, n), iterations=3)
    b = q_plp_fixed5(spark, sf_dir)
    return partition_intersection(a, b)


@register(
    "graph_structural_rand",
    _plp_oracle_sql(
        PLP_ITERS,
        """, lab AS (
  SELECT e.src, e.dst, a1.label AS a_s, a2.label AS a_d, b1.label AS b_s, b2.label AS b_d
  FROM uedges e
  JOIN p3 a1 ON e.src = a1.node JOIN p3 a2 ON e.dst = a2.node
  JOIN {last} b1 ON e.src = b1.node JOIN {last} b2 ON e.dst = b2.node
  WHERE e.src < e.dst
)
SELECT round(1.0 - sum(CASE WHEN (a_s = a_d AND b_s = b_d)
                              OR (a_s <> a_d AND b_s <> b_d)
                       THEN 1.0 ELSE 0.0 END) / count(*), 7) AS dissimilarity
FROM lab""",
    ),
)
def q_graph_structural_rand(spark, sf_dir):
    """Graph-structural Rand dissimilarity between PLP(3) and PLP(5)
    (``GraphStructuralRandMeasure.cpp:12-37``)."""
    from networkit_spark.operators.community import graph_structural_rand
    from networkit_spark.operators.plp import plp_fixed

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    a = plp_fixed(e, nodes_range(spark, n), iterations=3)
    b = q_plp_fixed5(spark, sf_dir)
    d = graph_structural_rand(e, a, b)
    return spark.createDataFrame([(round(d, 7),)], "dissimilarity double")


@register(
    "cover_f1",
    _plp_cc_chains_sql(
        """, csz AS (SELECT label, count(*) AS csz FROM {p} GROUP BY label),
rsz AS (SELECT label AS ref, count(*) AS rsz FROM {c} GROUP BY label),
ol AS (
  SELECT p.label, c.label AS ref, count(*) AS ol
  FROM {p} p JOIN {c} c ON p.node = c.node GROUP BY p.label, c.label
), f1 AS (
  SELECT o.label,
         max(2.0 * (o.ol * 1.0 / r.rsz) * (o.ol * 1.0 / s.csz)
             / (o.ol * 1.0 / r.rsz + o.ol * 1.0 / s.csz)) AS best_f1
  FROM ol o JOIN csz s ON o.label = s.label JOIN rsz r ON o.ref = r.ref
  GROUP BY o.label
)
SELECT s.label, CAST(s.csz AS BIGINT) AS size,
       round(coalesce(f.best_f1, 0.0), 7) AS f1
FROM csz s LEFT JOIN f1 f ON s.label = f.label"""
    ),
)
def q_cover_f1(spark, sf_dir):
    """Per-PLP(5)-cluster best F1 against the CC(15) reference clustering
    (``CoverF1Similarity.cpp:60-90``)."""
    from networkit_spark.operators.community import cover_f1_similarity

    labels = q_plp_fixed5(spark, sf_dir)
    cc = q_connected_components(spark, sf_dir)
    out = cover_f1_similarity(labels, cc)
    return out.select("label", "size", F.round("f1", 7).alias("f1"))


# ---------------------------------------------------------------------------
# KPathCentrality (SURVEY §2.7; centrality/KPathCentrality.cpp)
# ---------------------------------------------------------------------------

KP_K = 4
KP_T = 256
KP_SEED = 7


def _kpath_oracle_sql() -> str:
    """Unrolled deterministic self-avoiding walks (portable LCG; the exact
    dual of ``walks.k_path_centrality``)."""
    M = 2147483647
    A = 1103515245
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", ranked AS (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rk
  FROM uedges),
adj AS MATERIALIZED (
  SELECT src, list_sort(list(dst)) AS nbrs FROM ranked WHERE rk <= 10000 GROUP BY src),
wk0 AS (
  SELECT range AS walk_id,
         (((range % {M}) * {A} + {KP_SEED}) % {M}) % n.n AS cur,
         1 + ((((range % {M}) * {A} + {777_777 * 12345 + KP_SEED}) % {M}) % {KP_K}) AS l,
         [(((range % {M}) * {A} + {KP_SEED}) % {M}) % n.n] AS visited
  FROM range({KP_T}), nn n)""",
    ]
    for j in range(1, KP_K + 1):
        c = j * 12345 + KP_SEED
        idx = f"CAST(1 + ((((walk_id % {M}) * {A} + {c}) % {M}) % len(unexp)) AS INT)"
        parts.append(
            f""", s{j} AS (
  SELECT w.walk_id, w.l, w.visited,
         list_filter(a.nbrs, y -> NOT list_contains(w.visited, y)) AS unexp
  FROM wk{j - 1} w JOIN adj a ON a.src = w.cur
  WHERE {j} <= w.l
), wk{j} AS MATERIALIZED (
  SELECT walk_id, l,
         unexp[{idx}] AS cur,
         list_append(visited, unexp[{idx}]) AS visited
  FROM s{j} WHERE len(unexp) > 0
)"""
        )
    union = " UNION ALL ".join(f"SELECT cur AS node FROM wk{j}" for j in range(1, KP_K + 1))
    parts.append(
        f""", visits AS ({union}),
cnt AS (SELECT node, count(*) AS c FROM visits GROUP BY node)
SELECT d.doc_id AS node,
       round({KP_K} * n.n * coalesce(c.c, 0) * 1.0 / {KP_T}, 7) AS score
FROM documents d LEFT JOIN cnt c ON d.doc_id = c.node, nn n"""
    )
    return "\n".join(parts)


@register("k_path_centrality", _kpath_oracle_sql())
def q_k_path_centrality(spark, sf_dir):
    """k-path centrality via deterministic self-avoiding walks
    (``KPathCentrality.cpp:33-99``; k=4, t=256 fixed trials)."""
    from networkit_spark.operators.walks import k_path_centrality

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = k_path_centrality(e, nodes_range(spark, n), k=KP_K, t=KP_T, seed=KP_SEED)
    return out.select("node", F.round("score", 7).alias("score"))


# ---------------------------------------------------------------------------
# Electrical family (SURVEY §2.7: SpanningEdgeCentrality / effective
# resistance): fixed-iteration damped-Jacobi twin of the block-CG solver
# ---------------------------------------------------------------------------

ER_ITERS = 10
ER_OMEGA = 0.5
ER_PAIRS = 5


def _eff_res_oracle_sql() -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", pairs AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY src, dst) - 1 AS i, src AS u, dst AS v
  FROM (SELECT src, dst FROM uedges WHERE src < dst ORDER BY src, dst LIMIT {ER_PAIRS})
), degs AS MATERIALIZED (
  SELECT src AS node, sum(weight) AS deg FROM uedges GROUP BY src
), x0 AS MATERIALIZED (
  SELECT p.i, d.node, d.deg,
         CASE WHEN d.node = p.u THEN CAST(1.0 AS DOUBLE)
              WHEN d.node = p.v THEN CAST(-1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS b,
         CAST(0.0 AS DOUBLE) AS x
  FROM degs d CROSS JOIN pairs p
)""",
    ]
    for t in range(1, ER_ITERS + 1):
        prev = f"x{t - 1}"
        parts.append(
            f""", x{t} AS MATERIALIZED (
  SELECT s.i, s.node, s.deg, s.b,
         {1.0 - ER_OMEGA} * s.x + {ER_OMEGA} * (s.b + coalesce(m.m, 0.0)) / s.deg AS x
  FROM {prev} s LEFT JOIN (
    SELECT e.dst AS node, p.i, sum(e.weight * p.x) AS m
    FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst, p.i
  ) m ON s.node = m.node AND s.i = m.i
)"""
        )
    parts.append(
        f"""SELECT p.u, p.v, round(xu.x - xv.x, 7) AS r_est
FROM pairs p
JOIN x{ER_ITERS} xu ON xu.i = p.i AND xu.node = p.u
JOIN x{ER_ITERS} xv ON xv.i = p.i AND xv.node = p.v"""
    )
    return "\n".join(parts)


@register("effective_resistance_jacobi10", _eff_res_oracle_sql())
def q_effective_resistance_jacobi10(spark, sf_dir):
    """Effective resistance (SpanningEdgeCentrality.cpp:44-58 semantics:
    L x = e_u - e_v, r = x_u - x_v) for the 5 lexicographically-first
    undirected doc-graph edges — deterministic 10-sweep damped-Jacobi twin
    of the converged block-CG solver (operators/electrical.py; CG itself is
    pinned against numpy pseudoinverse oracles in tests/test_electrical.py)."""
    from networkit_spark.operators.electrical import effective_resistance_jacobi

    e = doc_edges_undirected(spark, sf_dir)
    pairs = [
        (r["src"], r["dst"])
        for r in e.filter("src < dst").orderBy("src", "dst").limit(ER_PAIRS).collect()
    ]
    out = effective_resistance_jacobi(e, pairs, iterations=ER_ITERS, omega=ER_OMEGA)
    return out.select("u", "v", F.round("r_est", 7).alias("r_est"))


# ---------------------------------------------------------------------------
# Group harmonic closeness (SURVEY §2.7 Group* family): pruned greedy
# ---------------------------------------------------------------------------

GH_K = 3
GH_CANDS = 8
GH_BFS = 15
_GH_BIG = 4611686018427387904  # unreached sentinel


def _group_harmonic_oracle_sql() -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", dg AS (SELECT src AS node, count(*) AS dgc FROM uedges GROUP BY src)
, cands AS MATERIALIZED (SELECT node FROM dg ORDER BY dgc DESC, node LIMIT {GH_CANDS})
, b0 AS MATERIALIZED (SELECT node AS source, node, CAST(0 AS BIGINT) AS dist FROM cands)""",
    ]
    for t in range(1, GH_BFS + 1):
        prev = f"b{t - 1}"
        parts.append(
            f""", b{t} AS MATERIALIZED (
  SELECT source, node, min(dist) AS dist FROM (
    SELECT source, node, dist FROM {prev}
    UNION ALL
    SELECT p.source, e.dst AS node, p.dist + 1 AS dist
    FROM uedges e JOIN {prev} p ON e.src = p.node
  ) GROUP BY source, node
)"""
        )
    parts.append(f", cd AS MATERIALIZED (SELECT * FROM b{GH_BFS})")
    contrib_new = (
        f"CASE WHEN least(coalesce(s.d, {_GH_BIG}), c.dist) > 0 "
        f"THEN 1.0 / least(coalesce(s.d, {_GH_BIG}), c.dist) ELSE 0 END"
    )
    contrib_old = "CASE WHEN s.d > 0 THEN 1.0 / s.d ELSE 0 END"
    picked_union = []
    for r in range(1, GH_K + 1):
        if r == 1:
            parts.append(
                """, g1 AS MATERIALIZED (
  SELECT source, round(sum(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0 END), 9) AS g
  FROM cd GROUP BY source
)
, p1 AS MATERIALIZED (SELECT source AS node FROM g1 ORDER BY g DESC, source LIMIT 1)
, ds1 AS MATERIALIZED (SELECT cd.node, cd.dist AS d FROM cd JOIN p1 ON cd.source = p1.node)"""
            )
        else:
            exclude = " AND ".join(
                f"c.source NOT IN (SELECT node FROM p{j})" for j in range(1, r)
            )
            parts.append(
                f""", g{r} AS MATERIALIZED (
  SELECT c.source, round(sum(({contrib_new}) - (coalesce({contrib_old}, 0))), 9) AS g
  FROM cd c LEFT JOIN ds{r - 1} s ON c.node = s.node
  WHERE {exclude}
  GROUP BY c.source
)
, p{r} AS MATERIALIZED (SELECT source AS node FROM g{r} ORDER BY g DESC, source LIMIT 1)
, ds{r} AS MATERIALIZED (
  SELECT coalesce(a.node, b.node) AS node,
         least(coalesce(a.d, {_GH_BIG}), coalesce(b.dist, {_GH_BIG})) AS d
  FROM ds{r - 1} a FULL JOIN (
    SELECT cd.node, cd.dist FROM cd JOIN p{r} ON cd.source = p{r}.node
  ) b ON a.node = b.node
)"""
            )
        picked_union.append(f"SELECT {r} AS rank, node FROM p{r}")
    parts.append(
        f""", picks AS ({' UNION ALL '.join(picked_union)})
, sc AS (SELECT round(sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END), 7) AS group_score FROM ds{GH_K})
SELECT p.rank, p.node, sc.group_score FROM picks p CROSS JOIN sc"""
    )
    return "\n".join(parts)


@register("group_harmonic_closeness", _group_harmonic_oracle_sql())
def q_group_harmonic_closeness(spark, sf_dir):
    """Greedy group harmonic closeness (GroupHarmonicCloseness.cpp:622-631
    score; pruned greedy over the 8 highest-degree candidates, one batched
    multi-source BFS; picks use gains rounded to 9 decimals, min-id ties)."""
    from networkit_spark.operators.group_centrality import group_closeness_greedy

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    members, score = group_closeness_greedy(
        e, nodes_range(spark, n), k=GH_K, mode="harmonic",
        n_candidates=GH_CANDS, max_bfs_rounds=GH_BFS,
    )
    return members.select(
        "rank", "node", F.round(F.lit(score), 7).alias("group_score")
    )


# ---------------------------------------------------------------------------
# GedWalk group centrality (SURVEY §2.7): greedy walk-exposure maximization
# ---------------------------------------------------------------------------

GW_K = 3
GW_LEVELS = 4
GW_CANDS = 6


def _gedwalk_oracle_sql() -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", dg AS (SELECT src AS node, count(*) AS dgc FROM uedges GROUP BY src)
, al AS MATERIALIZED (SELECT 1.0 / (1.0 + 2 * max(dgc)) AS a FROM dg)
, gcands AS MATERIALIZED (SELECT node AS cand FROM dg ORDER BY dgc DESC, node LIMIT {GW_CANDS})
, gnodes AS (SELECT doc_id AS node FROM documents)
, pk0 AS (SELECT node FROM gnodes WHERE FALSE)""",
    ]
    for r in range(1, GW_K + 1):
        parts.append(
            f""", s{r}_0 AS MATERIALIZED (
  SELECT c.cand, n.node,
         CASE WHEN n.node = c.cand OR n.node IN (SELECT node FROM pk{r - 1})
              THEN 1 ELSE 0 END AS ingrp,
         CAST(CASE WHEN n.node = c.cand OR n.node IN (SELECT node FROM pk{r - 1})
              THEN 1 ELSE 0 END AS DOUBLE) AS hit,
         CAST(CASE WHEN n.node = c.cand OR n.node IN (SELECT node FROM pk{r - 1})
              THEN 0 ELSE 1 END AS DOUBLE) AS miss
  FROM gcands c CROSS JOIN gnodes n
  WHERE c.cand NOT IN (SELECT node FROM pk{r - 1})
)"""
        )
        for i in range(1, GW_LEVELS + 1):
            prev = f"s{r}_{i - 1}"
            parts.append(
                f""", s{r}_{i} AS MATERIALIZED (
  SELECT s.cand, s.node, s.ingrp,
         CASE WHEN s.ingrp = 1 THEN coalesce(m.wh, 0) + coalesce(m.wm, 0)
              ELSE coalesce(m.wh, 0) END AS hit,
         CASE WHEN s.ingrp = 1 THEN 0.0 ELSE coalesce(m.wm, 0) END AS miss
  FROM {prev} s LEFT JOIN (
    SELECT e.dst AS node, p.cand,
           sum(e.weight * p.hit) AS wh, sum(e.weight * p.miss) AS wm
    FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst, p.cand
  ) m ON s.node = m.node AND s.cand = m.cand
)"""
            )
        level_union = " UNION ALL ".join(
            f"SELECT cand, pow(al.a, {i}) * hit AS h FROM s{r}_{i}, al"
            for i in range(1, GW_LEVELS + 1)
        )
        parts.append(
            f""", g{r} AS MATERIALIZED (
  SELECT cand, round(sum(h), 9) AS g FROM ({level_union}) GROUP BY cand
)
, pick{r} AS MATERIALIZED (SELECT cand AS node, g FROM g{r} ORDER BY g DESC, cand LIMIT 1)
, pk{r} AS (SELECT node FROM pk{r - 1} UNION ALL SELECT node FROM pick{r})"""
        )
    picks_union = " UNION ALL ".join(
        f"SELECT {r} AS rank, node FROM pick{r}" for r in range(1, GW_K + 1)
    )
    parts.append(
        f""", gpicks AS ({picks_union})
SELECT p.rank, p.node, (SELECT round(g, 7) FROM pick{GW_K}) AS group_score FROM gpicks p"""
    )
    return "\n".join(parts)


@register("ged_walk_group", _gedwalk_oracle_sql())
def q_ged_walk_group(spark, sf_dir):
    """Greedy GedWalk (GedWalk.hpp:300-341 hit/miss recursion, fixed
    4-level truncation, alpha = 1/(1 + 2 maxdeg), top-6-degree candidate
    pool, min-id ties)."""
    from networkit_spark.operators.gedwalk import ged_walk_greedy

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    members, score = ged_walk_greedy(
        e, nodes_range(spark, n), k=GW_K, levels=GW_LEVELS,
        n_candidates=GW_CANDS, early_stop=False,
    )
    # SQL rounds gains to 9 before the final 7-digit round; mirror exactly
    return members.select(
        "rank", "node",
        F.round(F.round(F.lit(score), 9), 7).alias("group_score"),
    )


# ---------------------------------------------------------------------------
# Luby MIS + Jones-Plassmann coloring (parallel replacements for the
# reference's sequential independent-set / greedy-order passes)
# ---------------------------------------------------------------------------

MIS_ROUNDS = 6
JP_ROUNDS = 12


def _pri_sql(expr: str, tag: str, seed: int, rnd: int) -> str:
    """DuckDB twin of operators.mis_coloring._pri (portable 60-bit md5)."""
    return (
        f"(('0x' || substr(md5('{tag}|{seed}|{rnd}|' || CAST({expr} AS VARCHAR)),"
        f" 1, 15))::BIGINT)"
    )


def _luby_oracle_sql(rounds: int = MIS_ROUNDS, seed: int = 7) -> str:
    parts = [
        f"WITH {UEDGES_CTE},",
        "active0 AS (SELECT doc_id AS node FROM documents),",
        "mis0 AS (SELECT doc_id AS node FROM documents WHERE FALSE)",
    ]
    for k in range(rounds):
        p_dst = _pri_sql("e.dst", "mis", seed, k)
        p_me = _pri_sql("a.node", "mis", seed, k)
        parts.append(
            f""", nbr{k} AS MATERIALIZED (
  SELECT e.src AS node, min(struct_pack(p := {p_dst}, nid := e.dst)) AS mn
  FROM uedges e
  JOIN active{k} s ON e.src = s.node
  JOIN active{k} t ON e.dst = t.node
  GROUP BY e.src
), win{k} AS MATERIALIZED (
  SELECT a.node FROM active{k} a
  LEFT JOIN nbr{k} m ON a.node = m.node
  WHERE m.node IS NULL
     OR {p_me} < m.mn.p
     OR ({p_me} = m.mn.p AND a.node < m.mn.nid)
), mis{k + 1} AS (SELECT node FROM mis{k} UNION SELECT node FROM win{k})
, active{k + 1} AS MATERIALIZED (
  SELECT a.node FROM active{k} a
  WHERE NOT EXISTS (SELECT 1 FROM win{k} w WHERE w.node = a.node)
    AND NOT EXISTS (SELECT 1 FROM uedges e JOIN win{k} w ON e.dst = w.node
                    WHERE e.src = a.node)
)"""
        )
    parts.append(
        f"""
SELECT d.doc_id AS node, (m.node IS NOT NULL) AS in_mis
FROM documents d LEFT JOIN mis{rounds} m ON d.doc_id = m.node"""
    )
    return "\n".join(parts)


@register("luby_mis", _luby_oracle_sql())
def q_luby_mis(spark, sf_dir):
    """Luby maximal independent set, fixed rounds (converges well before
    MIS_ROUNDS on this graph — asserted in tests/test_mis_coloring.py)."""
    from networkit_spark.operators.mis_coloring import LubyMIS

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return LubyMIS(seed=7, max_rounds=MIS_ROUNDS).run(e, nodes_range(spark, n)).mis_df


def _jp_oracle_sql(rounds: int = JP_ROUNDS, seed: int = 7) -> str:
    p_dst = _pri_sql("e.dst", "jp", seed, 0)
    p_me = _pri_sql("u.node", "jp", seed, 0)
    parts = [
        f"WITH {UEDGES_CTE},",
        "u0 AS (SELECT doc_id AS node FROM documents),",
        "c0 AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS color FROM documents WHERE FALSE)",
    ]
    for k in range(rounds):
        parts.append(
            f""", nbrmax{k} AS MATERIALIZED (
  SELECT e.src AS node, max(struct_pack(p := {p_dst}, nid := e.dst)) AS mx
  FROM uedges e
  JOIN u{k} s ON e.src = s.node
  JOIN u{k} t ON e.dst = t.node
  GROUP BY e.src
), win{k} AS MATERIALIZED (
  SELECT u.node FROM u{k} u
  LEFT JOIN nbrmax{k} m ON u.node = m.node
  WHERE m.node IS NULL
     OR {p_me} > m.mx.p
     OR ({p_me} = m.mx.p AND u.node > m.mx.nid)
), used{k} AS MATERIALIZED (
  SELECT w.node, list(DISTINCT c.color) AS used
  FROM win{k} w
  JOIN uedges e ON e.src = w.node
  JOIN c{k} c ON e.dst = c.node
  GROUP BY w.node
), newc{k} AS MATERIALIZED (
  SELECT w.node,
         list_filter(range(0, CAST(len(coalesce(u.used, [])) + 2 AS BIGINT)),
                     x -> NOT list_contains(coalesce(u.used, []), x))[1] AS color
  FROM win{k} w LEFT JOIN used{k} u ON w.node = u.node
), c{k + 1} AS (SELECT node, color FROM c{k}
                UNION ALL SELECT node, color FROM newc{k})
, u{k + 1} AS MATERIALIZED (
  SELECT u.node FROM u{k} u
  WHERE NOT EXISTS (SELECT 1 FROM win{k} w WHERE w.node = u.node)
)"""
        )
    parts.append(
        f"\nSELECT node, CAST(color AS BIGINT) AS color FROM c{rounds}"
    )
    return "\n".join(parts)


@register("greedy_coloring", _jp_oracle_sql())
def q_greedy_coloring(spark, sf_dir):
    """Jones-Plassmann greedy coloring, fixed rounds (convergence on this
    graph asserted in tests/test_mis_coloring.py)."""
    from networkit_spark.operators.mis_coloring import JonesPlassmannColoring

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    res = JonesPlassmannColoring(seed=7, max_rounds=JP_ROUNDS).run(
        e, nodes_range(spark, n)
    )
    return res.colors_df


# ---------------------------------------------------------------------------
# Maximum spanning forest (Boruvka; RandomMaximumSpanningForest.cpp Kruskal
# twin under the deterministic edge total order) + maximal cliques
# ---------------------------------------------------------------------------

MSF_ROUNDS = 10
MSF_JUMPS = 10
# portable integer weight on the canonical (src<dst) edge — identical
# arithmetic in Spark and DuckDB; distinct-ish, ties broken by (lo,hi)
MSF_W_SQL = "CAST((src*131071 + dst*524287) % 999983 + 1 AS DOUBLE)"


def _msf_oracle_sql(rounds: int = MSF_ROUNDS, jumps: int = MSF_JUMPS,
                    maximum: bool = True) -> str:
    kk = "-weight" if maximum else "weight"
    unkk = "-b.kk" if maximum else "b.kk"
    parts = [
        f"WITH {UEDGES_CTE},",
        f"cedges AS (SELECT src, dst, {MSF_W_SQL} AS weight FROM uedges WHERE src < dst),",
        "swedges AS MATERIALIZED (SELECT src, dst, weight FROM cedges"
        " UNION ALL SELECT dst AS src, src AS dst, weight FROM cedges),",
        "lab0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)",
    ]
    for k in range(rounds):
        parts.append(
            f""", le{k} AS MATERIALIZED (
  SELECT ls.label AS slbl, ld.label AS dlbl, w.src, w.dst, w.weight
  FROM swedges w
  JOIN lab{k} ls ON w.src = ls.node
  JOIN lab{k} ld ON w.dst = ld.node
  WHERE ls.label <> ld.label
), best{k} AS MATERIALIZED (
  SELECT slbl AS label,
         min(struct_pack(kk := {kk},
                         lo := least(src, dst),
                         hi := greatest(src, dst),
                         tgt := dlbl)) AS b
  FROM le{k} GROUP BY slbl
), f{k} AS (SELECT DISTINCT b.lo AS src, b.hi AS dst, {unkk} AS weight FROM best{k}),
hook{k} AS (SELECT label, b.tgt AS target FROM best{k}),
p{k}_0 AS MATERIALIZED (
  SELECT h.label,
         CASE WHEN o.target = h.label AND h.label < h.target
              THEN h.label ELSE h.target END AS parent
  FROM hook{k} h LEFT JOIN hook{k} o ON o.label = h.target
)"""
        )
        for j in range(jumps):
            parts.append(
                f""", p{k}_{j + 1} AS MATERIALIZED (
  SELECT p.label, coalesce(g.parent, p.parent) AS parent
  FROM p{k}_{j} p LEFT JOIN p{k}_{j} g ON g.label = p.parent
)"""
            )
        parts.append(
            f""", lab{k + 1} AS MATERIALIZED (
  SELECT l.node, coalesce(r.parent, l.label) AS label
  FROM lab{k} l LEFT JOIN p{k}_{jumps} r ON r.label = l.label
)"""
        )
    unions = " UNION ALL ".join(f"SELECT * FROM f{k}" for k in range(rounds))
    parts.append(f"\nSELECT DISTINCT src, dst, weight FROM ({unions})")
    return "\n".join(parts)


@register("max_spanning_forest", _msf_oracle_sql())
def q_max_spanning_forest(spark, sf_dir):
    """Boruvka maximum spanning forest over the gate graph with portable
    hash weights (unique forest under the (weight desc, (lo,hi) asc) total
    order; oracle = the same algorithm unrolled to SQL)."""
    from networkit_spark.operators.spanning import max_spanning_forest_fixed

    n = _n_docs(spark, sf_dir)
    ue = doc_edges_undirected(spark, sf_dir)
    cedges = ue.filter(F.col("src") < F.col("dst")).select(
        "src", "dst",
        ((F.col("src") * 131071 + F.col("dst") * 524287) % 999983 + 1)
        .cast("double").alias("weight"),
    )
    return max_spanning_forest_fixed(
        cedges, nodes_range(spark, n), rounds=MSF_ROUNDS, jumps=MSF_JUMPS
    )


@register(
    "maximal_cliques_size3",
    f"""WITH {UEDGES_CTE}
SELECT t.a, t.b, t.c FROM (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM uedges e1
  JOIN uedges e2 ON e1.dst = e2.src AND e2.dst > e1.dst
  JOIN uedges e3 ON e3.src = e1.src AND e3.dst = e2.dst
  WHERE e1.src < e1.dst
) t
WHERE NOT EXISTS (
  SELECT 1 FROM uedges x1
  JOIN uedges x2 ON x2.src = x1.dst
  JOIN uedges x3 ON x3.src = x1.dst
  WHERE x1.src = t.a AND x2.dst = t.b AND x3.dst = t.c
)""",
)
def q_maximal_cliques_size3(spark, sf_dir):
    """Maximal cliques of size exactly 3 (triangles with no common
    neighbor) — SQL-expressible slice of the distributed Bron-Kerbosch
    (operators/cliques.py); full enumeration is pytest-pinned vs networkx."""
    from networkit_spark.operators.cliques import maximal_triangles

    e = doc_edges_undirected(spark, sf_dir)
    return maximal_triangles(e)


# ---------------------------------------------------------------------------
# Max flow / min cut (SURVEY §2; flow/EdmondsKarp.cpp parity via parallel
# push-relabel — operators/flow.py)
# ---------------------------------------------------------------------------

@register("max_flow_value")  # no SQL oracle: push-relabel supersteps are not
# SQL-expressible; correctness pinned by tests/test_flow.py (value ==
# networkx max-flow, feasibility, and max-flow-min-cut duality on fixed +
# random graphs)
def q_max_flow_value(spark, sf_dir):
    """Max s-t flow value + minimal source-side cut size on the deterministic
    doc-subgraph with nodes < 120, capacity = 1 + (src + dst) % 5, s=0,
    t=119. Single-row result (value, source_set_size).

    The subgraph is a few hundred edges, so the run is pure fixed-cost
    supersteps; shuffle partitions are dropped to 2 for the call (restored
    after) — at this input size every stage is one task anyway and the
    extra empty tasks only add scheduling latency."""
    from networkit_spark.operators.flow import max_flow

    e = (
        doc_edges(spark, sf_dir)
        .filter((F.col("src") < 120) & (F.col("dst") < 120))
        .select(
            "src",
            "dst",
            (1.0 + (F.col("src") + F.col("dst")) % 5).alias("capacity"),
        )
        .coalesce(2)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        res = max_flow(e, s=0, t=119, max_rounds=200)
        ss = res.source_set_df.count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.createDataFrame(
        [(float(res.value), int(ss))], "value double, source_set_size long"
    )


# ---------------------------------------------------------------------------
# Cut clustering (SURVEY §2; community/CutClustering.cpp — Flake-Tarjan)
# ---------------------------------------------------------------------------

@register("cut_clustering_alpha1")  # no SQL oracle: n min cuts via batched
# push-relabel are not SQL-expressible; exact-parity (labels included) is
# pinned by tests/test_cutclustering.py against a sequential networkx
# replica of CutClustering.cpp's loop
def q_cut_clustering(spark, sf_dir):
    """Flake-Tarjan cut clustering, alpha=1.0, on the deterministic
    doc-subgraph with nodes < 60 (unit weights). Labels = clustering source
    node ids, matching the reference's assignment order exactly."""
    from networkit_spark.operators.cutclustering import cut_clustering

    e = (
        doc_edges_undirected(spark, sf_dir)
        .filter((F.col("src") < 60) & (F.col("dst") < 60))
        .coalesce(2)
    )
    nodes = spark.range(60).select(F.col("id").alias("node"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        return cut_clustering(e, nodes, alpha=1.0, batch=30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# ---------------------------------------------------------------------------
# Coarsening (SURVEY §2; coarsening/ParallelPartitionCoarsening.cpp:23-66)
# ---------------------------------------------------------------------------

@register(
    "coarsen_partition_mod10",
    f"""
WITH {UEDGES_CTE},
canon AS (SELECT src, dst, weight FROM uedges WHERE src < dst)
SELECT least(src % 10, dst % 10) AS src,
       greatest(src % 10, dst % 10) AS dst,
       CAST(sum(weight) AS DOUBLE) AS weight
FROM canon
GROUP BY least(src % 10, dst % 10), greatest(src % 10, dst % 10)
""",
)
def q_coarsen_partition(spark, sf_dir):
    """ParallelPartitionCoarsening of the undirected doc graph under the
    deterministic partition label = node % 10 (already-dense subset ids, so
    the compaction rank is the identity and the oracle can recompute the
    coarse graph as a pure groupBy). Self-loop rows (src == dst) carry the
    intra-block weight, each fine edge once — the reference's
    ``sv != su || u >= v`` convention."""
    from networkit_spark.operators.coarsening import coarsen_by_partition

    e = doc_edges_undirected(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    labels = (
        spark.range(_n_docs(spark, sf_dir))
        .select(F.col("id").alias("node"), (F.col("id") % 10).alias("label"))
    )
    coarse, _mapping = coarsen_by_partition(e, labels)
    return coarse


# ---------------------------------------------------------------------------
# Reachability (SURVEY §2; reachability/ReachableNodes.cpp, AllSimplePaths.cpp)
# ---------------------------------------------------------------------------

@register(
    "reachable_counts",
    f"""
WITH RECURSIVE {EDGES_CTE},
reach(u, v) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.u, e.dst FROM reach r JOIN edges e ON r.v = e.src
)
SELECT u AS node, CAST(count(*) AS BIGINT) AS reachable FROM reach GROUP BY u
""",
)
def q_reachable_counts(spark, sf_dir):
    """Exact ReachableNodes over the directed doc graph: SCC condensation +
    transitive closure on the condensation (ReachableNodes.cpp:26-84). The
    oracle is the direct recursive-CTE closure — the condensation is an
    internal optimization, invisible in the result."""
    from networkit_spark.operators.reachability import reachable_nodes

    from networkit_spark.testgraph import doc_edges

    n = _n_docs(spark, sf_dir)
    return reachable_nodes(doc_edges(spark, sf_dir), nodes_range(spark, n))


@register(
    "simple_paths_0_7",
    f"""
WITH RECURSIVE {EDGES_CTE},
paths(last, seen, path, hops) AS (
  SELECT CAST(0 AS BIGINT), '|0|', '0', 0
  UNION ALL
  SELECT e.dst, p.seen || CAST(e.dst AS VARCHAR) || '|',
         p.path || '->' || CAST(e.dst AS VARCHAR), p.hops + 1
  FROM paths p JOIN edges e ON p.last = e.src
  WHERE p.hops < 4 AND p.last <> 7
    AND p.seen NOT LIKE '%|' || CAST(e.dst AS VARCHAR) || '|%'
)
SELECT path, CAST(hops AS INT) AS hops FROM paths WHERE last = 7
""",
)
def q_simple_paths(spark, sf_dir):
    """AllSimplePaths 0 -> 7, cutoff 4 edges, over the directed doc graph.
    The oracle's recursive CTE carries the same |-delimited member set, so
    both engines enumerate the identical path strings."""
    from networkit_spark.operators.reachability import all_simple_paths
    from networkit_spark.testgraph import doc_edges

    return all_simple_paths(doc_edges(spark, sf_dir), 0, 7, cutoff=4)


# ---------------------------------------------------------------------------
# Epidemic simulation (SURVEY §2; simulation/EpidemicSimulationSEIR.cpp)
# ---------------------------------------------------------------------------

def _seir_oracle() -> str:
    from networkit_spark.operators.epidemic import seir_oracle_sql

    return seir_oracle_sql(
        EDGES_CTE, t_max=6, trans_p=0.35, e_time=2, i_time=3, zero=0
    )


@register("seir_census", _seir_oracle())
def q_seir_census(spark, sf_dir):
    """SEIR epidemic over the directed doc graph: zero node 0, transP=0.35,
    eTime=2, iTime=3, 6 sweeps. Output = getData() census rows
    (zero, t, state, population); draws are deterministic portable-md5, so
    the unrolled SQL oracle replays the identical epidemic."""
    from networkit_spark.operators.epidemic import seir_simulation
    from networkit_spark.testgraph import doc_edges

    n = _n_docs(spark, sf_dir)
    return seir_simulation(
        doc_edges(spark, sf_dir), nodes_range(spark, n),
        t_max=6, trans_p=0.35, e_time=2, i_time=3, zero=0,
    )


# ---------------------------------------------------------------------------
# Randomization (SURVEY §2; randomization/DegreePreservingShuffle.cpp,
# GlobalCurveball.cpp)
# ---------------------------------------------------------------------------

@register(
    "degree_preserving_shuffle",
    f"""
WITH {EDGES_CTE},
sig AS (
  SELECT d.doc_id AS node, coalesce(i.c, 0) AS din, coalesce(o.c, 0) AS dout
  FROM documents d
  LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o ON d.doc_id = o.src
  LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON d.doc_id = i.dst
),
by_id AS (SELECT node, din, dout,
          row_number() OVER (PARTITION BY din, dout ORDER BY node) AS pos FROM sig),
by_rand AS (SELECT node AS new_id, din, dout,
            row_number() OVER (PARTITION BY din, dout
              ORDER BY ('0x'||substr(md5('dps42|'||node),1,15))::BIGINT, node) AS pos
            FROM sig)
SELECT b.node, r.new_id
FROM by_id b JOIN by_rand r ON b.din = r.din AND b.dout = r.dout AND b.pos = r.pos
""",
)
def q_degree_preserving_shuffle(spark, sf_dir):
    """Seeded random node-id bijection within (in, out)-degree classes over
    the directed doc graph (DegreePreservingShuffle::getPermutation)."""
    from networkit_spark.operators.randomization import degree_preserving_shuffle
    from networkit_spark.testgraph import doc_edges

    n = _n_docs(spark, sf_dir)
    return degree_preserving_shuffle(
        doc_edges(spark, sf_dir), nodes_range(spark, n), seed=42
    )


@register(
    "global_curveball_1round",
    f"""
WITH {UEDGES_CTE},
ced AS (SELECT src, dst FROM uedges WHERE src < dst),
rk AS (SELECT doc_id AS node,
       row_number() OVER (ORDER BY ('0x'||substr(md5('gcb42r0|'||doc_id),1,15))::BIGINT, doc_id) - 1 AS r
       FROM documents),
prs AS (SELECT node, r // 2 AS tid FROM rk),
mates AS (SELECT tid, min(node) AS u, max(node) AS v FROM prs GROUP BY tid HAVING count(*) = 2),
nt AS (SELECT p.node, p.tid, CASE WHEN p.node = m.u THEN m.v ELSE m.u END AS mate
       FROM prs p JOIN mates m ON p.tid = m.tid),
adj AS (SELECT src AS node, dst AS w FROM ced UNION ALL SELECT dst, src FROM ced),
inc AS (SELECT least(a.node, a.w) AS a, greatest(a.node, a.w) AS b, a.node, t.tid, t.mate, a.w
        FROM adj a JOIN nt t ON a.node = t.node),
own AS (SELECT a, b, node FROM (
          SELECT a, b, node, row_number() OVER (PARTITION BY a, b ORDER BY tid, node) AS rn
          FROM inc) WHERE rn = 1),
asg AS (SELECT i.* FROM inc i JOIN own o ON i.a = o.a AND i.b = o.b AND i.node = o.node),
pinned AS (SELECT a, b FROM asg WHERE w = mate),
cand AS (SELECT tid, node, mate, w FROM asg WHERE w <> mate),
pc AS (SELECT tid, w, count(*) AS cnt, min(node) AS n1, max(node) AS n2 FROM cand GROUP BY tid, w),
common AS (SELECT * FROM pc WHERE cnt = 2),
common_edges AS (SELECT n1 AS x, w FROM common UNION ALL SELECT n2, w FROM common),
disj AS (SELECT c.* FROM cand c LEFT JOIN common cm ON c.tid = cm.tid AND c.w = cm.w
         WHERE cm.tid IS NULL),
bk AS (SELECT DISTINCT node AS mate, w FROM adj),
disj2 AS (SELECT d.*, (b.mate IS NOT NULL) AS blocked
          FROM disj d LEFT JOIN bk b ON d.mate = b.mate AND d.w = b.w),
stuck AS (SELECT node AS x, w FROM disj2 WHERE blocked),
movable AS (SELECT tid, node, mate, w FROM disj2 WHERE NOT blocked),
qu AS (SELECT tid, sum(CASE WHEN node < mate THEN 1 ELSE 0 END) AS q,
       min(least(node, mate)) AS u, min(greatest(node, mate)) AS v
       FROM movable GROUP BY tid),
dealt AS (SELECT m.tid,
       CASE WHEN row_number() OVER (PARTITION BY m.tid
              ORDER BY ('0x'||substr(md5('gcb42r0d|'||m.w),1,15))::BIGINT, m.w) <= q.q
            THEN q.u ELSE q.v END AS x, m.w
       FROM movable m JOIN qu q ON m.tid = q.tid),
de AS (SELECT tid, least(x, w) AS src, greatest(x, w) AS dst FROM dealt),
dup AS (SELECT src, dst FROM de GROUP BY src, dst HAVING count(*) > 1),
rejected AS (SELECT DISTINCT d.tid FROM de d JOIN dup p ON d.src = p.src AND d.dst = p.dst),
kept AS (SELECT x, w FROM dealt d WHERE NOT EXISTS (SELECT 1 FROM rejected r WHERE r.tid = d.tid)),
reverted AS (SELECT node AS x, w FROM movable m WHERE EXISTS (SELECT 1 FROM rejected r WHERE r.tid = m.tid)),
half AS (SELECT x, w FROM common_edges UNION ALL SELECT x, w FROM kept
         UNION ALL SELECT x, w FROM reverted UNION ALL SELECT x, w FROM stuck)
SELECT least(x, w) AS src, greatest(x, w) AS dst, CAST(1.0 AS DOUBLE) AS weight FROM half
UNION ALL
SELECT a AS src, b AS dst, CAST(1.0 AS DOUBLE) AS weight FROM pinned
""",
)
def q_global_curveball(spark, sf_dir):
    """One synchronous global curveball trade round over the canonical
    undirected doc graph; the oracle replays the identical pairing, card
    assignment, deal and reject logic from the shared md5 draws."""
    from networkit_spark.operators.randomization import global_curveball
    from networkit_spark.testgraph import doc_edges_undirected

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    return global_curveball(e, nodes_range(spark, n), rounds=1, seed=42)


# ---------------------------------------------------------------------------
# b-matching (SURVEY §2; matching/BSuitorMatcher.cpp)
# ---------------------------------------------------------------------------

def _bmatch_oracle() -> str:
    from networkit_spark.operators.bmatching import b_suitor_oracle_sql

    # 15 unrolled rounds >= convergence on the doc graph; extra rounds no-op
    return b_suitor_oracle_sql(UEDGES_CTE, b=2, rounds=15)


@register("b_matching_b2", _bmatch_oracle())
def q_b_matching(spark, sf_dir):
    """b-suitor b-matching (b=2) over the canonical undirected doc graph;
    unit weights, ties -> smaller partner id; the oracle unrolls the same
    want/lock/decrement rounds."""
    from networkit_spark.operators.bmatching import b_suitor_matching
    from networkit_spark.testgraph import doc_edges_undirected

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    return b_suitor_matching(e, 2, nodes_range(spark, n), max_rounds=15)


# ---------------------------------------------------------------------------
# NetworkitBinary I/O (SURVEY §2; io/NetworkitBinaryReader.cpp / Writer.cpp)
# ---------------------------------------------------------------------------

@register(
    "nkb_roundtrip",
    f"WITH {EDGES_CTE} SELECT src, dst, CAST(weight AS DOUBLE) AS weight FROM edges",
)
def q_nkb_roundtrip(spark, sf_dir):
    """Write the directed doc graph as nkbg003 (chunked varint binary) and
    read it back — the oracle is the original edge derivation, so the row
    set proves the codec + chunk layout are lossless."""
    import os
    import tempfile

    from networkit_spark.sources.nkb import (
        read_networkit_binary,
        write_networkit_binary,
    )
    from networkit_spark.testgraph import doc_edges

    e = doc_edges(spark, sf_dir)
    n = _n_docs(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="nkb"), "g.nkbg")
    write_networkit_binary(e, n, path, directed=True, weighted=True, chunks=8)
    _nodes, back, _directed = read_networkit_binary(spark, path)
    return back


# ---------------------------------------------------------------------------
# Bidirectional BFS / SPSP (SURVEY §2; distance/BidirectionalBFS.cpp, SPSP.cpp)
# ---------------------------------------------------------------------------

@register(
    "bidir_bfs_0_97",
    f"""
WITH RECURSIVE {EDGES_CTE},
w(node, dist) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.dist + 1 FROM w JOIN edges e ON w.node = e.src WHERE w.dist < 30
)
SELECT CAST(min(dist) AS INT) AS dist FROM w WHERE node = 97
""",
)
def q_bidir_bfs(spark, sf_dir):
    """Meet-in-the-middle s-t hop distance (0 -> 97) on the directed doc
    graph; oracle = recursive-CTE forward BFS min."""
    from networkit_spark.operators.distance import bidirectional_bfs
    from networkit_spark.testgraph import doc_edges

    d = bidirectional_bfs(doc_edges(spark, sf_dir), 0, 97)
    return spark.createDataFrame([(int(d),)], "dist int")


@register(
    "spsp_sources8",
    f"""
WITH RECURSIVE {UEDGES_CTE},
walk(source, node, dist) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id < 8
  UNION
  SELECT w.source, e.dst, w.dist + 1
  FROM walk w JOIN uedges e ON w.node = e.src WHERE w.dist < 30
)
SELECT source, node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY source, node
""",
)
def q_spsp_sources8(spark, sf_dir):
    """SPSP: simultaneous BFS waves from sources 0..7 to every node of the
    undirected doc graph (reached pairs only)."""
    from networkit_spark.operators.distance import spsp

    n = _n_docs(spark, sf_dir)
    srcs = spark.range(8).select("id")
    return spsp(doc_edges_undirected(spark, sf_dir), srcs, nodes_range(spark, n))


# ---------------------------------------------------------------------------
# Hub labeling + dynamic SSSP (SURVEY §2; distance/PrunedLandmarkLabeling.cpp,
# DynBFS.cpp / DynDijkstra.cpp)
# ---------------------------------------------------------------------------

@register(
    "pll_distances_sub40",
    f"""
WITH RECURSIVE {UEDGES_CTE},
sub AS (SELECT src, dst FROM uedges WHERE src < 40 AND dst < 40),
walk(u, node, dist) AS (
  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id < 40
  UNION
  SELECT w.u, e.dst, w.dist + 1 FROM walk w JOIN sub e ON w.node = e.src WHERE w.dist < 30
)
SELECT u, node AS v, CAST(min(dist) AS BIGINT) AS dist
FROM walk WHERE u < node GROUP BY u, node
""",
)
def q_pll_distances(spark, sf_dir):
    """End-to-end pruned-landmark-labeling check: build 2-hop hub labels
    (degree-order batches of 8) over the <40-node undirected doc subgraph,
    answer EVERY pair query from the labels alone; the oracle recomputes the
    same distances by recursive BFS — exactness of the label cover is the
    thing being verified."""
    from networkit_spark.operators.hublabels import hub_distances, pruned_landmark_labels

    e = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 40) & (F.col("dst") < 40)
    )
    nodes = spark.range(40).select(F.col("id").alias("id"))
    labels = pruned_landmark_labels(e, nodes, batch=8)
    pairs = (
        spark.range(40).select(F.col("id").alias("u"))
        .crossJoin(spark.range(40).select(F.col("id").alias("v")))
        .filter(F.col("u") < F.col("v"))
    )
    return hub_distances(labels, pairs)


@register(
    "dyn_sssp_insert_from0",
    f"""
WITH RECURSIVE {UEDGES_CTE},
extra AS (
  SELECT doc_id AS src, (doc_id * 11 + 5) % (SELECT n FROM nn) AS dst
  FROM documents WHERE doc_id % 50 = 0
),
full_e AS (
  SELECT src, dst FROM uedges
  UNION SELECT src, dst FROM extra WHERE src <> dst
  UNION SELECT dst, src FROM extra WHERE src <> dst
),
w(node, dist) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.dist + 1 FROM w JOIN full_e e ON w.node = e.src WHERE w.dist < 30
)
SELECT node, CAST(min(dist) AS DOUBLE) AS dist FROM w GROUP BY node
""",
)
def q_dyn_sssp(spark, sf_dir):
    """DynSSSP: BFS distances from node 0 on the undirected doc graph, then
    insert the deterministic extra edges (i, (11i+5) mod n for i%50==0,
    symmetrized) INCREMENTALLY — the oracle recomputes from scratch on the
    post-insertion graph, so the delta relaxation must land on the same
    fixpoint."""
    from networkit_spark.operators.distance import sssp_distances
    from networkit_spark.streaming.dyn_sssp import update_sssp_insert

    n = _n_docs(spark, sf_dir)
    base = doc_edges_undirected(spark, sf_dir)
    extra = (
        spark.range(0, n, 50)
        .select(F.col("id").alias("src"), ((F.col("id") * 11 + 5) % n).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    extra_sym = extra.union(
        extra.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    full_e = (
        base.select("src", "dst").union(extra_sym.select("src", "dst")).distinct()
        .withColumn("weight", F.lit(1.0))
    )
    d0 = sssp_distances(base, 0)
    return update_sssp_insert(full_e, d0, extra_sym)


@register("gce_community_seed0")  # no SQL oracle: data-dependent greedy
# argmax loop (like cut_clustering); exact parity vs a sequential replica is
# pinned in tests/test_scd.py
def q_gce_community(spark, sf_dir):
    """GCE objective-M community grown from seed 0 on the <60-node
    undirected doc subgraph; deterministic (min-id ties)."""
    from networkit_spark.operators.scd import gce

    e = doc_edges_undirected(spark, sf_dir).filter(
        (F.col("src") < 60) & (F.col("dst") < 60)
    )
    com = gce(e, {0})
    return spark.createDataFrame([(int(v),) for v in sorted(com)], "node long")


# --- SCDGroundTruthComparison: PLP-found communities vs lang cover ---------

_SCD_GT_FINAL = """
SELECT s.seed,
       round(coalesce(max(sc.j), 0.0), 7) AS jaccard,
       round(coalesce(max(sc.f1), 0.0), 7) AS f1,
       round(coalesce(max(sc.p), 0.0), 7) AS prec,
       round(coalesce(max(sc.r), 0.0), 7) AS rec
FROM (SELECT doc_id AS seed FROM documents WHERE doc_id < 8) s
LEFT JOIN (
    WITH labels AS (SELECT node, label FROM {last}),
    seeds AS (SELECT doc_id AS seed FROM documents WHERE doc_id < 8),
    found AS (
        SELECT se.seed, l2.node
        FROM seeds se
        JOIN labels l1 ON l1.node = se.seed
        JOIN labels l2 ON l2.label = l1.label
    ),
    truth AS (SELECT doc_id AS node, lang AS subset FROM documents),
    fsz AS (SELECT seed, count(*) AS fs FROM found GROUP BY seed),
    tsz AS (SELECT subset, count(*) AS ts FROM truth GROUP BY subset),
    allowed AS (SELECT t.node AS seed, t.subset FROM truth t),
    ov AS (
        SELECT f.seed, t.subset, count(*) AS o
        FROM found f
        JOIN truth t ON f.node = t.node
        WHERE EXISTS (SELECT 1 FROM allowed a
                      WHERE a.seed = f.seed AND a.subset = t.subset)
        GROUP BY f.seed, t.subset
    )
    SELECT ov.seed,
           ov.o * 1.0 / (fsz.fs + tsz.ts - ov.o) AS j,
           ov.o * 1.0 / tsz.ts AS r,
           ov.o * 1.0 / fsz.fs AS p,
           CASE WHEN ov.o > 0
                THEN 2.0 * (ov.o * 1.0 / fsz.fs) * (ov.o * 1.0 / tsz.ts)
                     / (ov.o * 1.0 / fsz.fs + ov.o * 1.0 / tsz.ts)
                ELSE 0.0 END AS f1
    FROM ov JOIN fsz ON ov.seed = fsz.seed JOIN tsz ON ov.subset = tsz.subset
) sc ON s.seed = sc.seed
GROUP BY s.seed
"""


_SCD_MEMBERS = (0, 1, 2)
_SCD_MEM_CTE = "mem AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(m))"


@register(
    "tce_shell_scores",
    f"""
WITH {UEDGES_CTE},
{_SCD_MEM_CTE},
deg AS (SELECT src AS node, count(*) AS deg, sum(weight) AS wd FROM uedges GROUP BY src),
ce AS (
  SELECT e.src AS u, e.dst AS v, e.weight AS w FROM uedges e
  WHERE e.src IN (SELECT m FROM mem) AND e.dst NOT IN (SELECT m FROM mem)),
tri AS (
  SELECT ce.u, ce.v, sum(least(a.weight, b.weight)) AS tmin
  FROM ce JOIN uedges a ON a.src = ce.u
          JOIN uedges b ON b.src = ce.v AND b.dst = a.dst
  GROUP BY ce.u, ce.v),
sel AS (
  SELECT ce.v AS node,
         (ce.w + coalesce(tri.tmin, 0)) / (least(du.wd, dv.wd) * dv.deg) AS s
  FROM ce LEFT JOIN tri ON tri.u = ce.u AND tri.v = ce.v
  JOIN deg du ON du.node = ce.u
  JOIN deg dv ON dv.node = ce.v)
SELECT node, round(sum(s), 7) AS score FROM sel GROUP BY node
""",
)
def q_tce_shell_scores(spark, sf_dir):
    """TCE shell-priority table (TCE.cpp:105-121) for the fixed community
    {0,1,2} — the distributed per-round computation the greedy loop
    consumes; the full greedy is pinned vs a sequential replica in
    tests/test_scd_expansion.py."""
    from networkit_spark.operators.scd_expansion import tce_shell_scores_df

    e = doc_edges_undirected(spark, sf_dir)
    out = tce_shell_scores_df(e, set(_SCD_MEMBERS))
    return out.select("node", F.round("score", 7).alias("score"))


@register(
    "lte_shell_similarity",
    f"""
WITH {UEDGES_CTE},
{_SCD_MEM_CTE},
deg AS (SELECT src AS node, sum(weight * weight) AS wsq FROM uedges GROUP BY src),
ce AS (
  SELECT e.src AS u, e.dst AS v, e.weight AS w FROM uedges e
  WHERE e.src IN (SELECT m FROM mem) AND e.dst NOT IN (SELECT m FROM mem)),
tri AS (
  SELECT ce.u, ce.v, sum(a.weight * b.weight) AS tprod
  FROM ce JOIN uedges a ON a.src = ce.u
          JOIN uedges b ON b.src = ce.v AND b.dst = a.dst
  GROUP BY ce.u, ce.v),
sel AS (
  SELECT ce.v AS node,
         (2 * ce.w + coalesce(tri.tprod, 0))
         / (sqrt(1 + du.wsq) * sqrt(1 + dv.wsq)) AS s
  FROM ce LEFT JOIN tri ON tri.u = ce.u AND tri.v = ce.v
  JOIN deg du ON du.node = ce.u
  JOIN deg dv ON dv.node = ce.v)
SELECT node, round(sum(s), 7) AS int_sim FROM sel GROUP BY node
""",
)
def q_lte_shell_similarity(spark, sf_dir):
    """LocalTightnessExpansion structural-similarity priorities for the
    fixed community {0,1,2} (LocalTightnessExpansion.cpp); greedy pinned by
    the sequential replica in tests/test_scd_expansion.py."""
    from networkit_spark.operators.scd_expansion import lte_shell_similarity_df

    e = doc_edges_undirected(spark, sf_dir)
    out = lte_shell_similarity_df(e, set(_SCD_MEMBERS))
    return out.select("node", F.round("int_sim", 7).alias("int_sim"))


@register(
    "local_t_shell_counts",
    f"""
WITH {UEDGES_CTE},
{_SCD_MEM_CTE},
shell AS (
  SELECT DISTINCT e.dst AS v FROM uedges e
  WHERE e.src IN (SELECT m FROM mem) AND e.dst NOT IN (SELECT m FROM mem)),
tris AS (
  SELECT s.v, n1.dst AS a, n2.dst AS b
  FROM shell s
  JOIN uedges n1 ON n1.src = s.v
  JOIN uedges n2 ON n2.src = s.v AND n1.dst < n2.dst
  JOIN uedges e ON e.src = n1.dst AND e.dst = n2.dst)
SELECT v AS node,
  sum(CASE WHEN a IN (SELECT m FROM mem) AND b IN (SELECT m FROM mem) THEN 1 ELSE 0 END) AS t_int,
  sum(CASE WHEN (a IN (SELECT m FROM mem)) <> (b IN (SELECT m FROM mem)) THEN 1 ELSE 0 END) AS t_semi,
  sum(CASE WHEN a NOT IN (SELECT m FROM mem) AND b NOT IN (SELECT m FROM mem) THEN 1 ELSE 0 END) AS t_ext
FROM tris GROUP BY v
""",
)
def q_local_t_shell_counts(spark, sf_dir):
    """LocalT triangle-classification layer (LocalT.cpp) for the fixed
    community {0,1,2}; the greedy loop is pinned vs a from-scratch replica
    in tests/test_scd_expansion.py."""
    from networkit_spark.operators.scd_expansion import local_t_shell_counts_df

    e = doc_edges_undirected(spark, sf_dir)
    return local_t_shell_counts_df(e, set(_SCD_MEMBERS))


def _complex_path_sql(threshold: int = 2, rounds: int = 3) -> str:
    """Unrolled synchronous complex-contagion spread (ComplexPaths.cpp
    :146-168): round influence = degree in the complex graph snapshot."""
    parts = [
        f"WITH {UEDGES_CTE},",
        f"""act0 AS (
  SELECT 0 AS node, 0 AS round
  UNION SELECT min(dst) AS node, 0 AS round FROM uedges WHERE src = 0),
cg0 AS (
  SELECT DISTINCT least(e.src, e.dst) AS src, greatest(e.src, e.dst) AS dst
  FROM uedges e JOIN act0 a ON e.src = a.node)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
inf{r} AS (
  SELECT node, count(*) AS d FROM (
    SELECT src AS node FROM cg{r-1} UNION ALL SELECT dst FROM cg{r-1}
  ) GROUP BY node),
fresh{r} AS (
  SELECT node, {r} AS round FROM inf{r}
  WHERE d >= {threshold} AND node NOT IN (SELECT node FROM act{r-1})),
act{r} AS (SELECT * FROM act{r-1} UNION SELECT * FROM fresh{r}),
cg{r} AS (
  SELECT src, dst FROM cg{r-1}
  UNION
  SELECT DISTINCT least(e.src, e.dst), greatest(e.src, e.dst)
  FROM uedges e JOIN fresh{r} f ON e.src = f.node)"""
        )
    parts.append(f"\nSELECT node, round FROM act{rounds}")
    return "".join(parts)


@register("complex_path_adopters", _complex_path_sql(2, 3))
def q_complex_path_adopters(spark, sf_dir):
    """ComplexPathAlgorithm single-seed adopters (seed 0, threshold 2,
    3 spread rounds — fixed-round twin so the SQL unrolls exactly);
    full semantics pinned by tests/test_complexpaths.py replicas."""
    from networkit_spark.operators.complexpaths import complex_path_graphs

    e = doc_edges_undirected(spark, sf_dir)
    seeds = spark.createDataFrame([(0,)], "id long")
    _, adopters = complex_path_graphs(e, seeds, threshold=2, max_rounds=3)
    return adopters.select("node", "round")


@register("scd_ground_truth", _plp_oracle_sql(PLP_ITERS, _SCD_GT_FINAL))
def q_scd_ground_truth(spark, sf_dir):
    """SCDGroundTruthComparison (SCDGroundTruthComparison.cpp:11-130): the
    PLP community of each seed doc (seeds 0..7) scored against the lang
    ground-truth cover — best jaccard/f1/precision/recall per seed."""
    from networkit_spark.operators.scd import scd_ground_truth_comparison

    labels = q_plp_fixed5(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seeds = docs.filter(F.col("doc_id") < 8).select(F.col("doc_id").alias("seed"))
    l1 = labels.select(F.col("node").alias("seed"), "label")
    found = (
        seeds.join(l1, "seed")
        .join(labels.select("node", "label"), "label")
        .select("seed", "node")
    )
    truth = docs.select(
        F.col("doc_id").alias("node"), F.col("lang").alias("subset")
    )
    out = scd_ground_truth_comparison(found, truth)
    return out.select(
        "seed",
        F.round("jaccard", 7).alias("jaccard"),
        F.round("f1", 7).alias("f1"),
        F.round("prec", 7).alias("prec"),
        F.round("rec", 7).alias("rec"),
    )


# ---------------------------------------------------------------------------
# ForestCentrality (SURVEY §2.7 electrical family): fixed-sweep Jacobi twin
# of the shifted-system block-CG solve — x -> column u of the forest matrix
# (I + L)^(-1). Full forest_centrality (diag + closeness scores) is pinned
# against numpy inv(I+L) oracles in tests/test_forest.py.
# ---------------------------------------------------------------------------

FC_ITERS = 10
FC_OMEGA = 0.5
FC_SOURCES = [0, 1, 2]


def _forest_oracle_sql() -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        f""", degs AS MATERIALIZED (
  SELECT src AS node, sum(weight) AS deg FROM uedges GROUP BY src
), srcs AS (
  SELECT CAST(t.u AS BIGINT) AS u FROM (VALUES (0), (1), (2)) t(u)
), f0 AS MATERIALIZED (
  SELECT s.u, d.doc_id AS node, coalesce(g.deg, CAST(0.0 AS DOUBLE)) AS deg,
         CASE WHEN d.doc_id = s.u THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS b,
         CAST(0.0 AS DOUBLE) AS x
  FROM documents d CROSS JOIN srcs s LEFT JOIN degs g ON d.doc_id = g.node
)""",
    ]
    for t in range(1, FC_ITERS + 1):
        prev = f"f{t - 1}"
        parts.append(
            f""", f{t} AS MATERIALIZED (
  SELECT s.u, s.node, s.deg, s.b,
         {1.0 - FC_OMEGA} * s.x + {FC_OMEGA} * (s.b + coalesce(m.m, 0.0)) / (s.deg + 1.0) AS x
  FROM {prev} s LEFT JOIN (
    SELECT e.dst AS node, p.u, sum(e.weight * p.x) AS m
    FROM uedges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst, p.u
  ) m ON s.node = m.node AND s.u = m.u
)"""
        )
    parts.append(f"SELECT u, node, round(x, 7) AS x FROM f{FC_ITERS}")
    return "\n".join(parts)


@register("forest_column_jacobi10", _forest_oracle_sql())
def q_forest_column_jacobi10(spark, sf_dir):
    """Forest matrix columns (ForestCentrality.cpp semantics: the diagonal/
    columns of (I+L)^(-1), the shifted nonsingular system) for 3 fixed
    source nodes — deterministic 10-sweep damped-Jacobi twin of the
    converged shifted block-CG (operators/electrical.py:forest_centrality,
    numpy-pinned in tests/test_forest.py)."""
    from networkit_spark.operators.electrical import forest_matrix_columns_jacobi

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = forest_matrix_columns_jacobi(
        e, nodes_range(spark, n), FC_SOURCES, iterations=FC_ITERS, omega=FC_OMEGA
    )
    return out.select("u", "node", F.round("x", 7).alias("x"))


# ---------------------------------------------------------------------------
# LPDegreeOrdered (SURVEY §2.7, LPDegreeOrdered.cpp:18-90): degree-staged
# label propagation — 2 sweeps x 3 ascending degree buckets, unweighted
# neighbor counts, ties -> smallest label (reference tie-break is
# hash-map-order-unspecified; pinned deterministic here).
# ---------------------------------------------------------------------------

LPDO_SWEEPS = 2


def _lpdo_oracle_sql() -> str:
    parts = [
        f"WITH {UEDGES_CTE}",
        """, lpdeg AS MATERIALIZED (
  SELECT src AS node, count(*) AS deg FROM uedges GROUP BY src
), d0 AS MATERIALIZED (
  SELECT d.doc_id AS node, d.doc_id AS label,
         coalesce(g.deg, 0) AS deg,
         CASE WHEN coalesce(g.deg, 0) <= 1 THEN 0
              WHEN coalesce(g.deg, 0) <= 3 THEN 1
              ELSE 2 END AS bkt
  FROM documents d LEFT JOIN lpdeg g ON d.doc_id = g.node
)""",
    ]
    k = 0
    for _s in range(LPDO_SWEEPS):
        for b in range(3):
            prev = f"d{k}"
            k += 1
            parts.append(
                f""", d{k} AS MATERIALIZED (
  SELECT s.node,
         CASE WHEN s.bkt = {b} AND s.deg > 0 AND t.lab IS NOT NULL
              THEN t.lab ELSE s.label END AS label,
         s.deg, s.bkt
  FROM {prev} s LEFT JOIN (
    SELECT node, lab FROM (
      SELECT e.dst AS node, p.label AS lab,
             row_number() OVER (
               PARTITION BY e.dst ORDER BY count(*) DESC, p.label ASC
             ) AS rn
      FROM uedges e JOIN {prev} p ON e.src = p.node
      GROUP BY e.dst, p.label
    ) WHERE rn = 1
  ) t ON s.node = t.node
)"""
            )
    parts.append(f"SELECT node, label FROM d{k}")
    return "\n".join(parts)


@register("lp_degree_ordered", _lpdo_oracle_sql())
def q_lp_degree_ordered(spark, sf_dir):
    """Degree-staged label propagation, 2 fixed sweeps (LPDegreeOrdered
    analog; buckets = degree classes <=1 / <=3 / rest so no global sort)."""
    from networkit_spark.operators.plp import lp_degree_ordered_fixed

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    return lp_degree_ordered_fixed(e, nodes_range(spark, n), sweeps=LPDO_SWEEPS)
