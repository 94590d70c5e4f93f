"""Sparsification edge-score query registrations (SURVEY §2 row 71 +
algebraic distance, row 65): SCAN structural similarity, Multiscale
backbone, Simmelian overlap, chance-corrected triangles, local similarity,
and fixed-iteration algebraic distance — each paired with an ANSI-SQL DuckDB
oracle over the same deterministic documents-derived graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.entry_queries_graph import TRI_CTE
from networkit_spark.operators.algebraic import algebraic_distance_edge_scores, uniform_sql
from networkit_spark.operators.sparsification import (
    chance_corrected_triangle_score,
    local_similarity_score,
    multiscale_score,
    scan_edge_score,
    simmelian_overlap_score,
)
from networkit_spark.testgraph import UEDGES_CTE, doc_edges_undirected


def _n_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


# Per-edge triangle counts, canonical src < dst: shared tail for the
# triangle-derived scores (same pairs/cnt shape as the triangle_edge_score
# oracle in entry_queries_graph).
TRIEDGE_CTE = (
    TRI_CTE
    + """,
tpairs AS (
    SELECT least(ta, tb) AS u, greatest(ta, tb) AS v FROM tri
    UNION ALL SELECT least(ta, tc), greatest(ta, tc) FROM tri
    UNION ALL SELECT least(tb, tc), greatest(tb, tc) FROM tri
),
tcnt AS (SELECT u, v, count(*) AS c FROM tpairs GROUP BY u, v),
escore AS MATERIALIZED (
    SELECT e.src, e.dst, coalesce(tcnt.c, 0) AS tc
    FROM (SELECT src, dst FROM uedges WHERE src < dst) e
    LEFT JOIN tcnt ON e.src = tcnt.u AND e.dst = tcnt.v
)
"""
)


@register(
    "scan_edge_score",
    f"""
WITH {TRIEDGE_CTE}
SELECT s.src, s.dst,
       round((s.tc + 1) / sqrt((d1.d + 1.0) * (d2.d + 1.0)), 7) AS score
FROM escore s
JOIN udeg d1 ON s.src = d1.node
JOIN udeg d2 ON s.dst = d2.node
""",
)
def q_scan_edge_score(spark, sf_dir):
    """SCAN structural similarity (SCANStructuralSimilarityScore.cpp)."""
    e = doc_edges_undirected(spark, sf_dir)
    out = scan_edge_score(e)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


@register(
    "chance_corrected_triangle",
    f"""
WITH {TRIEDGE_CTE},
nnn AS (SELECT count(*) AS n FROM documents)
SELECT s.src, s.dst,
       round(CASE WHEN s.tc > 0
                  THEN s.tc * (nnn.n - 2.0) / ((d1.d - 1.0) * (d2.d - 1.0))
                  WHEN d1.d = 1 OR d2.d = 1 THEN 1.0
                  ELSE 0.0 END, 7) AS score
FROM escore s
JOIN udeg d1 ON s.src = d1.node
JOIN udeg d2 ON s.dst = d2.node
CROSS JOIN nnn
""",
)
def q_chance_corrected_triangle(spark, sf_dir):
    """Chance-corrected triangle score (ChanceCorrectedTriangleScore.cpp)."""
    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = chance_corrected_triangle_score(e, n=n)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


@register(
    "multiscale_score",
    f"""
WITH {UEDGES_CTE},
msum AS (SELECT src AS node, sum(weight) AS ws, count(*) AS d FROM uedges GROUP BY src),
dirp AS (
    SELECT e.src, e.dst,
           1.0 - power(1.0 - e.weight / s.ws, s.d - 1.0) AS p
    FROM uedges e JOIN msum s ON e.src = s.node
)
SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
       round(max(p), 7) AS score
FROM dirp GROUP BY 1, 2
""",
)
def q_multiscale_score(spark, sf_dir):
    """Multiscale backbone probability (MultiscaleScore.cpp)."""
    e = doc_edges_undirected(spark, sf_dir)
    out = multiscale_score(e)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


SIMMELIAN_MAX_RANK = 5


@register(
    "simmelian_overlap",
    f"""
WITH {TRIEDGE_CTE},
ssym AS (
    SELECT src, dst, tc FROM escore
    UNION ALL SELECT dst AS src, src AS dst, tc FROM escore
),
srk AS (
    SELECT src, dst,
           rank() OVER (PARTITION BY src ORDER BY tc DESC) - 1 AS rk
    FROM ssym
),
stop AS MATERIALIZED (
    SELECT src AS node, dst AS nbr FROM srk WHERE rk <= {SIMMELIAN_MAX_RANK}
),
scommon AS (
    SELECT e.src AS u, e.dst AS v, count(*) AS c
    FROM (SELECT src, dst FROM uedges WHERE src < dst) e
    JOIN stop t1 ON t1.node = e.src AND t1.nbr <> e.dst
    JOIN stop t2 ON t2.node = e.dst AND t2.nbr = t1.nbr
    GROUP BY e.src, e.dst
)
SELECT e.src, e.dst, CAST(coalesce(sc.c, 0) AS DOUBLE) AS score
FROM (SELECT src, dst FROM uedges WHERE src < dst) e
LEFT JOIN scommon sc ON e.src = sc.u AND e.dst = sc.v
""",
)
def q_simmelian_overlap(spark, sf_dir):
    """Simmelian overlap at max_rank=5 (SimmelianOverlapScore.cpp)."""
    e = doc_edges_undirected(spark, sf_dir)
    return simmelian_overlap_score(e, max_rank=SIMMELIAN_MAX_RANK)


@register(
    "local_similarity_score",
    f"""
WITH {TRIEDGE_CTE},
lsym AS (
    SELECT src, dst, tc FROM escore
    UNION ALL SELECT dst AS src, src AS dst, tc FROM escore
),
lsim AS (
    SELECT s.src, s.dst, d1.d AS ds,
           s.tc * 1.0 / (d1.d + d2.d - s.tc) AS sim
    FROM lsym s
    JOIN udeg d1 ON s.src = d1.node
    JOIN udeg d2 ON s.dst = d2.node
),
lrk AS (
    SELECT src, dst, ds,
           row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst ASC) AS rk
    FROM lsim
)
SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
       round(max(CASE WHEN ds > 1 THEN 1.0 - ln(rk) / ln(ds) ELSE 1.0 END), 7) AS score
FROM lrk GROUP BY 1, 2
""",
)
def q_local_similarity_score(spark, sf_dir):
    """Local-similarity sparsification exponent (LocalSimilarityScore.cpp);
    ties broken by neighbor id ascending in both engine and oracle (the
    reference's tie order is its unstable sort order — documented
    divergence)."""
    e = doc_edges_undirected(spark, sf_dir)
    out = local_similarity_score(e)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


AD_SYSTEMS = 2
AD_ITERS = 3
AD_SEED = 42


def _algebraic_distance_oracle_sql() -> str:
    u0 = uniform_sql("d.doc_id", "s.sys", AD_SEED)
    parts = [
        f"WITH {UEDGES_CTE}",
        ", syss AS (SELECT unnest(range({0})) AS sys)".replace("{0}", str(AD_SYSTEMS)),
        ", adwdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM uedges GROUP BY src)",
        f", a0 AS MATERIALIZED (SELECT d.doc_id AS node, s.sys, {u0} AS load"
        f"  FROM documents d CROSS JOIN syss s)",
    ]
    for k in range(1, AD_ITERS + 1):
        prev = f"a{k - 1}"
        parts.append(
            f""", a{k} AS MATERIALIZED (
  SELECT l.node, l.sys,
         CASE WHEN m.acc IS NOT NULL
              THEN 0.5 * l.load + 0.5 * m.acc / w.wdeg
              ELSE l.load END AS load
  FROM {prev} l
  LEFT JOIN (
     SELECT e.src AS node, p.sys, sum(e.weight * p.load) AS acc
     FROM uedges e JOIN {prev} p ON e.dst = p.node GROUP BY e.src, p.sys
  ) m ON l.node = m.node AND l.sys = m.sys
  LEFT JOIN adwdeg w ON l.node = w.node)"""
        )
    last = f"a{AD_ITERS}"
    parts.append(
        f""", mm AS (SELECT sys, min(load) AS lo, max(load) AS hi FROM {last} GROUP BY sys)
, nl AS (SELECT a.node, a.sys, (a.load - mm.lo) / (mm.hi - mm.lo) AS load
         FROM {last} a JOIN mm ON a.sys = mm.sys)
SELECT e.src, e.dst,
       round(sqrt(sum(power(abs(lu.load - lv.load), 2))), 7) AS score
FROM (SELECT src, dst FROM uedges WHERE src < dst) e
JOIN nl lu ON e.src = lu.node
JOIN nl lv ON e.dst = lv.node AND lu.sys = lv.sys
GROUP BY e.src, e.dst"""
    )
    return "\n".join(parts)


@register("algebraic_distance", _algebraic_distance_oracle_sql())
def q_algebraic_distance(spark, sf_dir):
    """Fixed-iteration algebraic distance per edge (AlgebraicDistance.cpp),
    deterministic md5 init, 2 systems x 3 iterations, L2 norm."""
    from networkit_spark.graph import nodes_range

    n = _n_docs(spark, sf_dir)
    e = doc_edges_undirected(spark, sf_dir)
    out = algebraic_distance_edge_scores(
        e,
        nodes_range(spark, n),
        num_systems=AD_SYSTEMS,
        num_iterations=AD_ITERS,
        omega=0.5,
        seed=AD_SEED,
        norm=2,
    )
    return out.select("src", "dst", F.round("score", 7).alias("score"))


# --- PrefixJaccardScore + GeometricMeanScore (edgescores combinator family) --

PREFIX_JACCARD_SQL = f"""
WITH {TRIEDGE_CTE},
incid AS (
    SELECT src AS node, dst AS nbr, tc FROM escore
    UNION ALL SELECT dst, src, tc FROM escore
),
rinc AS (
    SELECT node, nbr, rank() OVER (PARTITION BY node ORDER BY tc DESC) - 1 AS rk
    FROM incid
),
ce AS (SELECT src AS u, dst AS v FROM escore),
un AS (SELECT ce.u, ce.v, r.nbr, r.rk AS ru
       FROM ce JOIN rinc r ON r.node = ce.u WHERE r.nbr <> ce.v),
vn AS (SELECT ce.u, ce.v, r.nbr, r.rk AS rv
       FROM ce JOIN rinc r ON r.node = ce.v WHERE r.nbr <> ce.u),
b AS (
    SELECT coalesce(un.u, vn.u) AS u, coalesce(un.v, vn.v) AS v,
           coalesce(un.nbr, vn.nbr) AS nbr, un.ru, vn.rv
    FROM un FULL OUTER JOIN vn
      ON un.u = vn.u AND un.v = vn.v AND un.nbr = vn.nbr
),
ev AS (
    SELECT u, v, ru AS r, 1 AS du, 0 AS dv, 0 AS dc FROM b WHERE rv IS NULL
    UNION ALL
    SELECT u, v, rv, 0, 1, 0 FROM b WHERE ru IS NULL
    UNION ALL
    SELECT u, v, least(ru, rv),
           CASE WHEN ru <= rv THEN 1 ELSE 0 END,
           CASE WHEN ru <= rv THEN 0 ELSE 1 END, 0
    FROM b WHERE ru IS NOT NULL AND rv IS NOT NULL
    UNION ALL
    SELECT u, v, greatest(ru, rv),
           CASE WHEN ru <= rv THEN -1 ELSE 0 END,
           CASE WHEN ru <= rv THEN 0 ELSE -1 END, 1
    FROM b WHERE ru IS NOT NULL AND rv IS NOT NULL
),
jac AS (
    SELECT u, v,
           CAST(sum(dc) OVER w AS DOUBLE)
             / (sum(du) OVER w + sum(dv) OVER w + sum(dc) OVER w) AS j
    FROM ev
    WINDOW w AS (PARTITION BY u, v ORDER BY r
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
best AS (SELECT u, v, max(j) AS bj FROM jac GROUP BY u, v)
SELECT e.src, e.dst, round(coalesce(best.bj, 0.0), 7) AS score
FROM escore e
LEFT JOIN best ON e.src = best.u AND e.dst = best.v
"""


@register("prefix_jaccard", PREFIX_JACCARD_SQL)
def q_prefix_jaccard(spark, sf_dir):
    """PrefixJaccardScore over per-edge triangle counts
    (PrefixJaccardScore.cpp:20-150 — best Jaccard over rank prefixes)."""
    from networkit_spark.operators.sparsification import prefix_jaccard_score

    e = doc_edges_undirected(spark, sf_dir)
    out = prefix_jaccard_score(e)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


@register(
    "geometric_mean_score",
    f"""
WITH {TRIEDGE_CTE},
ns AS (
    SELECT node, sum(tc) AS s FROM (
        SELECT src AS node, tc FROM escore
        UNION ALL SELECT dst, tc FROM escore
    ) GROUP BY node
)
SELECT e.src, e.dst,
       round(CASE WHEN e.tc > 0
                  THEN e.tc / sqrt(nu.s * nv.s)
                  ELSE 0.0 END, 7) AS score
FROM escore e
JOIN ns nu ON e.src = nu.node
JOIN ns nv ON e.dst = nv.node
""",
)
def q_geometric_mean_score(spark, sf_dir):
    """GeometricMeanScore over per-edge triangle counts
    (GeometricMeanScore.cpp:18-41)."""
    from networkit_spark.operators.sparsification import geometric_mean_score

    e = doc_edges_undirected(spark, sf_dir)
    out = geometric_mean_score(e)
    return out.select("src", "dst", F.round("score", 7).alias("score"))


@register(
    "quadrangle_edge_score",
    f"""
WITH {UEDGES_CTE},
dg AS (SELECT src AS node, count(*) AS d FROM uedges GROUP BY src),
p2 AS (
    SELECT e1.src AS a, e2.dst AS y, count(*) AS c2
    FROM uedges e1 JOIN uedges e2 ON e1.dst = e2.src
    GROUP BY e1.src, e2.dst
),
p3 AS (
    SELECT p2.a, e3.dst AS b, sum(c2) AS w3
    FROM p2 JOIN uedges e3 ON p2.y = e3.src
    GROUP BY p2.a, e3.dst
)
SELECT ce.src, ce.dst,
       CAST(coalesce(p3.w3, 0) - da.d - db.d + 1 AS BIGINT) AS score
FROM (SELECT src, dst FROM uedges WHERE src < dst) ce
LEFT JOIN p3 ON ce.src = p3.a AND ce.dst = p3.b
JOIN dg da ON ce.src = da.node
JOIN dg db ON ce.dst = db.node
""",
)
def q_quadrangle_edge_score(spark, sf_dir):
    """Per-edge 4-cycle counts (ChibaNishizekiQuadrangleEdgeScore.cpp) via
    the order-free closed form P3 - deg(a) - deg(b) + 1."""
    from networkit_spark.operators.triangles import quadrangle_edge_score

    e = doc_edges_undirected(spark, sf_dir)
    return quadrangle_edge_score(e)


@register(
    "triangle_sparsify_half",
    f"""
WITH {TRIEDGE_CTE},
ranked AS (
    SELECT src, dst, tc,
           row_number() OVER (ORDER BY tc DESC, src, dst) AS rn,
           count(*) OVER () AS m
    FROM escore
),
thr AS (
    SELECT tc AS t FROM ranked
    WHERE rn = greatest(1, least(m, CAST(floor(0.5 * m + 0.5) AS BIGINT)))
)
SELECT src, dst FROM escore WHERE tc >= (SELECT t FROM thr)
""",
)
def q_triangle_sparsify_half(spark, sf_dir):
    """One-call Sparsifier pipeline (sparsification.pyx:700-811
    getSparsifiedGraphOfSize): TriangleSparsifier at edge ratio 0.5 — the
    threshold is the k-th order statistic of the score column (one sort),
    replacing the reference's binary-search filter+count loop. Oracle
    mirrors the same order statistic; ties keep all equal-score edges in
    both engines."""
    from networkit_spark.operators.sparsifiers import TriangleSparsifier

    e = doc_edges_undirected(spark, sf_dir)
    out = TriangleSparsifier().sparsify_to_ratio(e, 0.5)
    return out.filter("src < dst").select("src", "dst")
