"""Gate queries: edge indexing + seeded sampling (SURVEY §2 rows 20/29).

Each query returns columns aliased identically in Spark and the DuckDB
oracle; the oracle re-derives the result independently (rank via SQL window,
draws via the portable md5 recipe).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.operators.edgeindex import index_edges
from networkit_spark.plans.pairs import for_node_pairs
from networkit_spark.operators.sampling import (
    draw_sql,
    seeded_edge_sample,
    seeded_node_sample,
)
from networkit_spark.testgraph import (
    EDGES_CTE,
    UEDGES_CTE,
    doc_edges,
    doc_edges_undirected,
)


@register(
    "index_edges",
    f"""
WITH {EDGES_CTE}
SELECT src, dst,
       CAST(row_number() OVER (ORDER BY src, dst) - 1 AS BIGINT) AS edge_id
FROM edges
""",
)
def q_index_edges(spark, sf_dir):
    """Consecutive edge ids = ascending (src,dst) rank (Graph::indexEdges;
    distributed range-sort + offset recipe, no global single-task window)."""
    return index_edges(doc_edges(spark, sf_dir), directed=True).select(
        "src", "dst", "edge_id"
    )


@register(
    "index_edges_undirected",
    f"""
WITH {UEDGES_CTE},
canon AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM uedges),
ids AS (SELECT u, v, CAST(row_number() OVER (ORDER BY u, v) - 1 AS BIGINT) AS edge_id
        FROM canon)
SELECT e.src, e.dst, i.edge_id
FROM uedges e
JOIN ids i ON least(e.src, e.dst) = i.u AND greatest(e.src, e.dst) = i.v
""",
)
def q_index_edges_undirected(spark, sf_dir):
    """Undirected contract: both orientations share one id (rank of the
    canonical (min,max) pair), matching the reference's edgeId symmetry."""
    return index_edges(
        doc_edges_undirected(spark, sf_dir), directed=False
    ).select("src", "dst", "edge_id")


@register(
    "seeded_edge_sample",
    f"""
WITH {EDGES_CTE}
SELECT src, dst
FROM edges
WHERE {draw_sql('es', 42, 'src', 'dst')} % 1000000 < 200000
""",
)
def q_seeded_edge_sample(spark, sf_dir):
    """20% seeded edge sample via the portable md5 draw
    (GraphTools::randomEdges analog, reproducible across partitionings)."""
    return seeded_edge_sample(
        doc_edges(spark, sf_dir), fraction=0.2, seed=42
    ).select("src", "dst")


@register(
    "node_pairs_degree_product",
    f"""
WITH {EDGES_CTE},
sub AS (SELECT doc_id AS node FROM documents WHERE doc_id < 40),
deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src)
SELECT a.node AS u, b.node AS v,
       CAST(coalesce(da.d, 0) * coalesce(db.d, 0) AS BIGINT) AS deg_product
FROM sub a
CROSS JOIN sub b
LEFT JOIN deg da ON da.node = a.node
LEFT JOIN deg db ON db.node = b.node
WHERE a.node < b.node
""",
)
def q_node_pairs_degree_product(spark, sf_dir):
    """forNodePairs (graph.pyx:1729) over a filtered node subset: all u<v
    pairs with out-degree product (broadcast NL join; guarded quadratic)."""
    e = doc_edges(spark, sf_dir)
    sub = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("node"))
        .filter(F.col("node") < 40)
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    pairs = for_node_pairs(sub, "node")
    return (
        pairs.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u", "left")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v", "left")
        .select(
            "u", "v",
            (F.coalesce("du", F.lit(0)) * F.coalesce("dv", F.lit(0)))
            .cast("long").alias("deg_product"),
        )
    )


@register(
    "seeded_node_sample",
    f"""
SELECT doc_id AS node
FROM documents
WHERE {draw_sql('ns', 7, 'doc_id')} % 1000000 < 150000
""",
)
def q_seeded_node_sample(spark, sf_dir):
    """15% seeded node sample over the documents node universe
    (GraphTools::randomNodes analog)."""
    nodes = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("node")
    )
    return seeded_node_sample(nodes, fraction=0.15, seed=7)
