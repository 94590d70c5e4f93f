"""Deterministic link graph derived from the driver's ``documents`` table.

The correctness gate (driver) compares our Spark queries against DuckDB SQL
oracles over the same parquet tables. Graph kernels therefore need an edge
table both engines can construct *identically*: we derive it from
``documents.doc_id`` with pure integer arithmetic (same rules as the
synthetic pages corpus, ``sources/pages.py:link_targets``):

page ``i`` (of n) links to
  - ``(2i+1) mod n``, ``(3i+7) mod n``         always,
  - ``(7i+3) mod n``        when ``i % 3 == 0``,
  - ``i mod 20``            when ``i % 5 != 0``   (hub skew),
minus self-links, deduplicated. Weight 1.0.

``edges_sql_cte`` emits the matching ANSI-SQL CTE so every oracle query
embeds the identical derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HUBS = 20


def doc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edge table (src, dst, weight) from documents.doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    i = F.col("doc_id")
    targets = F.concat(
        F.array((i * 2 + 1) % n, (i * 3 + 7) % n),
        F.when(i % 3 == 0, F.array((i * 7 + 3) % n)).otherwise(F.array().cast("array<bigint>")),
        F.when(i % 5 != 0, F.array(i % N_HUBS)).otherwise(F.array().cast("array<bigint>")),
    )
    return (
        docs.select(i.alias("src"), F.explode(F.array_distinct(targets)).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.col("src").cast("long"), F.col("dst").cast("long"), F.lit(1.0).alias("weight"))
    )


def doc_edges_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized variant (dedup on (src,dst) — weight stays 1.0)."""
    e = doc_edges(spark, sf_dir)
    return (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


# ---------------------------------------------------------------------------
# Matching ANSI SQL (DuckDB oracle) fragments
# ---------------------------------------------------------------------------

NN_CTE = "nn AS (SELECT count(*) AS n FROM documents)"

EDGES_BODY = """
raw_links AS (
    SELECT doc_id AS src, (doc_id*2+1) % n AS dst FROM documents, nn
    UNION ALL
    SELECT doc_id, (doc_id*3+7) % n FROM documents, nn
    UNION ALL
    SELECT doc_id, (doc_id*7+3) % n FROM documents, nn WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, doc_id % 20 FROM documents WHERE doc_id % 5 <> 0
),
edges AS MATERIALIZED (
    SELECT DISTINCT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM raw_links WHERE src <> dst
)
"""

EDGES_CTE = NN_CTE + ",\n" + EDGES_BODY

UEDGES_CTE = (
    EDGES_CTE
    + """,
uedges AS MATERIALIZED (
    SELECT DISTINCT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    )
)
"""
)
