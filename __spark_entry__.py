"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``networkit_spark/``; the query registry (Spark
callable + DuckDB oracle side by side) is ``networkit_spark/entry_queries*.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-20 pages by PageRank over the sf0.001 link graph."""
    from networkit_spark.entry_queries import q_pagerank_top20

    return q_pagerank_top20(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from networkit_spark.entry_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from networkit_spark.entry_queries import all_oracles

    return all_oracles()
