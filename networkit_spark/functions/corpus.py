"""Corpus-hygiene operators for a training-data pipeline: benchmark
decontamination and domain-level stats/caps.

Standard Common-Crawl-style preprocessing stages that sit beside dedup in
any LLM data pipeline (they consume the same shingle machinery as
``functions/dedup.py``):

- ``decontaminate``: flag documents that share n-gram shingles with a
  held-out benchmark/eval corpus. The benchmark shingle set is tiny
  relative to the corpus, so the plan is an explode + BROADCAST hash join
  + per-doc partial-aggregated count — the corpus-side shingles never
  shuffle, which is the only shape that works at 10^12 documents.
- ``domain_stats`` / ``cap_per_domain``: per-domain (here: the
  ``source`` column; for real crawls, the parsed URL host) aggregates and
  a deterministic keep-first-k cap per domain — the standard guard
  against a single domain dominating the training mix. The cap uses a
  two-phase range-sort + running-offset plan (the ``plans/ids.py``
  recipe), so even a pathological single hot domain spreads across many
  range partitions instead of serializing one partition's window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.text import shingles


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, shared_ngrams, contaminated) for every document: the count
    of distinct k-gram shingles shared with ``benchmark`` (any text
    column named ``text_col``), and whether it meets ``min_overlap``.
    Drop contaminated docs by filtering; keep the counts for auditing."""
    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("s")
        ).distinct()
    )
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("s"),
    )
    shared = (
        doc_sh.join(F.broadcast(bench_sh), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("shared_ngrams"))  # distinct by construction
    )
    return (
        docs.select(id_col)
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce("shared_ngrams", F.lit(0)).cast("long")
            .alias("shared_ngrams"),
            (F.coalesce("shared_ngrams", F.lit(0)) >= min_overlap)
            .cast("long").alias("contaminated"),
        )
    )


def domain_stats(docs: DataFrame, domain_col: str = "source") -> DataFrame:
    """(domain, n_docs, total_chars, mean_chars) — one hash aggregation."""
    return docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.round(F.avg(F.length("text")), 7).alias("mean_chars"),
    )


def cap_per_domain(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep the first ``cap`` documents per domain (ascending
    ``order_col`` — deterministic survivors). Returns the surviving rows
    plus their within-domain rank.

    Two-phase plan (no per-domain global sort): a naive
    ``Window.partitionBy(domain)`` funnels a pathological single hot
    domain's every row through one partition's sort. Instead:

    1. range-partition + sort on ``(domain, order)`` — a hot domain spans
       MANY range partitions, each task sorts only its slice;
    2. per-(partition, domain) counts -> running within-domain offsets via
       a window over the tiny counts table (<= num_partitions rows per
       domain, never the data);
    3. within-partition ``row_number`` + offset = global within-domain
       rank; filter ``<= cap``. The offsets join is an aggregated small
       side, AQE broadcasts it while it fits.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        docs.repartitionByRange(
            num_partitions, F.col(domain_col), F.col(order_col)
        )
        .sortWithinPartitions(domain_col, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid", domain_col).count()
    w_off = (
        Window.partitionBy(domain_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "_pid",
        domain_col,
        F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off"),
    )
    w_rn = Window.partitionBy("_pid", domain_col).orderBy(F.asc(order_col))
    return (
        ranged.withColumn("_rn", F.row_number().over(w_rn))
        .join(offs, ["_pid", domain_col])
        .withColumn("domain_rank", (F.col("_off") + F.col("_rn")).cast("long"))
        .filter(F.col("domain_rank") <= int(cap))
        .select(*docs.columns, "domain_rank")
    )
