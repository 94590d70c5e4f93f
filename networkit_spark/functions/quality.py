"""Gopher-style document quality heuristics and cross-corpus paragraph
(chunk) deduplication — the filter battery every webtext training pipeline
runs between crawl ingest and tokenization.

Rule provenance (public): the repetition and outlier filters follow the
Gopher paper's published thresholds (Rae et al. 2021, table of quality
heuristics) and C4's cleanup spirit; the chunk-level dedup mirrors CCNet's
paragraph-hash dedup (Wenzek et al. 2019) with token-window chunks standing
in for newline paragraphs (the synthetic corpus has no newlines; the
delimiter is a parameter for real crawls).

Scale notes (10^12 docs):
- ``repetition_stats``: explode to (doc_id, ngram) -> one map-side-combined
  groupBy count -> per-doc max/window. The shuffle key (doc_id, ngram) is
  near-unique, so no skew; nothing leaves the JVM.
- ``quality_flags``: pure column expressions (higher-order array functions),
  zero shuffles.
- ``paragraph_dedup``: explode to (hash, doc_id, idx); the global
  first-occurrence survivor is one window over hash (or min_by) — a single
  shuffle on the chunk hash, the same shape as exact doc dedup. A hot hash
  (boilerplate chunk shared by 10^8 docs) lands on one partition: the
  min-row reduction is an aggregate, so map-side partial aggregation already
  collapses it before the shuffle.

Definitions (documented simplifications, identical in the DuckDB oracles):
- fraction of characters in the top n-gram = count(top) * len(top) /
  len(text)  (overlap-unaware proxy; ties broken by lexicographically
  smallest n-gram for cross-engine determinism);
- fraction of characters in duplicated n-grams = sum over n-grams with
  count >= 2 of count * len / len(text), capped at 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.text import (
    EN_STOPWORDS,
    portable_hash60,
    shingles,
    tokens,
)

# Gopher paper thresholds (Rae et al. 2021).
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_HITS = 2


def _grams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) exploded token n-grams (empty docs contribute nothing)."""
    return docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Per-doc repetition fractions: ``top{n}_frac`` for each n in
    ``top_ns`` (chars in the most frequent n-gram) and ``dup{n}_frac`` for
    each n in ``dup_ns`` (chars in all n-grams occurring >= 2 times),
    rounded to 7 decimals. Docs shorter than n grams score 0.0.

    Single-pass shape: every requested n's shingle array is built in ONE
    projection over the text column (tagged union), exploded once, counted
    in one map-side-combined groupBy — one scan + one shuffle regardless of
    how many n's are requested, which is what you want when this runs over
    10^12 documents."""
    all_ns = tuple(dict.fromkeys(tuple(top_ns) + tuple(dup_ns)))
    text = F.col(text_col)

    def _tag(n):
        # single-arg lambda: a 2-arg transform lambda would receive the
        # ARRAY INDEX as its second argument, not the closure default
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged_arrays = [F.transform(shingles(text, n), _tag(n)) for n in all_ns]
    exploded = docs.select(
        F.col(id_col),
        F.length(text).alias("_chars"),
        F.explode(F.concat(*tagged_arrays)).alias("tg"),
    ).select(id_col, "_chars", F.col("tg.n").alias("n"), F.col("tg.gram").alias("gram"))
    counts = exploded.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("c")
    )
    out = docs.select(id_col, F.length(text).alias("_chars"))
    w = Window.partitionBy(id_col, "n").orderBy(F.desc("c"), F.asc("gram"))
    tops = (
        counts.filter(F.col("n").isin(list(top_ns)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "n", (F.col("c") * F.length("gram")).alias("tl"))
    )
    dups = (
        counts.filter(F.col("n").isin(list(dup_ns)) & (F.col("c") >= 2))
        .groupBy(id_col, "n")
        .agg(F.sum(F.col("c") * F.length("gram")).alias("dl"))
    )
    for n in top_ns:
        t = tops.filter(F.col("n") == n).select(id_col, F.col("tl").alias(f"_t{n}"))
        out = out.join(t, id_col, "left").withColumn(
            f"top{n}_frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col(f"_t{n}"), F.lit(0))
                    / F.greatest(F.col("_chars"), F.lit(1)),
                ),
                7,
            ),
        ).drop(f"_t{n}")
    for n in dup_ns:
        d = dups.filter(F.col("n") == n).select(id_col, F.col("dl").alias(f"_d{n}"))
        out = out.join(d, id_col, "left").withColumn(
            f"dup{n}_frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col(f"_d{n}"), F.lit(0))
                    / F.greatest(F.col("_chars"), F.lit(1)),
                ),
                7,
            ),
        ).drop(f"_d{n}")
    return out.drop("_chars")


def quality_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc Gopher outlier flags (1 = passes the rule) + ``keep``.

    Columns: n_words, flag_words (MIN_WORDS <= n <= MAX_WORDS), flag_mwl
    (mean word length in [3, 10]), flag_symbols (('#' + '...') per word
    <= 0.1), flag_alpha (>= 80% of words contain a letter), flag_stop
    (>= 2 distinct English stopwords present), keep (all flags)."""
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    nz = F.greatest(n_words, F.lit(1))
    mwl = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    ) / nz
    text = F.col(text_col)
    n_hash = (F.length(text) - F.length(F.regexp_replace(text, "#", ""))).cast("long")
    # each non-overlapping '...' (3 chars) becomes 'xxxx' (4 chars): +1 per hit
    n_ell = (
        F.length(F.regexp_replace(text, r"\.\.\.", "xxxx")) - F.length(text)
    ).cast("long")
    sym_ratio = (n_hash + n_ell) / nz
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / nz
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_hits = F.size(
        F.filter(sw, lambda s: F.array_contains(F.transform(toks, F.lower), s))
    )
    flags = {
        "flag_words": (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        "flag_mwl": (mwl >= MIN_MEAN_WORD_LEN) & (mwl <= MAX_MEAN_WORD_LEN),
        "flag_symbols": sym_ratio <= MAX_SYMBOL_WORD_RATIO,
        "flag_alpha": alpha_frac >= MIN_ALPHA_WORD_FRAC,
        "flag_stop": stop_hits >= MIN_STOPWORD_HITS,
    }
    cols = [F.col(id_col), n_words.cast("long").alias("n_words")]
    keep = F.lit(True)
    for name, expr in flags.items():
        cols.append(expr.cast("long").alias(name))
        keep = keep & expr
    cols.append(keep.cast("long").alias("keep"))
    return docs.select(*cols)


def doc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """(id, chunk_idx, chunk) — consecutive ``window``-token chunks (ragged
    tail included), lowercased and space-joined. The CCNet 'paragraph' unit
    for corpora without newlines; pass a real delimiter split upstream for
    crawls that have them."""
    toks = tokens(F.lower(F.col(text_col)))
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    # guard: sequence(0, -1) would yield a DESCENDING range for empty docs
    idx = F.explode(
        F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("chunk_idx")
    out = docs.select(F.col(id_col), toks.alias("_toks"), idx)
    return out.select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_toks"), F.col("chunk_idx") * window + 1, window), " "
        ).alias("chunk"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """CCNet-style cross-corpus chunk dedup: every chunk keeps only its
    globally-first occurrence (min (doc_id, chunk_idx) per chunk hash).
    Returns (id, chunk_idx, h, keep)."""
    ch = doc_chunks(docs, id_col, text_col, window).select(
        id_col, "chunk_idx", portable_hash60(F.col("chunk")).alias("h")
    )
    w = Window.partitionBy("h").orderBy(F.asc(id_col), F.asc("chunk_idx"))
    return ch.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("long")
    )


def paragraph_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """Per-doc chunk-dedup summary: (id, n_chunks, n_kept, removed_frac)."""
    pd_ = paragraph_dedup(docs, id_col, text_col, window)
    return pd_.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.round(
            (F.count("*") - F.sum("keep")) / F.count("*"), 7
        ).alias("removed_frac"),
    )
