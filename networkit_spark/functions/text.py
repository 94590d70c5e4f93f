"""Text analysis: language ID, quality scoring, token counting, fingerprints.

All JVM-side column expressions (split / regexp / aggregate HOFs) — no
Python in the hot path. Designed over a ``documents(doc_id, text, lang, ...)``
table but applicable to any string column.

Hash note: the portable 60-bit hash used for fingerprints/minhash is
``int(md5(x)[:15], 16)`` — identical in Spark
(``conv(substr(md5(x),1,15),16,10)``) and ANSI-SQL oracles, unlike
``xxhash64`` whose seeds differ across engines. For pure-Spark pipelines
:func:`networkit_spark.functions.dedup` also offers xxhash64 variants
(faster, no md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small stopword list (top English function words) — the language-ID and
# quality heuristics only need relative rates, not linguistic completeness.
EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "was", "on", "are", "as", "with", "be", "by", "at", "this",
]
DE_STOPWORDS = [
    "der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "nicht",
    "ein", "eine", "auf", "für", "im", "des", "dem", "sich",
]
ES_STOPWORDS = [
    "el", "la", "de", "que", "y", "en", "los", "del", "se", "las",
    "por", "un", "una", "con", "para", "es", "al", "lo", "como", "más",
]
FR_STOPWORDS = [
    "le", "la", "les", "de", "des", "et", "est", "dans", "que", "qui",
    "une", "pour", "sur", "pas", "au", "plus", "par", "avec", "ce", "sont",
]


def portable_hash60(col: Column) -> Column:
    """60-bit deterministic hash, identical in Spark and DuckDB oracles."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (array<string>), empty strings removed."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_tokens_bpe_ish(col: Column) -> Column:
    """BPE-ish pre-tokenization: split into word pieces / numbers /
    punctuation runs (the GPT-2 pre-tokenizer shape, simplified)."""
    return F.filter(
        F.split(col, r"(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"),
        lambda t: (t != "") & (t != " "),
    )


def _rate(sub_count: Column, total: Column) -> Column:
    return F.when(total > 0, sub_count.cast("double") / total).otherwise(0.0)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return _rate(hits, F.size(toks))


def punct_ratio(col: Column) -> Column:
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^\p{Punct}]", ""))
    return _rate(punct, total)


def uppercase_ratio(col: Column) -> Column:
    total = F.length(F.regexp_replace(col, r"[^\p{L}]", ""))
    upper = F.length(F.regexp_replace(col, r"[^\p{Lu}]", ""))
    return _rate(upper, total)


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / F.size(toks),
    ).otherwise(0.0)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation + sane word length (Gopher/C4-style rule shapes,
    simplified to engine-checkable arithmetic)."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    sw = stopword_ratio(col)
    sw_ok = F.when(sw >= 0.05, 1.0).otherwise(sw / 0.05)
    pr = punct_ratio(col)
    punct_ok = F.when(pr <= 0.2, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (pr - 0.2) * 4))
    mwl = mean_word_length(col)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    return (len_ok + sw_ok + punct_ok + mwl_ok) / 4.0


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID (en/de/es/fr/unknown) — the n-gram-heuristic
    family as stopword-rate features; argmax with a 1% floor, deterministic
    priority en > de > es > fr on exact ties (strict > chain)."""
    en = stopword_ratio(col, EN_STOPWORDS)
    de = stopword_ratio(col, DE_STOPWORDS)
    es = stopword_ratio(col, ES_STOPWORDS)
    fr = stopword_ratio(col, FR_STOPWORDS)
    return (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0.01), "en")
        .when((de >= es) & (de >= fr) & (de > 0.01), "de")
        .when((es >= fr) & (es > 0.01), "es")
        .when(fr > 0.01, "fr")
        .otherwise("unknown")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic 60-bit document fingerprint over normalized text
    (lowercase, whitespace-collapsed) — exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return portable_hash60(norm)


def shingles(col: Column, k: int = 3) -> Column:
    """Array of k-token shingles (space-joined) — minhash/Jaccard input.
    Built with JVM HOFs: transform over token index range + slice."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    # guard: sequence(1, 0) would count DOWN in Spark — short docs get []
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stats table."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars_computed"),
        F.round(stopword_ratio(c), 7).alias("stopword_ratio"),
        F.round(punct_ratio(c), 7).alias("punct_ratio"),
        F.round(quality_score(c), 7).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )
