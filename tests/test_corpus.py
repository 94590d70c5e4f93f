"""Corpus hygiene (functions/corpus.py): decontamination counts, domain
stats, and per-domain caps on hand-built corpora."""

from networkit_spark.functions.corpus import (
    cap_per_domain,
    decontaminate,
    domain_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_counts(spark):
    docs = _docs(spark, [
        (0, "the quick brown fox jumps", "a"),      # shares 'the quick brown', 'quick brown fox'
        (1, "totally different words here now", "a"),
        (2, "quick brown fox jumps high", "b"),     # shares 'quick brown fox'... and 'brown fox jumps'
    ])
    bench = _docs(spark, [(99, "the quick brown fox", "x")])
    out = {r.doc_id: (r.shared_ngrams, r.contaminated)
           for r in decontaminate(docs, bench, k=3).collect()}
    # bench 3-grams: {'the quick brown', 'quick brown fox'}
    assert out[0] == (2, 1)
    assert out[1] == (0, 0)
    assert out[2] == (1, 1)


def test_decontaminate_min_overlap(spark):
    docs = _docs(spark, [(0, "the quick brown fox jumps", "a")])
    bench = _docs(spark, [(99, "the quick brown fox", "x")])
    out = decontaminate(docs, bench, k=3, min_overlap=3).collect()[0]
    assert out.shared_ngrams == 2 and out.contaminated == 0


def test_domain_stats(spark):
    docs = _docs(spark, [
        (0, "aa", "x"), (1, "bbbb", "x"), (2, "cc", "y"),
    ])
    out = {r.domain: (r.n_docs, r.total_chars, r.mean_chars)
           for r in domain_stats(docs).collect()}
    assert out == {"x": (2, 6, 3.0), "y": (1, 2, 2.0)}


def test_cap_per_domain(spark):
    docs = _docs(spark, [
        (5, "a", "x"), (3, "b", "x"), (9, "c", "x"), (2, "d", "y"),
    ])
    out = sorted((r.doc_id, r.domain_rank)
                 for r in cap_per_domain(docs, cap=2, domain_col="source").collect())
    assert out == [(2, 1), (3, 1), (5, 2)]  # 9 dropped (rank 3 in x)
