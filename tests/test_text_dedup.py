from pyspark.sql import functions as F

from networkit_spark.functions.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_jaccard_estimate,
    minhash_lsh_candidates,
    ngram_jaccard,
    ngram_jaccard_all_pairs,
    simhash64,
    simhash_candidates,
)
from networkit_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    text_stats,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near dup
    (3, "der hund ist ein tier und die katze ist auch ein tier im haus"),
    (4, "completely different content about spark dataframes with partitions"),
    (5, ""),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_count_and_shingles(spark):
    df = docs_df(spark)
    row = df.filter("doc_id = 0").select(
        token_count(F.col("text")).alias("n"),
        F.size(shingles(F.col("text"), 3)).alias("sh"),
    ).first()
    assert row["n"] == 13
    assert row["sh"] == 11  # n - k + 1
    assert df.filter("doc_id = 5").select(token_count(F.col("text"))).first()[0] == 0


def test_exact_dedup(spark):
    df = docs_df(spark)
    dups = exact_duplicates(df).collect()
    assert len(dups) == 1
    assert dups[0]["size"] == 2 and dups[0]["keep_id"] == 0
    kept = dedup_exact(df)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 2, 3, 4, 5]  # 1 removed, 0 survives


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "other")], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_minhash_lsh_finds_near_dup(spark):
    df = docs_df(spark)
    cand = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df, num_hashes=16, bands=8).collect()}
    assert (0, 1) in cand  # exact dup always collides
    assert (0, 2) in cand or (1, 2) in cand  # near dup collides in some band
    est = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_jaccard_estimate(
            df, spark.createDataFrame([(0, 1), (0, 2), (0, 4)], "a long, b long")
        ).collect()
    }
    assert est[(0, 1)] == 1.0
    assert est[(0, 2)] > est[(0, 4)]


def test_ngram_jaccard_exact(spark):
    df = docs_df(spark)
    pairs = spark.createDataFrame([(0, 1), (0, 4)], "a long, b long")
    j = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard(df, pairs).collect()}
    assert j[(0, 1)] == 1.0
    assert j[(0, 4)] == 0.0
    allp = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_all_pairs(df, threshold=0.3).collect()}
    assert (0, 1) in allp and allp[(0, 1)] == 1.0
    assert (0, 2) in allp  # near dup above 0.3
    assert (0, 4) not in allp


def test_ngram_hot_shingle_cap(spark):
    """Planted hot shingle (round-2 verdict): a shingle shared by every doc
    must not by itself pair otherwise-unrelated docs when capped, while true
    near-dups (sharing rare shingles) survive. Denominators stay uncapped."""
    # every doc starts with the same 3 tokens -> shingle "common x y" in all
    docs = [(i, f"common hot shingle unique{i}a unique{i}b unique{i}c") for i in range(12)]
    # a planted near-dup pair sharing most rare shingles
    docs.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    docs.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_all_pairs(df, threshold=0.2, shingle_df_cap=8).collect()
    }
    assert (100, 101) in capped  # rare-shingle near-dup survives
    assert all(a == 100 for a, b in capped), capped  # hot-only pairs dropped
    # uncapped finds the hot-shingle pairs too (jaccard 1/11 < 0.2 though);
    # at threshold 0 the pair count difference is exactly the hot bucket
    uncapped = ngram_jaccard_all_pairs(df, threshold=0.0, shingle_df_cap=None).count()
    capped0 = ngram_jaccard_all_pairs(df, threshold=0.0, shingle_df_cap=8).count()
    assert uncapped == capped0 + (12 * 11) // 2
    # denominators (per-doc shingle counts) unaffected by the cap
    assert abs(capped[(100, 101)] - 5 / 7) < 1e-9


def test_simhash_near_dup(spark):
    df = docs_df(spark)
    sigs = {r["doc_id"]: r["s"] for r in df.select("doc_id", simhash64(F.col("text")).alias("s")).collect()}
    assert sigs[0] == sigs[1]
    cand = {(r["a"], r["b"]): r["hamming"] for r in simhash_candidates(df, max_hamming=16).collect()}
    assert cand.get((0, 1)) == 0
    assert (0, 2) in cand and cand[(0, 2)] <= 16


def test_lang_id_and_quality(spark):
    df = docs_df(spark)
    langs = {r["doc_id"]: r["l"] for r in df.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert langs[0] == "en"
    assert langs[3] == "de"
    q = {r["doc_id"]: r["q"] for r in df.select("doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert q[0] > 0.9
    assert q[5] < 0.5  # empty doc scores low


def test_text_stats_schema(spark):
    out = text_stats(docs_df(spark))
    cols = set(out.columns)
    assert {"n_tokens", "stopword_ratio", "punct_ratio", "quality", "lang_pred", "fp"} <= cols
    assert out.count() == len(DOCS)


def test_lang_id_es_fr(spark):
    rows = [
        (0, "el perro corre por la calle y los gatos se esconden en las casas"),
        (1, "le chat est dans les maisons et les chiens sont pour la plupart dehors"),
        (2, "the quick brown fox jumps over the lazy dog and runs to the barn"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.l for r in df.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert got == {0: "es", 1: "fr", 2: "en"}
