"""Webtext additions: URL canonicalization/SURT, host graph + rankings,
Gopher repetition/quality battery, CCNet-style chunk dedup."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.functions.quality import (
    paragraph_dedup,
    paragraph_dedup_stats,
    quality_flags,
    repetition_stats,
)
from networkit_spark.functions.webgraph import (
    canonicalize_url,
    domain_graph,
    host_graph,
    host_harmonic,
    host_pagerank,
    registered_domain,
    surt_key,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r.asDict()
        for r in df.select(
            canonicalize_url(F.col("url")).alias("c"),
            surt_key(F.col("url")).alias("s"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    ]


def test_canonicalize_rules(spark):
    rows = _canon(
        spark,
        [
            "HTTPS://Example.COM:443/a/b#frag",   # default port + fragment
            "http://example.com:8080/x?q=1",       # non-default port kept
            "https://sub.Example.com",             # empty path -> /
            "http://example.com:80/p?",            # default port + empty query
        ],
    )
    assert rows[0]["c"] == "https://example.com/a/b"
    assert rows[1]["c"] == "http://example.com:8080/x?q=1"
    assert rows[2]["c"] == "https://sub.example.com/"
    assert rows[3]["c"] == "http://example.com/p"
    assert rows[0]["s"] == "com,example)/a/b"
    assert rows[2]["s"] == "com,example,sub)/"
    assert rows[2]["h"] == "sub.example.com"


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [("a.b.example.co",), ("example.com",), ("localhost",)], ["h"]
    )
    got = [r[0] for r in df.select(registered_domain(F.col("h"))).collect()]
    assert got == ["example.co", "example.com", "localhost"]


def test_host_graph_aggregation(spark):
    links = spark.createDataFrame(
        [
            ("https://a.example/1", "https://b.example/x"),
            ("https://a.example/2", "https://b.example/y"),
            ("https://a.example/1", "https://a.example/2"),  # intra-host
            ("https://b.example/x", "https://a.example/1"),
        ],
        ["src_url", "dst_url"],
    )
    hg = {(r.src_host, r.dst_host): r.weight for r in host_graph(links).collect()}
    assert hg == {("a.example", "b.example"): 2.0, ("b.example", "a.example"): 1.0}
    dg = {
        (r.src_domain, r.dst_domain): r.weight
        for r in domain_graph(links).collect()
    }
    # a.example and b.example share no registered domain here (single-label
    # rule keeps them distinct at two labels)
    assert dg[("a.example", "b.example")] == 2.0


def test_host_rankings_sane(spark):
    links = spark.createDataFrame(
        [
            ("https://a.x/1", "https://hub.x/"),
            ("https://b.x/1", "https://hub.x/"),
            ("https://c.x/1", "https://hub.x/"),
            ("https://hub.x/", "https://a.x/1"),
        ],
        ["src_url", "dst_url"],
    )
    hg = host_graph(links)
    pr = {r.host: r.score for r in host_pagerank(hg, iterations=10).collect()}
    assert pytest.approx(sum(pr.values()), abs=1e-9) == 1.0
    # hub receives 3 in-links; a.x receives hub's entire out-mass — both far
    # above the leaf hosts b/c
    assert pr["hub.x"] > pr["b.x"] and pr["a.x"] > pr["b.x"]
    hc = {r.host: r.score for r in host_harmonic(hg).collect()}
    assert hc["hub.x"] == max(hc.values())
    assert all(v > 0 for v in hc.values())


def test_repetition_stats_handcase(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" x3
    # chars = 11; top2 = 3 * len("a b") / 11 = 9/11
    docs = spark.createDataFrame([(0, "a b a b a b"), (1, "x y z w v")], ["doc_id", "text"])
    out = {r.doc_id: r.asDict() for r in repetition_stats(docs).collect()}
    assert out[0]["top2_frac"] == pytest.approx(round(9 / 11, 7))
    assert out[1]["top2_frac"] == pytest.approx(round(3 / 9, 7))
    assert out[1]["dup5_frac"] == 0.0
    # doc 0: 5-grams "a b a b a" x1, "b a b a b" x1 -> no dup
    assert out[0]["dup5_frac"] == 0.0


def test_repetition_dup5(spark):
    text = "p q r s t p q r s t p q r s t"  # 5-gram "p q r s t" occurs 3x
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    row = repetition_stats(docs).collect()[0]
    # 11 distinct 5-gram positions; "p q r s t" 3x (len 9), others... capped sum
    assert row.dup5_frac > 0.5


def test_quality_flags(spark):
    short = "the a only few words"
    ok = " ".join(["the", "quick", "brown", "fox", "and"] * 12)  # 60 words
    symbols = "# " * 60
    docs = spark.createDataFrame(
        [(0, short), (1, ok), (2, symbols)], ["doc_id", "text"]
    )
    out = {r.doc_id: r.asDict() for r in quality_flags(docs).collect()}
    assert out[0]["flag_words"] == 0 and out[0]["keep"] == 0
    assert out[1]["flag_words"] == 1 and out[1]["flag_stop"] == 1
    assert out[1]["keep"] == 1
    assert out[2]["flag_symbols"] == 0 and out[2]["keep"] == 0


def test_paragraph_dedup_survivorship(spark):
    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, shared + " unique0 " + " ".join(f"x{i}" for i in range(9))),
            (1, shared + " unique1 " + " ".join(f"y{i}" for i in range(9))),
        ],
        ["doc_id", "text"],
    )
    rows = paragraph_dedup(docs).collect()
    kept = {(r.doc_id, r.chunk_idx): r.keep for r in rows}
    assert kept[(0, 0)] == 1  # first occurrence of the shared chunk
    assert kept[(1, 0)] == 0  # duplicate dropped
    assert kept[(0, 1)] == 1 and kept[(1, 1)] == 1
    stats = {r.doc_id: r.asDict() for r in paragraph_dedup_stats(docs).collect()}
    assert stats[1]["n_chunks"] == 2 and stats[1]["n_kept"] == 1
    assert stats[1]["removed_frac"] == 0.5


def test_paragraph_dedup_empty_doc(spark):
    docs = spark.createDataFrame([(0, ""), (1, "a b c")], ["doc_id", "text"])
    rows = paragraph_dedup(docs).collect()
    assert {r.doc_id for r in rows} == {1}
