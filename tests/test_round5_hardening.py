"""Round-5 hardening: WARC malformed-segment tolerance, chunked/charset
HTTP payloads, the two-phase per-domain cap, and the crawl-ingest fixes
(nid-0 base, pending triangle deltas, distributed dictionary append)."""

import datetime

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.warc import (
    _dechunk,
    _iter_records,
    read_warc,
    warc_segment_stats,
)


def _record(url: str, payload: bytes, warc_type: str = "response") -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, extra: str = "Content-Type: text/html") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\n{extra}\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_warc_malformed_segment_skips_and_resyncs(spark, tmp_path):
    good1 = _record("https://a.example/p/1", _http(b"<html><p>one</p></html>"))
    garbage = b"NOT-A-RECORD lots of junk bytes here\r\n\r\nstill junk"
    bad_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.example/p/bad\r\n"
        b"Content-Length: NaN\r\n\r\n" + _http(b"<html>x</html>") + b"\r\n\r\n"
    )
    good2 = _record("https://a.example/p/2", _http(b"<html><p>two</p></html>"))
    truncated = _record("https://a.example/p/3", _http(b"<html>three</html>"))[:30]
    seg = garbage + b"\r\n" + good1 + bad_len + good2 + truncated
    p = tmp_path / "seg.warc"
    p.write_bytes(seg)

    pages = read_warc(spark, str(p)).collect()
    assert sorted(r.url for r in pages) == [
        "https://a.example/p/1",
        "https://a.example/p/2",
    ]
    assert b"one" in bytes(pages[0].html) or b"one" in bytes(pages[1].html)

    stats = warc_segment_stats(spark, str(p)).collect()[0]
    assert stats.records == 2
    assert stats.skipped >= 2  # garbage prefix + bad Content-Length
    assert stats.truncated == 1


def test_warc_truncated_header_tail(spark):
    seg = _record("https://a.example/p/1", _http(b"<html>ok</html>"))
    seg += b"WARC/1.0\r\nWARC-Type: resp"  # header cut mid-line
    stats: dict[str, int] = {}
    urls = [u for u, _, _, _ in _iter_records(seg, stats=stats)]
    assert urls == ["https://a.example/p/1"]
    assert stats == {"records": 1, "truncated": 1}


def test_warc_chunked_transfer_encoding(spark, tmp_path):
    body = b"4\r\n<htm\r\n8\r\nl>hello \r\n7\r\nchunked\r\n7\r\n</html>\r\n0\r\n\r\n"
    rec = _record(
        "https://c.example/p/1",
        _http(body, extra="Content-Type: text/html\r\nTransfer-Encoding: chunked"),
    )
    p = tmp_path / "chunked.warc"
    p.write_bytes(rec)
    row = read_warc(spark, str(p)).collect()[0]
    assert bytes(row.html) == b"<html>hello chunked</html>"
    assert "hello chunked" in row.text


def test_warc_charset_header_decodes_latin1(spark, tmp_path):
    body = "<html><p>caf\xe9</p></html>".encode("latin-1")
    rec = _record(
        "https://d.example/p/1",
        _http(body, extra="Content-Type: text/html; charset=ISO-8859-1"),
    )
    p = tmp_path / "latin1.warc"
    p.write_bytes(rec)
    row = read_warc(spark, str(p)).collect()[0]
    assert "caf\xe9" in row.text  # charset honored, not utf-8 mojibake
    assert bytes(row.html) == body  # html column stays the raw bytes


def test_dechunk_malformed_falls_back():
    raw = b"not chunked at all"
    assert _dechunk(raw) == raw
    assert _dechunk(b"0\r\n\r\n") == b""
    assert _dechunk(b"3\r\nabc\r\n0\r\n\r\n") == b"abc"


# ---------------------------------------------------------------------------
# cap_per_domain: two-phase plan
# ---------------------------------------------------------------------------


def test_cap_per_domain_matches_naive_window(spark):
    from networkit_spark.functions.corpus import cap_per_domain

    rows = [(i, f"dom{i % 7}", f"t{i}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r.doc_id, r.source, r.domain_rank)
        for r in cap_per_domain(docs, cap=5).collect()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
    want = sorted(
        (r.doc_id, r.source, r.domain_rank)
        for r in docs.withColumn(
            "domain_rank", F.row_number().over(w).cast("long")
        ).filter(F.col("domain_rank") <= 5).collect()
    )
    assert got == want and len(want) == 7 * 5


def test_cap_per_domain_hot_domain_spreads(spark):
    """A single pathological domain must NOT serialize one partition's
    sort: the within-partition window partitions on (_pid, domain)."""
    from networkit_spark.functions.corpus import cap_per_domain

    hot = [(i, "hot.example", "x") for i in range(5000)]
    cold = [(10_000 + 10 * d + i, f"cold{d}.example", "x") for d in range(20) for i in range(3)]
    docs = spark.createDataFrame(
        hot + cold, "doc_id long, source string, text string"
    )
    out = cap_per_domain(docs, cap=2, num_partitions=8)
    got = sorted((r.doc_id, r.source) for r in out.collect())
    want = sorted(
        [(0, "hot.example"), (1, "hot.example")]
        + [(10_000 + 10 * d + i, f"cold{d}.example") for d in range(20) for i in range(2)]
    )
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window in the plan is keyed by the range-partition id, never
    # by the domain alone
    assert "_pid" in plan


# ---------------------------------------------------------------------------
# crawl-ingest fixes
# ---------------------------------------------------------------------------


def _pages_df(spark, rows):
    ts = datetime.datetime(2024, 1, 1)
    data = [(u, ts, h.encode(), "", "en") for u, h in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_crawl_base_nid_zero_not_falsy(spark, tmp_path):
    """A dictionary holding exactly one url (nid 0) must hand the next
    batch ids starting at 1, not recycle 0."""
    from networkit_spark.streaming.crawl import apply_pages_batch, crawl_state

    state = str(tmp_path / "state")
    apply_pages_batch(
        spark, _pages_df(spark, [("https://a.example/p/0", "<html>no links</html>")]),
        state, 0,
    )
    d, _, _ = crawl_state(spark, state)
    assert [(r.url, r.nid) for r in d.collect()] == [("https://a.example/p/0", 0)]

    apply_pages_batch(
        spark, _pages_df(spark, [("https://a.example/p/1", "<html>no links</html>")]),
        state, 1,
    )
    d, _, _ = crawl_state(spark, state)
    got = sorted((r.url, r.nid) for r in d.collect())
    assert got == [("https://a.example/p/0", 0), ("https://a.example/p/1", 1)]


def test_crawl_pending_deltas_fold_every_batch(spark, tmp_path):
    """Two micro-batches applied before one refresh: both deltas count
    (the round-4 advice bug folded only the last batch's)."""
    from networkit_spark.operators.triangles import total_triangles
    from networkit_spark.streaming.crawl import (
        _symmetrize,
        apply_pages_batch,
        crawl_state,
        refresh_triangles,
    )

    def link(*urls):
        return "".join(f'<a href="{u}">x</a>' for u in urls)

    u = [f"https://t.example/p/{i}" for i in range(7)]
    state = str(tmp_path / "state")
    # batch 0: a triangle 0-1-2 -> seeds the running total via full count
    apply_pages_batch(
        spark,
        _pages_df(spark, [(u[0], link(u[1], u[2])), (u[1], link(u[2]))]),
        state, 0,
    )
    assert refresh_triangles(spark, state) == 1
    # two more batches, EACH closing one new triangle, then ONE refresh
    apply_pages_batch(
        spark, _pages_df(spark, [(u[3], link(u[0], u[1]))]), state, 1
    )
    apply_pages_batch(
        spark, _pages_df(spark, [(u[4], link(u[1], u[2]))]), state, 2
    )
    total = refresh_triangles(spark, state)
    assert total == 3
    _, e, _ = crawl_state(spark, state)
    assert total == total_triangles(_symmetrize(e))
    # consume-and-clear: a second refresh adds nothing
    assert refresh_triangles(spark, state) == 3


def test_crawl_large_batch_dense_ids(spark, tmp_path):
    """One big backfill batch: ids are dense [0, n) in ascending url order
    (distributed assignment), and the next batch continues past the max."""
    from networkit_spark.streaming.crawl import apply_pages_batch, crawl_state

    n = 5000
    urls = [f"https://b.example/p/{i:06d}" for i in range(n)]
    state = str(tmp_path / "state")
    apply_pages_batch(
        spark, _pages_df(spark, [(u, "<html>x</html>") for u in urls]), state, 0
    )
    d, _, _ = crawl_state(spark, state)
    got = sorted((r.url, r.nid) for r in d.collect())
    assert got == [(u, i) for i, u in enumerate(sorted(urls))]
    apply_pages_batch(
        spark,
        _pages_df(spark, [("https://b.example/p/zzz", "<html>x</html>")]),
        state, 1,
    )
    d, _, _ = crawl_state(spark, state)
    assert d.filter(F.col("url") == "https://b.example/p/zzz").first().nid == n


# ---------------------------------------------------------------------------
# Public Suffix List registered domains
# ---------------------------------------------------------------------------

_PSL = [
    "// test rules",
    "com",
    "uk",
    "co.uk",
    "com.au",
    "ck",
    "*.ck",
    "!www.ck",
]


def test_registered_domain_psl(spark):
    from networkit_spark.functions.webgraph import psl_rules, registered_domain_psl

    psl = psl_rules(spark, _PSL)
    hosts = spark.createDataFrame(
        [
            ("example.com",),          # com -> example.com
            ("a.b.example.com",),      # deepest rule still com
            ("example.co.uk",),        # co.uk -> example.co.uk (heuristic: co.uk)
            ("deep.example.co.uk",),
            ("example.com.au",),       # com.au -> example.com.au
            ("anything.foo.ck",),      # *.ck -> foo.ck is public -> anything.foo.ck
            ("www.ck",),               # !www.ck exception -> ck is suffix -> www.ck
            ("sub.www.ck",),           # exception: suffix ck -> www.ck
            ("localhost",),            # single label passes through
            ("host.unknown-tld",),     # implicit * rule -> host.unknown-tld
            ("co.uk",),                # IS a public suffix -> itself
        ],
        "host string",
    )
    got = {
        r.host: r.registered_domain
        for r in registered_domain_psl(hosts, psl).collect()
    }
    assert got == {
        "example.com": "example.com",
        "a.b.example.com": "example.com",
        "example.co.uk": "example.co.uk",
        "deep.example.co.uk": "example.co.uk",
        "example.com.au": "example.com.au",
        "anything.foo.ck": "anything.foo.ck",
        "www.ck": "www.ck",
        "sub.www.ck": "www.ck",
        "localhost": "localhost",
        "host.unknown-tld": "host.unknown-tld",
        "co.uk": "co.uk",
    }


def test_domain_graph_psl(spark):
    from networkit_spark.functions.webgraph import domain_graph, psl_rules

    psl = psl_rules(spark, _PSL)
    links = spark.createDataFrame(
        [
            ("https://a.example.co.uk/p/1", "https://b.other.co.uk/p/2"),
            ("https://c.example.co.uk/p/3", "https://b.other.co.uk/p/4"),
            ("https://x.example.com/p/1", "https://b.other.co.uk/p/9"),
            # intra-domain under PSL (both example.co.uk) -> dropped
            ("https://a.example.co.uk/p/1", "https://z.example.co.uk/p/5"),
        ],
        "src_url string, dst_url string",
    )
    got = sorted(
        (r.src_domain, r.dst_domain, r.weight)
        for r in domain_graph(links, psl=psl).collect()
    )
    assert got == [
        ("example.co.uk", "other.co.uk", 2.0),
        ("example.com", "other.co.uk", 1.0),
    ]
    # heuristic path (no psl) collapses both sides to co.uk and drops them
    heur = domain_graph(links)
    assert heur.filter(F.col("src_domain") == "co.uk").count() == 0


def test_host_harmonic_guard(spark):
    from networkit_spark.functions.webgraph import host_harmonic

    e = spark.createDataFrame(
        [("a.example", "b.example", 1.0), ("b.example", "c.example", 1.0)],
        "src_host string, dst_host string, weight double",
    )
    assert host_harmonic(e).count() == 3
    with pytest.raises(ValueError, match="host_harmonic_approx"):
        host_harmonic(e, max_nodes=2)


def test_wat_malformed_json_record_skipped(spark, tmp_path):
    from networkit_spark.sources.warc import read_wat_links

    good = _record(
        "https://w.example/p/1",
        b'{"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": '
        b'{"HTML-Metadata": {"Links": [{"url": "https://w.example/p/2"}]}}}}}',
        warc_type="metadata",
    )
    bad = _record("https://w.example/p/bad", b"{not json", warc_type="metadata")
    p = tmp_path / "seg.warc.wat"
    p.write_bytes(good + bad)
    got = [(r.src_url, r.dst_url) for r in read_wat_links(spark, str(p)).collect()]
    assert got == [("https://w.example/p/1", "https://w.example/p/2")]
