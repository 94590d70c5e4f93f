"""WARC segment reader/writer: roundtrip byte-identity on html, frozen-text
invariant, gzip member handling, and the full WARC -> edges ingest chain."""

import gzip
import os

from pyspark.sql import functions as F

from networkit_spark.sources.pages import build_edges, extract_text, synth_pages
from networkit_spark.sources.warc import read_warc, write_warc


def _roundtrip(spark, tmp_path, n=40):
    pages = synth_pages(spark, n)
    out = str(tmp_path / "warc")
    write_warc(pages, out)
    return pages, read_warc(spark, out, lang="en")


def test_warc_roundtrip_html_bytes(spark, tmp_path):
    pages, back = _roundtrip(spark, tmp_path)
    a = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    b = {r.url: bytes(r.html) for r in back.select("url", "html").collect()}
    assert a == b


def test_warc_text_invariant(spark, tmp_path):
    _, back = _roundtrip(spark, tmp_path)
    for r in back.select("html", "text").collect():
        assert r.text == extract_text(bytes(r.html).decode("utf-8"))


def test_warc_timestamps_preserved(spark, tmp_path):
    pages, back = _roundtrip(spark, tmp_path)
    a = {r.url: r.warc_ts for r in pages.select("url", "warc_ts").collect()}
    b = {r.url: r.warc_ts for r in back.select("url", "warc_ts").collect()}
    assert a == b


def test_warc_gzip_members(spark, tmp_path):
    pages, _ = _roundtrip(spark, tmp_path)
    src = str(tmp_path / "warc")
    gzdir = tmp_path / "warcgz"
    gzdir.mkdir()
    for fn in os.listdir(src):
        with open(os.path.join(src, fn), "rb") as f:
            (gzdir / (fn + ".gz")).write_bytes(gzip.compress(f.read()))
    back = read_warc(spark, str(gzdir))
    assert back.count() == pages.count()
    a = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    b = {r.url: bytes(r.html) for r in back.select("url", "html").collect()}
    assert a == b


def test_warc_to_edges_chain(spark, tmp_path):
    """WARC-ingested pages produce the identical edge table as the direct
    synthesized pages (the whole ingest contract, end to end)."""
    pages, back = _roundtrip(spark, tmp_path)
    _, e_direct = build_edges(pages)
    _, e_warc = build_edges(back)
    a = sorted((r.src, r.dst) for r in e_direct.collect())
    b = sorted((r.src, r.dst) for r in e_warc.collect())
    assert a == b and len(a) > 0


def test_cdx_index_and_random_access(spark, tmp_path):
    """write_warc returns a record index; cdx_index SURT-sorts it; a
    CDX-driven point lookup fetches exactly the requested records."""
    from networkit_spark.sources.warc import cdx_index, read_warc_records

    pages = synth_pages(spark, 40)
    out = str(tmp_path / "warc_idx")
    idx = write_warc(pages, out)
    assert idx.count() == 40
    cdx = cdx_index(idx)
    surts = [r.surt for r in cdx.collect()]
    assert surts == sorted(surts) and surts[0].startswith("example,site")
    # point-fetch 5 urls through the index
    want = {r.url for r in pages.select("url").limit(5).collect()}
    sub = idx.filter(F.col("url").isin(list(want)))
    got = read_warc_records(spark, sub)
    fetched = {r.url: bytes(r.html) for r in got.collect()}
    direct = {
        r.url: bytes(r.html)
        for r in pages.filter(F.col("url").isin(list(want))).collect()
    }
    assert fetched == direct


def test_wet_roundtrip_text(spark, tmp_path):
    from networkit_spark.sources.warc import read_wet, write_wet

    pages = synth_pages(spark, 30)
    out = str(tmp_path / "wet")
    write_wet(pages, out)
    back = read_wet(spark, out)
    a = {r.url: r.text for r in pages.select("url", "text").collect()}
    b = {r.url: r.text for r in back.select("url", "text").collect()}
    assert a == b


def test_wat_links_match_extract_links(spark, tmp_path):
    from networkit_spark.sources.pages import extract_links
    from networkit_spark.sources.warc import read_wat_links, write_wat

    pages = synth_pages(spark, 30)
    out = str(tmp_path / "wat")
    write_wat(pages, out)
    links_wat = read_wat_links(spark, out)
    a = sorted((r.src_url, r.dst_url) for r in extract_links(pages).collect())
    b = sorted((r.src_url, r.dst_url) for r in links_wat.collect())
    assert a == b and len(a) > 0
