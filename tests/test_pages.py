import hashlib

import pandas as pd
from pyspark.sql import functions as F

from networkit_spark.sources.pages import (
    build_edges,
    encode_nodes,
    extract_links,
    extract_text,
    extract_text_batch,
    synth_pages,
)

HTML_CASES = [
    "<html><head><title>t</title></head><body><p>Hello  world</p></body></html>",
    '<html><script>var x = "<p>not text</p>";</script><body>A<b>B</b>C</body></html>',
    "<html><style>p { color: red }</style><body> spaced   out \n lines </body></html>",
    "<html><body><a href=\"https://x.example/1\">link text</a> tail</body></html>",
    "",
]


def test_extract_text_frozen_goldens():
    """Byte-level goldens for the frozen extractor — regenerate ONLY with a
    deliberate extractor change (input_hint: byte-identical per url)."""
    digests = [hashlib.md5(extract_text(h).encode()).hexdigest()[:12] for h in HTML_CASES]
    assert digests == [
        "e894146fa65e",  # "t Hello world"
        "0ef78513b0cb",  # "A B C" (script dropped)
        "516edd4f93f4",  # "spaced out lines"
        "9b22d1e3277f",  # "link text tail"
        "d41d8cd98f00",  # ""
    ]


def test_extract_text_batch_byte_identical():
    s = extract_text_batch(pd.Series(HTML_CASES))
    for html, batched in zip(HTML_CASES, s):
        assert batched == extract_text(html)


def test_pages_text_column_satisfies_invariant(spark):
    """pages.text == extract_text(pages.html) byte-identically per url."""
    pages = synth_pages(spark, 200)
    rows = pages.select("url", F.decode("html", "UTF-8").alias("h"), "text").collect()
    assert len(rows) == 200
    for r in rows:
        assert r["text"] == extract_text(r["h"]), r["url"]


def test_extract_links_match_arithmetic_rules(spark):
    from networkit_spark.sources.pages import N_HUBS

    n = 100
    pages = synth_pages(spark, n)
    links = extract_links(pages).collect()
    got = {(r["src_url"], r["dst_url"]) for r in links}

    def url(i):
        return f"https://site{i % 97}.example/p/{i}"

    expect = set()
    for i in range(n):
        targets = {(2 * i + 1) % n, (3 * i + 7) % n}
        if i % 3 == 0:
            targets.add((7 * i + 3) % n)
        if i % 5 != 0:
            targets.add(i % N_HUBS)
        targets.discard(i)
        for t in targets:
            expect.add((url(i), url(t)))
    assert got == expect


def test_encode_nodes_lexicographic_dense(spark):
    pages = synth_pages(spark, 50)
    nodes = encode_nodes(pages.select("url"))
    rows = sorted((r["id"], r["url"]) for r in nodes.collect())
    urls = [u for _, u in rows]
    assert urls == sorted(urls)  # id order == lexicographic url order
    assert [i for i, _ in rows] == list(range(50))


def test_build_edges_ids_consistent(spark):
    pages = synth_pages(spark, 80)
    nodes, edges = build_edges(pages)
    n = nodes.count()
    assert n == 80
    bad = edges.filter((F.col("src") < 0) | (F.col("src") >= n) | (F.col("dst") < 0) | (F.col("dst") >= n))
    assert bad.count() == 0
    assert edges.filter("src = dst").count() == 0


def test_table_catalog_parquet_fallback(spark, tmp_path):
    """Iceberg facade: no iceberg jars in this container -> parquet fallback
    with identical read/write/exists semantics (on a cluster with the
    iceberg runtime the same calls produce real Iceberg tables)."""
    from networkit_spark.graph import edges_df
    from networkit_spark.sources.catalog import TableCatalog, iceberg_available

    assert iceberg_available(spark) is False  # this container
    cat = TableCatalog(spark, warehouse=str(tmp_path / "wh"))
    e = edges_df(spark, [(0, 1), (1, 2)])
    assert not cat.exists("graph.edges")
    cat.write(e, "graph.edges")
    assert cat.exists("graph.edges")
    back = cat.read("graph.edges")
    assert {(r["src"], r["dst"]) for r in back.collect()} == {(0, 1), (1, 2)}
    cat.write(e, "graph.edges", mode="append")
    assert cat.read("graph.edges").count() == 4
