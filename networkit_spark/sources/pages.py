"""Common-Crawl-style pages source: synthesis, text extraction, href parsing.

Input schema (BASELINE.json input_hint):
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

Three pieces:

1. ``extract_text`` — THE frozen pure extractor. The invariant (input_hint) is
   that the ``text`` column equals ``extract_text(html)`` byte-identically per
   url, whether computed single-node (oracle) or distributed (pandas UDF).
   Both paths share the same compiled ``re`` patterns (pandas ``.str.replace``
   uses Python's ``re`` engine), so byte-identity holds by construction.

2. ``synth_pages`` — deterministic page synthesizer (seed-free arithmetic; the
   link structure is a pure function of the page id), mirroring the reference's
   graph generators (``networkit/generators.pyx``) but producing *pages whose
   hrefs encode the graph*: page ``i`` links to

   - ``(2i+1) mod n`` and ``(3i+7) mod n``            (ring-ish expander),
   - ``(7i+3) mod n``       when ``i % 3 == 0``        (degree variation),
   - ``i mod n_hubs``       when ``i % 5 != 0``        (hub in-degree skew —
     the web-graph power-law stand-in that exercises skew-join handling).

   Self-links are dropped. Every rule is plain integer arithmetic so an
   ANSI-SQL oracle can recompute the expected edge set exactly.

3. ``extract_links`` / ``build_edges`` — vectorized href extraction
   (JVM-side ``regexp_extract_all`` — no Python in the hot path) and
   dictionary encoding of urls to dense node ids
   (reference analog: ``cpp/io/EdgeListReader.cpp:65-83`` string->id map +
   ``GraphTools::getContinuousNodeIds``, ``cpp/graph/GraphTools.cpp:432-439``).

Scale notes: ``synth_pages`` is ``spark.range`` + column expressions — fully
parallel, no data motion. ``build_edges``'s only shuffles are (a) the global
sort assigning deterministic dense ids (one-time ingest cost; on a cluster this
is a range-partitioned sort writing the node dictionary once) and (b) the
dictionary join, which Catalyst broadcasts while the dictionary fits
(<= ~8GB with AQE) and otherwise runs as a shuffle join on ``url`` — both
scale linearly with executors.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Frozen text extractor (single-node oracle == distributed kernel)
# ---------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: str) -> str:
    """Frozen pure extractor: drop script/style, strip tags, collapse ws.

    Byte-identical per url across single-node and distributed execution
    (input_hint invariant). Do not change without regenerating golden hashes
    in tests/test_pages.py.
    """
    no_script = _SCRIPT_RE.sub(" ", html)
    no_tags = _TAG_RE.sub(" ", no_script)
    return _WS_RE.sub(" ", no_tags).strip()


def extract_text_batch(html: pd.Series) -> pd.Series:
    """Vectorized twin of :func:`extract_text` (same ``re`` patterns)."""
    s = html.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:  # pragma: no cover - thin
    return extract_text_batch(html)


# ---------------------------------------------------------------------------
# 2. Deterministic synthetic corpus
# ---------------------------------------------------------------------------

N_HUBS = 20
_EPOCH = "2025-01-01 00:00:00"


def page_url(id_col):
    """url for page id: https://site{id%97}.example/p/{id}."""
    return F.concat(
        F.lit("https://site"),
        (F.col(id_col) % 97).cast("string"),
        F.lit(".example/p/"),
        F.col(id_col).cast("string"),
    )


def link_targets(n_pages: int, n_hubs: int = N_HUBS):
    """Array column of out-link target ids for page ``id`` (arithmetic rules)."""
    i = F.col("id")
    n = F.lit(n_pages)
    base = F.array((i * 2 + 1) % n, (i * 3 + 7) % n)
    extra = F.when(i % 3 == 0, F.array((i * 7 + 3) % n)).otherwise(F.array())
    hub = F.when(i % 5 != 0, F.array(i % F.lit(n_hubs))).otherwise(F.array())
    targets = F.concat(base, extra, hub)
    # drop self-links, dedupe targets within a page
    return F.array_distinct(F.filter(targets, lambda t: t != i))


def synth_pages(spark: SparkSession, n_pages: int, n_hubs: int = N_HUBS) -> DataFrame:
    """Deterministic pages table. Pure ``spark.range`` + column exprs (no UDF).

    The html embeds one ``<a href>`` per link target; ``text`` is set to
    ``extract_text(html)`` via the frozen extractor so the corpus satisfies
    the per-url byte-identity invariant from day one.
    """
    df = spark.range(n_pages).withColumn("targets", link_targets(n_pages, n_hubs))
    anchors = F.array_join(
        F.transform(
            F.col("targets"),
            lambda t: F.concat(
                F.lit('<a href="https://site'),
                (t % 97).cast("string"),
                F.lit(".example/p/"),
                t.cast("string"),
                F.lit('">link</a>'),
            ),
        ),
        "",
    )
    html = F.concat(
        F.lit("<html><head><title>p"),
        F.col("id").cast("string"),
        F.lit("</title><script>var x=1;</script></head><body><p>Page "),
        F.col("id").cast("string"),
        F.lit(" filler text."),
        F.lit("</p>"),
        anchors,
        F.lit("</body></html>"),
    )
    pages = df.select(
        page_url("id").alias("url"),
        (F.to_timestamp(F.lit(_EPOCH)) + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("id").cast("double"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        html.alias("_html_str"),
        F.when(F.col("id") % 50 == 0, "de").otherwise("en").alias("lang"),
    )
    # text MUST equal extract_text(html) byte-identically: compute it with the
    # distributed twin of the frozen extractor.
    pages = pages.withColumn("text", extract_text_udf(F.col("_html_str"))).drop("_html_str")
    return pages.select("url", "warc_ts", "html", "text", "lang")


# ---------------------------------------------------------------------------
# 3. Href extraction + dictionary encoding -> canonical edge table
# ---------------------------------------------------------------------------

HREF_PATTERN = r'<a\s+href="([^"]+)"'


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) pairs from the html column, all JVM-side.

    ``regexp_extract_all`` + ``explode`` stay inside WholeStageCodegen; no
    Python crosses the hot path (input_hint: no per-row Python).
    """
    html_str = F.decode(F.col("html"), "UTF-8")
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), F.lit(1))).alias("dst_url"),
        )
        .filter(F.col("src_url") != F.col("dst_url"))
        .dropDuplicates(["src_url", "dst_url"])
    )


def encode_nodes(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Dictionary-encode urls -> dense ids [0, n) deterministically.

    Deterministic rule: ids follow the lexicographic order of the url string.
    Reference analog: ``EdgeListReader.cpp:65-83`` (insertion-order map) +
    ``GraphTools::getContinuousNodeIds`` — we pick sort order instead of
    insertion order because it is reproducible under any parallelism.

    Scale: distributed range-partitioned sort + per-partition offsets
    (``plans/ids.py``) — no single-partition stage; the resulting
    ``nodes(id, url)`` dictionary is written once and reused by every kernel.
    """
    from networkit_spark.plans.ids import dense_ids

    return dense_ids(urls, url_col).select("id", F.col(url_col).alias("url"))


def build_edges(pages: DataFrame, nodes: DataFrame | None = None):
    """pages -> (nodes, edges) with ``edges(src long, dst long, weight double)``.

    The node dictionary covers *all* page urls (not only linked ones) so
    isolated pages keep their teleport mass (reference: ``PageRank.cpp:26-28``
    iterates all nodes; ``PLP.cpp:50-61`` keeps isolated nodes as singletons).
    """
    links = extract_links(pages)
    if nodes is None:
        nodes = encode_nodes(pages.select("url"))
    src_dict = nodes.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_dict = nodes.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    edges = (
        links.join(src_dict, "src_url")
        .join(dst_dict, "dst_url")
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    return nodes, edges
