"""Webtext / Common-Crawl query registrations: host-graph contraction and
host-level ranking (the cc-webgraph artifact family), URL canonicalization /
SURT keys, Gopher-style repetition + quality filters, and CCNet-style
paragraph (chunk) dedup.

Oracle portability notes (same conventions as entry_queries_text): DuckDB
``regexp_replace`` defaults to first-match — every pattern used here matches
at most once per string (anchored) or uses plain ``replace``; Spark's
``regexp_replace`` is global but agrees on those cases. List indexing:
DuckDB ``sp[-1]`` == Spark ``element_at(sp, -1)``. ``list_slice`` end-index
inclusive == Spark ``slice(arr, start, length)`` with length = end-start+1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.entry_queries import _n_docs, register
from networkit_spark.entry_queries_text import SQL_SW
from networkit_spark.functions.quality import (
    paragraph_dedup_stats,
    quality_flags,
    repetition_stats,
)
from networkit_spark.functions.webgraph import (
    canonicalize_url,
    host_graph,
    host_harmonic,
    host_pagerank,
    registered_domain,
    surt_key,
    url_host,
)
from networkit_spark.sources.pages import build_edges, extract_links, synth_pages
from networkit_spark.testgraph import EDGES_BODY, EDGES_CTE, NN_CTE

# -- shared SQL fragments ----------------------------------------------------

# Host graph replayed arithmetically: page i lives on host site(i%97).example,
# so the host edge set is the id-level edge set mapped through i%97.
HOST_GRAPH_CTE = f"""{EDGES_CTE},
hg AS MATERIALIZED (
    SELECT 'site' || (src % 97) || '.example' AS src,
           'site' || (dst % 97) || '.example' AS dst,
           CAST(count(*) AS DOUBLE) AS weight
    FROM edges
    WHERE (src % 97) <> (dst % 97)
    GROUP BY 1, 2
),
hn AS (SELECT DISTINCT h AS node FROM (SELECT src AS h FROM hg UNION ALL SELECT dst AS h FROM hg)),
hc AS (SELECT count(*) AS n FROM hn)"""

# lowered whitespace tokens (quality battery + chunk dedup operate lowercased
# where the Spark twins do)
SQL_LTOKS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')"
SQL_RTOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


def _sql_grams(n: int) -> str:
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(generate_series(1, len(toks) - {n - 1}), "
        f"i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' ')) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# host graph + rankings
# ---------------------------------------------------------------------------

@register(
    "host_graph",
    f"""
WITH {HOST_GRAPH_CTE}
SELECT src AS src_host, dst AS dst_host, weight FROM hg
""",
)
def q_host_graph(spark, sf_dir):
    """Page links -> weighted host graph (the Common-Crawl host-webgraph
    contraction). Runs the REAL path: synth pages -> href extraction ->
    regexp host parse -> one map-side-combined groupBy."""
    n = _n_docs(spark, sf_dir)
    links = extract_links(synth_pages(spark, n))
    return host_graph(links)


@register(
    "host_pagerank_fixed10",
    f"""
WITH {HOST_GRAPH_CTE},
deg AS (SELECT src AS node, sum(weight) AS wdeg FROM hg GROUP BY 1),
contrib AS (SELECT hg.src, hg.dst, hg.weight / d.wdeg AS frac
            FROM hg JOIN deg d ON hg.src = d.node),
s0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS score FROM hn CROSS JOIN hc)
"""
    + "\n".join(
        f""", s{k} AS MATERIALIZED (
  SELECT hn.node,
         0.85*coalesce(t.m, CAST(0.0 AS DOUBLE)) + CAST(0.15 AS DOUBLE)/hc.n AS score
  FROM hn CROSS JOIN hc
  LEFT JOIN (SELECT c.dst, sum(c.frac * p.score) AS m
             FROM contrib c JOIN s{k - 1} p ON c.src = p.node
             GROUP BY c.dst) t ON hn.node = t.dst)"""
        for k in range(1, 11)
    )
    + """
, tot AS (SELECT sum(score) AS s FROM s10)
SELECT node AS host, round(score / s, 7) AS score FROM s10 CROSS JOIN tot
""",
)
def q_host_pagerank_fixed10(spark, sf_dir):
    """Weighted fixed-10 PageRank on the host graph — the Common-Crawl
    host-ranking artifact (same kernel/semantics as pagerank_fixed10,
    string host ids as join keys)."""
    n = _n_docs(spark, sf_dir)
    hg = host_graph(extract_links(synth_pages(spark, n)))
    return host_pagerank(hg, iterations=10).select(
        "host", F.round("score", 7).alias("score")
    )


def _host_harmonic_sql(rounds: int = 8) -> str:
    parts = [
        f"WITH {HOST_GRAPH_CTE}",
        """, hu AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM hg UNION ALL SELECT dst AS src, src AS dst FROM hg
  )
),
b0 AS (SELECT node AS source, node, 0 AS dist FROM hn)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""", b{k} AS MATERIALIZED (
  SELECT source, node, min(dist) AS dist FROM (
    SELECT source, node, dist FROM b{k - 1}
    UNION ALL
    SELECT b.source, e.dst AS node, b.dist + 1 AS dist
    FROM b{k - 1} b JOIN hu e ON b.node = e.src
  ) GROUP BY source, node
)"""
        )
    parts.append(
        f"""
SELECT hn.node AS host, round(coalesce(t.s, 0.0), 7) AS score
FROM hn LEFT JOIN (
  SELECT node, sum(1.0 / dist) AS s FROM b{rounds} WHERE dist > 0 GROUP BY node
) t ON hn.node = t.node
"""
    )
    return "\n".join(parts)


@register("host_harmonic", _host_harmonic_sql(8))
def q_host_harmonic(spark, sf_dir):
    """Exact harmonic centrality on the symmetrized host graph — the other
    Common-Crawl host ranking (cc-webgraph ranks hosts by harmonic
    centrality). Oracle unrolls 8 BFS waves; the contracted host graph's
    diameter is far below that."""
    n = _n_docs(spark, sf_dir)
    hg = host_graph(extract_links(synth_pages(spark, n)))
    _assert_host_ecc_within(hg, 8)
    return host_harmonic(hg).select("host", F.round("score", 7).alias("score"))


def _assert_host_ecc_within(hg, rounds: int) -> None:
    """Guard the oracle's fixed unroll depth: the SQL twin replays exactly
    ``rounds`` BFS waves, which is only equivalent to the engine's
    run-to-fixpoint BFS while the symmetrized host graph's eccentricity
    stays <= rounds. The gate graph is the ~100-host contraction, so a
    driver-side BFS sweep is trivially cheap; if the synth generator ever
    grows the diameter past the unroll, this fails loudly instead of the
    gate comparing wrong oracle values."""
    from collections import deque

    adj: dict[str, set[str]] = {}
    for r in hg.select("src_host", "dst_host").collect():
        adj.setdefault(r.src_host, set()).add(r.dst_host)
        adj.setdefault(r.dst_host, set()).add(r.src_host)
    ecc = 0
    for s in adj:
        seen = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        ecc = max(ecc, max(seen.values()))
    assert ecc <= rounds, (
        f"host graph eccentricity {ecc} exceeds the oracle's {rounds}-wave "
        f"unroll — regenerate _host_harmonic_sql with a deeper unroll"
    )


@register(
    "wat_host_graph",
    f"""
WITH {HOST_GRAPH_CTE}
SELECT src AS src_host, dst AS dst_host, weight FROM hg
""",
)
def q_wat_host_graph(spark, sf_dir):
    """Host graph built the way the public cc-pyspark webgraph jobs build
    it: from WAT metadata records only (no HTML parse on the read side) —
    pages are serialized to WAT segments, the link table is recovered from
    the JSON link metadata, then contracted to hosts. Must equal the
    arithmetic host-graph replay exactly."""
    import tempfile

    from networkit_spark.sources.warc import read_wat_links, write_wat

    n = _n_docs(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="wat_gate_") as td:
        write_wat(synth_pages(spark, n), td)
        links = read_wat_links(spark, td)
        out = host_graph(links).localCheckpoint(eager=True)
    return out


@register(
    "warc_ingest_edges",
    f"""
WITH {NN_CTE},
urls AS (
    SELECT doc_id AS id,
           'https://site' || (doc_id % 97) || '.example/p/' || doc_id AS url
    FROM documents
),
dict AS (SELECT id, dense_rank() OVER (ORDER BY url) - 1 AS nid FROM urls),
{EDGES_BODY}
SELECT d1.nid AS src, d2.nid AS dst, CAST(1.0 AS DOUBLE) AS weight
FROM edges e JOIN dict d1 ON e.src = d1.id JOIN dict d2 ON e.dst = d2.id
""",
)
def q_warc_ingest_edges(spark, sf_dir):
    """Full WARC ingest chain under the oracle: synthesize pages, serialize
    them as WARC segment files (`sources/warc.py`), parse the segments back
    (binaryFile + mapInPandas, one task per segment), re-extract text and
    hrefs, dictionary-encode — the edge table must equal the arithmetic
    replay exactly, proving WARC bytes are a lossless transport for the
    pages contract."""
    import tempfile

    from networkit_spark.sources.warc import read_warc, write_warc

    n = _n_docs(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="warc_gate_") as td:
        write_warc(synth_pages(spark, n), td)
        pages = read_warc(spark, td)
        _nodes, edges = build_edges(pages)
        # materialize before the tempdir vanishes (the gate collects later)
        edges = edges.localCheckpoint(eager=True)
    return edges


# ---------------------------------------------------------------------------
# URL canonicalization / SURT
# ---------------------------------------------------------------------------

# Deterministic messy-variant construction (both engines replay it):
# scheme case flips on i%2, host case on i%4, explicit :443 on i%3,
# empty path on i%7, empty query on i%5, fragment on i%2.
_MESSY_SQL = """
SELECT doc_id,
       (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
       || '://'
       || (CASE WHEN doc_id % 4 = 0 THEN 'Site' || (doc_id % 97) || '.Example'
                ELSE 'site' || (doc_id % 97) || '.example' END)
       || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
       || (CASE WHEN doc_id % 7 = 0 THEN '' ELSE '/p/' || doc_id END)
       || (CASE WHEN doc_id % 5 = 0 THEN '?' ELSE '' END)
       || (CASE WHEN doc_id % 2 = 0 THEN '#s' || (doc_id % 4) ELSE '' END)
       AS url
FROM documents
"""


def _messy_urls(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    i = F.col("doc_id")
    host = F.when(
        i % 4 == 0,
        F.concat(F.lit("Site"), (i % 97).cast("string"), F.lit(".Example")),
    ).otherwise(F.concat(F.lit("site"), (i % 97).cast("string"), F.lit(".example")))
    url = F.concat(
        F.when(i % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        host,
        F.when(i % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/p/"), i.cast("string"))
        ),
        F.when(i % 5 == 0, F.lit("?")).otherwise(F.lit("")),
        F.when(i % 2 == 0, F.concat(F.lit("#s"), (i % 4).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    return docs.select("doc_id", url.alias("url"))


@register(
    "canonical_urls",
    f"""
WITH messy AS ({_MESSY_SQL}),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS auth,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$', 1) AS rest
  FROM messy
),
q AS (
  SELECT doc_id, url, scheme,
         regexp_replace(auth, ':[0-9]+$', '') AS host,
         regexp_extract(auth, ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_replace(rest, '#.*$', ''), '\\?$', '') AS pq
  FROM p
),
r AS (
  SELECT doc_id, url, scheme, host, port,
         CASE WHEN pq = '' THEN '/' ELSE pq END AS path,
         CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                       OR (scheme = 'https' AND port = '443'))
              THEN ':' || port ELSE '' END AS port_part,
         string_split(host, '.') AS labels
  FROM q
)
SELECT doc_id, url,
       scheme || '://' || host || port_part || path AS canon,
       array_to_string(list_reverse(labels), ',') || ')' || path AS surt,
       host,
       CASE WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
            ELSE host END AS domain
FROM r
""",
)
def q_canonical_urls(spark, sf_dir):
    """URL canonicalization + SURT keys over deterministic messy variants —
    the exact string normalization both engines must agree on before any
    host/domain aggregation is trustworthy."""
    messy = _messy_urls(spark, sf_dir)
    u = F.col("url")
    return messy.select(
        "doc_id",
        "url",
        canonicalize_url(u).alias("canon"),
        surt_key(u).alias("surt"),
        url_host(u).alias("host"),
        registered_domain(url_host(u)).alias("domain"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition / quality battery
# ---------------------------------------------------------------------------

@register(
    "gopher_repetition",
    f"""
WITH t AS (SELECT doc_id, length(text) AS chars, {SQL_LTOKS} AS toks FROM documents),
g2 AS (SELECT doc_id, unnest({_sql_grams(2)}) AS gram FROM t),
c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
t2 AS (SELECT doc_id, c * length(gram) AS tl,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
       FROM c2),
g3 AS (SELECT doc_id, unnest({_sql_grams(3)}) AS gram FROM t),
c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
t3 AS (SELECT doc_id, c * length(gram) AS tl,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
       FROM c3),
g5 AS (SELECT doc_id, unnest({_sql_grams(5)}) AS gram FROM t),
c5 AS (SELECT doc_id, gram, count(*) AS c FROM g5 GROUP BY 1, 2),
d5 AS (SELECT doc_id, sum(c * length(gram)) AS dl FROM c5 WHERE c >= 2 GROUP BY doc_id)
SELECT t.doc_id,
       round(least(1.0, coalesce(a.tl, 0) / greatest(t.chars, 1)), 7) AS top2_frac,
       round(least(1.0, coalesce(b.tl, 0) / greatest(t.chars, 1)), 7) AS top3_frac,
       round(least(1.0, coalesce(d5.dl, 0) / greatest(t.chars, 1)), 7) AS dup5_frac
FROM t
LEFT JOIN (SELECT doc_id, tl FROM t2 WHERE rn = 1) a ON t.doc_id = a.doc_id
LEFT JOIN (SELECT doc_id, tl FROM t3 WHERE rn = 1) b ON t.doc_id = b.doc_id
LEFT JOIN d5 ON t.doc_id = d5.doc_id
""",
)
def q_gopher_repetition(spark, sf_dir):
    """Gopher repetition filters: top-2/3-gram char fraction + duplicated
    5-gram char fraction (Rae et al. 2021 heuristics)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs, top_ns=(2, 3), dup_ns=(5,))


@register(
    "gopher_quality_flags",
    f"""
WITH t AS (SELECT doc_id, text, {SQL_RTOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(toks) AS n_words,
         greatest(len(toks), 1) AS nz,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS wl,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         length(replace(text, '...', 'xxxx')) - length(text) AS n_ell,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         len(list_filter({SQL_SW},
             s -> list_contains(list_transform(toks, x -> lower(x)), s))) AS n_stop
  FROM t
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS flag_words,
       CAST(CASE WHEN wl::DOUBLE / nz >= 3.0 AND wl::DOUBLE / nz <= 10.0 THEN 1 ELSE 0 END AS BIGINT) AS flag_mwl,
       CAST(CASE WHEN (n_hash + n_ell)::DOUBLE / nz <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS flag_symbols,
       CAST(CASE WHEN n_alpha::DOUBLE / nz >= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS flag_alpha,
       CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS flag_stop,
       CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                  AND wl::DOUBLE / nz >= 3.0 AND wl::DOUBLE / nz <= 10.0
                  AND (n_hash + n_ell)::DOUBLE / nz <= 0.1
                  AND n_alpha::DOUBLE / nz >= 0.8
                  AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
""",
)
def q_gopher_quality_flags(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_flags(docs)


# ---------------------------------------------------------------------------
# CCNet-style paragraph (chunk) dedup
# ---------------------------------------------------------------------------

@register(
    "paragraph_dedup_stats",
    f"""
WITH t AS (SELECT doc_id, {SQL_LTOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks, CAST(ceil(len(toks) / 10.0) AS INT) AS nch FROM t),
ch AS (
  SELECT doc_id,
         unnest(generate_series(1, nch)) AS i
  FROM n WHERE nch > 0
),
h AS (
  SELECT ch.doc_id, ch.i - 1 AS chunk_idx,
         ('0x' || substr(md5(array_to_string(
             list_slice(n.toks, (ch.i - 1) * 10 + 1, (ch.i - 1) * 10 + 10), ' ')), 1, 15))::BIGINT AS hh
  FROM ch JOIN n ON ch.doc_id = n.doc_id
),
k AS (
  SELECT doc_id, chunk_idx,
         row_number() OVER (PARTITION BY hh ORDER BY doc_id, chunk_idx) AS rn
  FROM h
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round((count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END))::DOUBLE / count(*), 7) AS removed_frac
FROM k GROUP BY doc_id
""",
)
def q_paragraph_dedup_stats(spark, sf_dir):
    """CCNet-style chunk dedup summary: per-doc kept/removed 10-token
    chunks under global first-occurrence survivorship."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return paragraph_dedup_stats(docs)


# ---------------------------------------------------------------------------
# HyperBall engine twin: fixed-2-hop incoming-ball estimate, portable hashes
# ---------------------------------------------------------------------------

_HB_K = 8


def _hb_sql() -> str:
    js = ", ".join(str(j) for j in range(_HB_K))
    return f"""
WITH {EDGES_CTE},
nodes AS (SELECT doc_id AS node FROM documents),
h AS (
  SELECT node, j,
         ('0x' || substr(md5(node::VARCHAR || '_' || j), 1, 15))::BIGINT AS hv
  FROM nodes, unnest([{js}]) AS t(j)
),
m0 AS (SELECT node, j, CASE WHEN hv = 0 THEN 0 ELSE hv & (-hv) END AS m FROM h),
g1 AS (
  SELECT e.dst AS node, m0.j, bit_or(m0.m) AS bm
  FROM edges e JOIN m0 ON m0.node = e.src GROUP BY 1, 2
),
m1 AS (
  SELECT m0.node, m0.j, m0.m | coalesce(g1.bm, 0) AS m
  FROM m0 LEFT JOIN g1 ON m0.node = g1.node AND m0.j = g1.j
),
g2 AS (
  SELECT e.dst AS node, m1.j, bit_or(m1.m) AS bm
  FROM edges e JOIN m1 ON m1.node = e.src GROUP BY 1, 2
),
m2 AS (
  SELECT m1.node, m1.j, m1.m | coalesce(g2.bm, 0) AS m
  FROM m1 LEFT JOIN g2 ON m1.node = g2.node AND m1.j = g2.j
)
SELECT node,
       round(pow(2.0, avg(bit_count(m & (~(m + 1))))) / 0.77351, 7) AS ball2
FROM m2 GROUP BY node
"""


@register("hyperball_ball2", _hb_sql())
def q_hyperball_ball2(spark, sf_dir):
    """HyperBall ENGINE twin (oracle-pins `operators.anf.hyperball_harmonic`'s
    machinery): 2 unrolled incoming-ball OR-gather hops over the doc graph
    with PORTABLE md5 sketch init (the operator uses xxhash64 — same
    distribution, not DuckDB-replayable), k=8 registers, per-node
    Flajolet-Martin ball-size estimate after hop 2. Long-format state
    (node, register, mask): one shuffle per hop, identical to the operator's
    profile."""
    from networkit_spark.testgraph import doc_edges

    e = doc_edges(spark, sf_dir).select("src", "dst")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("node")
    )
    js = spark.range(_HB_K).select(F.col("id").cast("int").alias("j"))
    h = docs.crossJoin(js).select(
        "node", "j",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col("node").cast("string"), F.col("j").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").alias("hv"),
    )
    m = h.select(
        "node", "j",
        F.when(F.col("hv") == 0, F.lit(0).cast("long"))
        .otherwise(F.col("hv").bitwiseAND(-F.col("hv"))).alias("m"),
    )
    for _hop in range(2):
        g = (
            e.join(m.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "j")
            .agg(F.bit_or("m").alias("bm"))
        )
        m = m.join(g, ["node", "j"], "left").select(
            "node", "j",
            F.col("m").bitwiseOR(F.coalesce("bm", F.lit(0).cast("long"))).alias("m"),
        )
    mm = F.col("m")
    low = F.bit_count(mm.bitwiseAND(F.bitwise_not(mm + F.lit(1).cast("long")))).cast("double")
    return m.groupBy("node").agg(
        F.round(F.pow(F.lit(2.0), F.avg(low)) / F.lit(0.77351), 7).alias("ball2")
    )
