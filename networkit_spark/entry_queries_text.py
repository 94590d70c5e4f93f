"""Training-data pipeline query registrations over documents / embeddings /
events: text stats, exact + MinHash-LSH + n-gram-Jaccard + SimHash dedup,
cosine similarity search, windowed event aggregation.

Portability layer for oracles: whitespace tokenization
(``string_split_regex`` + filter), the 60-bit md5 hash
(``('0x'||substr(md5(x),1,15))::BIGINT`` == Spark
``conv(substr(md5(x),1,15),16,10)``), ``[[:punct:]]`` == Java ``\\p{Punct}``
(both ASCII), and per-seed UNION ALL instead of WITH ORDINALITY.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from networkit_spark.entry_queries import register
from networkit_spark.functions.dedup import (
    DEFAULT_SHINGLE_DF_CAP,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_all_pairs,
    simhash64,
)
from networkit_spark.functions.similarity import _dot, with_normalized
from networkit_spark.functions.text import (
    DE_STOPWORDS,
    EN_STOPWORDS,
    ES_STOPWORDS,
    FR_STOPWORDS,
    fingerprint,
    lang_id,
    punct_ratio,
    stopword_ratio,
    token_count,
)

# -- shared SQL fragments ----------------------------------------------------

SQL_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
SQL_FP = (
    "('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 15))::BIGINT"
)
SQL_SW = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
SQL_SW_DE = "[" + ", ".join(f"'{w}'" for w in DE_STOPWORDS) + "]"
SQL_SW_ES = "[" + ", ".join(f"'{w}'" for w in ES_STOPWORDS) + "]"
SQL_SW_FR = "[" + ", ".join(f"'{w}'" for w in FR_STOPWORDS) + "]"


def _sql_shingles(k: int = 3) -> str:
    return (
        f"CASE WHEN len(toks) >= {k} THEN "
        f"list_transform(generate_series(1, len(toks) - {k - 1}), "
        f"i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' ')) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@register(
    "doc_stats",
    f"""
WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         length(text) AS n_chars2,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({SQL_SW}, lower(x))))::DOUBLE / len(toks)
              ELSE 0.0 END AS swr,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / length(text)
              ELSE 0.0 END AS pr
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_chars2 AS BIGINT) AS n_chars2,
       round(swr, 7) AS stopword_ratio, round(pr, 7) AS punct_ratio
FROM s
""",
)
def q_doc_stats(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = F.col("text")
    return df.select(
        "doc_id",
        token_count(c).cast("long").alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars2"),
        F.round(stopword_ratio(c), 7).alias("stopword_ratio"),
        F.round(punct_ratio(c), 7).alias("punct_ratio"),
    )


@register(
    "lang_id",
    f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
r AS (
  SELECT doc_id,
         len(toks) AS n,
         len(list_filter(toks, x -> list_contains({SQL_SW}, lower(x)))) AS eh,
         len(list_filter(toks, x -> list_contains({SQL_SW_DE}, lower(x)))) AS dh,
         len(list_filter(toks, x -> list_contains({SQL_SW_ES}, lower(x)))) AS sh,
         len(list_filter(toks, x -> list_contains({SQL_SW_FR}, lower(x)))) AS fh
  FROM t
),
rates AS (
  SELECT doc_id,
         CASE WHEN n > 0 THEN eh::DOUBLE / n ELSE 0.0 END AS en,
         CASE WHEN n > 0 THEN dh::DOUBLE / n ELSE 0.0 END AS de,
         CASE WHEN n > 0 THEN sh::DOUBLE / n ELSE 0.0 END AS es,
         CASE WHEN n > 0 THEN fh::DOUBLE / n ELSE 0.0 END AS fr
  FROM r
)
SELECT doc_id,
       CASE WHEN en >= de AND en >= es AND en >= fr AND en > 0.01 THEN 'en'
            WHEN de >= es AND de >= fr AND de > 0.01 THEN 'de'
            WHEN es >= fr AND es > 0.01 THEN 'es'
            WHEN fr > 0.01 THEN 'fr'
            ELSE 'unknown' END AS lang_pred
FROM rates
""",
)
def q_lang_id(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

@register(
    "doc_fingerprints",
    f"SELECT doc_id, {SQL_FP} AS fp FROM documents",
)
def q_doc_fingerprints(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "exact_dup_groups",
    f"""
WITH f AS (SELECT doc_id, {SQL_FP} AS fp FROM documents)
SELECT fp, CAST(count(*) AS BIGINT) AS size, min(doc_id) AS keep_id
FROM f GROUP BY fp HAVING count(*) >= 2
""",
)
def q_exact_dup_groups(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_duplicates(df)


def _minhash_sql(num_hashes: int, shingle_k: int = 3) -> str:
    per_seed = []
    for seed in range(num_hashes):
        per_seed.append(
            f"SELECT doc_id, {seed} AS seed, "
            f"list_min(list_transform(sh, s -> ('0x'||substr(md5('s{seed}|'||s),1,15))::BIGINT)) AS mh "
            f"FROM shing WHERE len(sh) > 0"
        )
    return (
        f"WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),\n"
        f"shing AS (SELECT doc_id, {_sql_shingles(shingle_k)} AS sh FROM t)\n"
        + " UNION ALL ".join(per_seed)
    )


@register("minhash_signatures", _minhash_sql(8))
def q_minhash_signatures(spark, sf_dir):
    """(doc_id, seed, mh) — 8-seed portable minhash, exploded for comparison."""
    from networkit_spark.functions.dedup import minhash_signature

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = df.select(
        "doc_id", minhash_signature(F.col("text"), num_hashes=8).alias("sig")
    ).filter(F.size("sig") > 0).filter(F.col("sig")[0].isNotNull())
    return sig.select(
        "doc_id", F.posexplode("sig").alias("seed", "mh")
    ).select("doc_id", F.col("seed").cast("int").alias("seed"), "mh")


def _minhash_pairs_sql(num_hashes: int = 8, bands: int = 4, shingle_k: int = 3) -> str:
    rpb = num_hashes // bands
    sig_cols = ", ".join(
        f"list_min(list_transform(sh, s -> ('0x'||substr(md5('s{i}|'||s),1,15))::BIGINT)) AS h{i}"
        for i in range(num_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + "||'|'||".join(f"h{b * rpb + j}::VARCHAR" for j in range(rpb))
        + " AS bh FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
shing AS (SELECT doc_id, {_sql_shingles(shingle_k)} AS sh FROM t),
sigs AS (SELECT doc_id, {sig_cols} FROM shing WHERE len(sh) > 0),
banded AS ({band_rows})
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh
WHERE x.doc_id < y.doc_id
"""


@register("minhash_lsh_pairs", _minhash_pairs_sql())
def q_minhash_lsh_pairs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_candidates(df, num_hashes=8, bands=4)


def _ngram_dups_sql(cap: int) -> str:
    """Inverted-index ngram Jaccard with the hot-shingle DF cap mirrored:
    denominators (per-doc distinct shingle counts) taken BEFORE the cap,
    only the shingle self-join runs on the capped index — identical to
    :func:`ngram_jaccard_all_pairs`."""
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
shing AS (SELECT doc_id, list_distinct({_sql_shingles(3)}) AS sh FROM t),
inv0 AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS s FROM shing WHERE len(sh) > 0),
hot AS (SELECT s FROM inv0 GROUP BY s HAVING count(*) > {cap}),
inv AS (SELECT * FROM inv0 ANTI JOIN hot USING (s)),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, a.nsh AS na, b.nsh AS nb, count(*) AS i
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT a, b, round(i::DOUBLE / (na + nb - i), 7) AS jaccard
FROM inter WHERE i::DOUBLE / (na + nb - i) >= 0.5
"""


@register("ngram_jaccard_dups", _ngram_dups_sql(DEFAULT_SHINGLE_DF_CAP))
def q_ngram_jaccard_dups(spark, sf_dir):
    """Runs with the DEFAULT hot-shingle cap — the gate exercises the
    production path (cap mirrored in the oracle's ANTI JOIN)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_jaccard_all_pairs(df, threshold=0.5)
    return out.select("a", "b", F.round("jaccard", 7).alias("jaccard"))


def _simhash_sql() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {i}) & 1 = 1)) > n"
        f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(60)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
h AS (
  SELECT doc_id, len(toks) AS n,
         list_transform(toks, s -> ('0x'||substr(md5(s),1,15))::BIGINT) AS hs
  FROM t
)
SELECT doc_id, ({bit_terms}) AS simhash FROM h
"""


@register("simhash_signatures", _simhash_sql())
def q_simhash_signatures(spark, sf_dir):
    """Portable 60-bit md5 SimHash (oracle-checkable); the xxhash64 64-bit
    variant (:func:`simhash64`) stays the pure-Spark fast path."""
    from networkit_spark.functions.dedup import simhash60_portable

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select("doc_id", simhash60_portable(F.col("text")).alias("simhash"))


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

@register(
    "embedding_topk",
    """
WITH vn AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS nv
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.nv, c.nv), 6) AS cosine
  FROM vn q JOIN vn c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 5
""",
)
def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query ids < 10 (ranked on cosine rounded
    to 6dp so cross-engine float noise cannot flip rank order)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c = with_normalized(emb).select(F.col("vec_id").alias("neighbor_id"), F.col("nvec").alias("cv"))
    q = with_normalized(emb.filter("vec_id < 10")).select(
        F.col("vec_id").alias("query_id"), F.col("nvec").alias("qv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def _near_dup_sql(dim: int = 64, n_planes: int = 6, n_tables: int = 6,
                  seed: int = 7, threshold: float = 0.4) -> str:
    """Hyperplane-LSH near-dup oracle with the plane constants INLINED as SQL
    literals (same md5-derived values as ``similarity._hyperplanes``), so the
    DuckDB side replicates bucket assignment bit-for-bit."""
    from networkit_spark.functions.similarity import _hyperplanes

    per_table = []
    for t in range(n_tables):
        planes = _hyperplanes(None, dim, n_planes, t, seed)
        bucket = " + ".join(
            f"(CASE WHEN list_dot_product(nv, [{', '.join(repr(x) for x in plane)}]) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        )
        per_table.append(f"SELECT vec_id, {t} AS tbl, ({bucket}) AS bkt FROM vn")
    buckets = " UNION ALL ".join(per_table)
    return f"""
WITH vn AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS nv
  FROM embeddings
),
bt AS ({buckets}),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM bt x JOIN bt y ON x.tbl = y.tbl AND x.bkt = y.bkt AND x.vec_id < y.vec_id
)
SELECT c.a, c.b, round(list_dot_product(va.nv, vb.nv), 6) AS cosine
FROM cand c JOIN vn va ON va.vec_id = c.a JOIN vn vb ON vb.vec_id = c.b
WHERE list_dot_product(va.nv, vb.nv) >= {threshold}
"""


@register("embedding_near_dup", _near_dup_sql())
def q_embedding_near_dup(spark, sf_dir):
    """LSH-bucketed near-dup pairs; the oracle inlines the hyperplane
    constants, making bucket assignment and the cosine verify hash-checkable
    (threshold 0.4 — the synthetic corpus's max pairwise cosine is ~0.51, so
    the result is non-empty at gate scale)."""
    from networkit_spark.functions.similarity import pairwise_cosine_near_dup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = pairwise_cosine_near_dup(emb, threshold=0.4)
    return out.select("a", "b", F.round("cosine", 6).alias("cosine"))


# ---------------------------------------------------------------------------
# events: windowed aggregation (batch form of the streaming pipeline)
# ---------------------------------------------------------------------------

@register(
    "events_tumbling_1h",
    """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_tumbling_1h(spark, sf_dir):
    """Tumbling 1h window counts — the batch twin of the Structured
    Streaming pipeline in streaming/events.py."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sessions",
    """
WITH o AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
l AS (
  SELECT user_id, e,
         CASE WHEN lag(e) OVER (PARTITION BY user_id ORDER BY e) IS NULL
                   OR e - lag(e) OVER (PARTITION BY user_id ORDER BY e) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT user_id, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY e
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
)
SELECT user_id, CAST(sess AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(e) AS start_e, max(e) AS end_e
FROM s GROUP BY user_id, sess
""",
)
def q_events_sessions(spark, sf_dir):
    """Sessionization (30-min inactivity gap) — the batch twin of stateful
    streaming sessionization; lag + running-sum windows."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("e")
    brk = F.when(
        F.lag("e").over(w).isNull() | ((F.col("e") - F.lag("e").over(w)) > 1800), 1
    ).otherwise(0)
    sess = ev.withColumn("brk", brk).withColumn(
        "sess", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", F.col("sess").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("e").alias("start_e"),
        F.max("e").alias("end_e"),
    )


# ---------------------------------------------------------------------------
# IVF approximate nearest neighbor (coarse quantizer + cell probe) — the
# ANN scale path beyond hyperplane LSH; training-free seeded centroids keep
# the gate variant bit-replayable in SQL (functions/similarity.py).
# ---------------------------------------------------------------------------

IVF_STEP = 64     # centroid ids = multiples of 64 -> k = ceil(n/64)
IVF_NPROBE = 2
IVF_K = 5


@register(
    "ivf_topk",
    f"""
WITH vn AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS nv
  FROM embeddings
),
cents AS (SELECT vec_id AS cid, nv AS cv FROM vn WHERE vec_id % {IVF_STEP} = 0),
assign AS (
  SELECT id, b.cid AS cid FROM (
    SELECT v.vec_id AS id,
           min(struct_pack(d := -round(list_dot_product(v.nv, c.cv), 6), cid := c.cid)) AS b
    FROM vn v, cents c GROUP BY v.vec_id
  )
),
qs AS (
  SELECT q.vec_id AS query_id, q.nv AS qv, c.cid,
         round(list_dot_product(q.nv, c.cv), 6) AS cd
  FROM vn q, cents c WHERE q.vec_id < 10
),
probed AS (
  SELECT query_id, qv, cid FROM (
    SELECT query_id, qv, cid,
           row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, cid ASC) AS pr
    FROM qs
  ) WHERE pr <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.id AS neighbor_id,
         round(list_dot_product(p.qv, n.nv), 6) AS cosine
  FROM probed p
  JOIN assign a ON a.cid = p.cid
  JOIN vn n ON n.vec_id = a.id
  WHERE p.query_id <> a.id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {IVF_K}
""",
)
def q_ivf_topk(spark, sf_dir):
    """IVF cosine top-5 for query ids < 10, nprobe=2 over seeded centroids
    (k = ceil(n/64)); recall vs brute force pytest-pinned
    (tests/test_ivf.py)."""
    from networkit_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, range(10), k=IVF_K, nprobe=IVF_NPROBE, step=IVF_STEP)


def _near_dup_clusters_sql(cc_rounds: int = 8) -> str:
    """Unrolled hash-min CC over the banded-LSH pair graph (nested WITH)."""
    parts = [
        f"WITH pairs AS ({_minhash_pairs_sql(8, 4, 3)}),",
        "und AS (SELECT a AS src, b AS dst FROM pairs"
        " UNION ALL SELECT b, a FROM pairs),",
        "l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)",
    ]
    for k in range(1, cc_rounds + 1):
        prev = f"l{k - 1}"
        parts.append(
            f", l{k} AS MATERIALIZED ("
            f" SELECT n.node, least(n.label, coalesce(t.ml, n.label)) AS label"
            f" FROM {prev} n LEFT JOIN ("
            f"   SELECT e.dst AS node, min(p.label) AS ml"
            f"   FROM und e JOIN {prev} p ON e.src = p.node GROUP BY e.dst"
            f" ) t ON n.node = t.node)"
        )
    parts.append(f"SELECT node AS doc_id, label AS cluster FROM l{cc_rounds}")
    return "\n".join(parts)


@register("near_dup_clusters", _near_dup_clusters_sql())
def q_near_dup_clusters(spark, sf_dir):
    """Dedup survivor map: MinHash-LSH candidate pairs -> connected
    components -> (doc_id, cluster = min doc id of its near-dup cluster);
    singletons map to themselves."""
    from networkit_spark.functions.dedup import near_dup_clusters

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return near_dup_clusters(df, num_hashes=8, bands=4)


# ---------------------------------------------------------------------------
# corpus hygiene: benchmark decontamination + domain stats/caps
# (functions/corpus.py)
# ---------------------------------------------------------------------------

_DECONTAM_MOD = 97  # docs with doc_id % 97 == 0 play the held-out benchmark


def _decontam_sql(k: int = 3, min_overlap: int = 1) -> str:
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
shing AS (SELECT doc_id, list_distinct({_sql_shingles(k)}) AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM shing
          WHERE doc_id % {_DECONTAM_MOD} = 0),
docsh AS (SELECT doc_id, unnest(sh) AS s FROM shing),
shared AS (SELECT d.doc_id, count(*) AS c
           FROM docsh d JOIN bench b ON d.s = b.s GROUP BY d.doc_id)
SELECT d.doc_id,
       CAST(coalesce(s.c, 0) AS BIGINT) AS shared_ngrams,
       CAST(CASE WHEN coalesce(s.c, 0) >= {min_overlap} THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
"""


@register("benchmark_decontam", _decontam_sql())
def q_benchmark_decontam(spark, sf_dir):
    """Benchmark decontamination: per-document count of distinct 3-gram
    shingles shared with the held-out set (doc_id % 97 == 0) and the
    contamination flag. Plan: broadcast the benchmark shingle set, join,
    partial-agg per doc — the corpus side never shuffles its shingles."""
    from networkit_spark.functions.corpus import decontaminate

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = df.filter(F.col("doc_id") % _DECONTAM_MOD == 0)
    return decontaminate(df, bench, k=3, min_overlap=1)


@register(
    "domain_stats",
    """
SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       round(avg(length(text)), 7) AS mean_chars
FROM documents GROUP BY source
""",
)
def q_domain_stats(spark, sf_dir):
    from networkit_spark.functions.corpus import domain_stats

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return domain_stats(df)


@register(
    "domain_capped_survivors",
    """
SELECT doc_id, source, CAST(rk AS BIGINT) AS domain_rank
FROM (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      FROM documents)
WHERE rk <= 10
""",
)
def q_domain_capped_survivors(spark, sf_dir):
    """First 10 docs per source domain — the deterministic domain cap a
    crawl pipeline applies before training-mix assembly."""
    from networkit_spark.functions.corpus import cap_per_domain

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cap_per_domain(df, cap=10).select("doc_id", "source", "domain_rank")
