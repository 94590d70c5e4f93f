"""Host/domain-level web-graph operators: URL canonicalization, SURT keys,
host-graph aggregation, and host-level ranking.

Common Crawl publishes exactly this artifact family alongside the page-level
crawl: a host-level webgraph (edges aggregated from page links) plus host
rankings by harmonic centrality and PageRank (the public cc-webgraph
pipeline). The reference computes the same kernels on arbitrary graphs
(``networkit/cpp/centrality/PageRank.cpp``, ``HarmonicCloseness.cpp``); this
module supplies the webtext-specific front end that turns a page-level edge
table into the host/domain graph those kernels rank.

Everything is JVM-side column expressions (``regexp_extract`` /
``split`` / ``reverse`` — no Python in the hot path) so the canonicalization
runs inside WholeStageCodegen over 10^12 urls, and the host-graph
aggregation is a single map-side-combinable groupBy on (src_host, dst_host).

Canonicalization rules (documented, deterministic, cross-engine replayable):
lowercase scheme and host, strip default ports (http:80 / https:443), drop
the fragment, drop an empty trailing ``?``, empty path -> ``/``. SURT key =
reversed host labels joined by ``,`` then ``)`` + path (no www-stripping —
kept simple and lossless). ``registered_domain`` is the last-two-labels
heuristic (real pipelines consult the Public Suffix List; the PSL is a data
file, not an algorithm, so the heuristic is the honest in-repo stand-in).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus any port)."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    return F.regexp_replace(auth, ":[0-9]+$", "")


def _url_port(url: Column) -> Column:
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return F.regexp_extract(auth, ":([0-9]+)$", 1)


def _url_pathq(url: Column) -> Column:
    """Path+query with fragment and empty trailing '?' stripped; '' -> '/'."""
    rest = F.regexp_extract(url, _REST_RE, 1)
    pq = F.regexp_replace(F.regexp_replace(rest, "#.*$", ""), r"\?$", "")
    return F.when(pq == "", F.lit("/")).otherwise(pq)


def canonicalize_url(url: Column) -> Column:
    """Canonical form per the module-docstring rules."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = _url_port(url)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, _url_pathq(url))


def surt_key(url: Column) -> Column:
    """SURT-style sort key: ``com,example)/path`` (reversed host labels)."""
    host = url_host(url)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), _url_pathq(url))


def registered_domain(host: Column) -> Column:
    """Last-two-labels heuristic (``example.com``); single-label hosts pass
    through unchanged. For PSL-correct grouping (``example.co.uk``) pass a
    suffix table to :func:`registered_domain_psl` / :func:`domain_graph`."""
    labels = F.split(host, r"\.")
    return F.when(
        F.size(labels) >= 2,
        F.concat(F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)),
    ).otherwise(host)


def psl_rules(spark, rules) -> DataFrame:
    """Parse Public Suffix List rules into a (rule, is_exception) table.

    ``rules`` is an iterable of PSL-format lines or a path to a local copy
    of the list (https://publicsuffix.org/list/ — a data file, shipped by
    the caller, not bundled). Comments (``//``) and blanks dropped;
    ``!rule`` marks exceptions; wildcard labels stay literal (``*.ck``)."""
    if isinstance(rules, str):
        with open(rules, encoding="utf-8") as f:
            rules = f.readlines()
    parsed = []
    for ln in rules:
        ln = ln.strip()
        if not ln or ln.startswith("//"):
            continue
        exc = ln.startswith("!")
        parsed.append((ln[1:] if exc else ln, exc))
    return spark.createDataFrame(parsed, "rule string, is_exception boolean")


_PSL_MAX_LABELS = 8  # longest public suffix in the real PSL is 5 labels


def registered_domain_psl(
    hosts: DataFrame, psl: DataFrame, host_col: str = "host",
    out_col: str = "registered_domain",
) -> DataFrame:
    """(host, registered_domain) under full PSL semantics: longest matching
    rule wins, ``*`` matches one label, ``!exception`` beats wildcards, and
    an unmatched TLD falls back to the implicit ``*`` rule. A host that IS
    a public suffix maps to itself (callers typically drop those rows).

    Plan shape for 10^8 distinct hosts: explode each host into its <= 8
    trailing-label suffixes, two BROADCAST joins against the (tiny) rule
    table, one hash agg for the prevailing rule — no Python, no skew
    (suffix fan-out is a constant factor)."""
    labels = F.split(F.col(host_col), r"\.")
    nl = F.size(labels)
    ks = F.sequence(F.lit(1), F.least(nl, F.lit(_PSL_MAX_LABELS)))
    hosts_d = hosts.select(host_col).distinct()
    cand = hosts_d.select(
        host_col,
        nl.alias("_nl"),
        F.explode(
            F.transform(
                ks,
                lambda k: F.struct(
                    k.alias("k"),
                    F.array_join(F.slice(labels, nl - k + 1, k), ".").alias("suffix"),
                    F.when(
                        k >= 2,
                        F.concat(
                            F.lit("*."),
                            F.array_join(F.slice(labels, nl - k + 2, k - 1), "."),
                        ),
                    ).alias("wkey"),
                ),
            )
        ).alias("c"),
    )
    exact = cand.join(
        F.broadcast(psl), cand["c.suffix"] == psl["rule"]
    ).select(host_col, "_nl", F.col("c.k").alias("k"), "is_exception")
    wild = cand.filter(F.col("c.wkey").isNotNull()).join(
        F.broadcast(psl.filter(F.col("rule").startswith("*."))),
        cand["c.wkey"] == psl["rule"],
    ).select(host_col, "_nl", F.col("c.k").alias("k"), "is_exception")
    scored = exact.union(wild).select(
        host_col,
        "_nl",
        F.when(F.col("is_exception"), F.col("k") - 1)
        .otherwise(F.col("k"))
        .alias("ps"),
        F.col("is_exception").cast("int").alias("exc"),
    )
    best = scored.groupBy(host_col, "_nl").agg(
        F.max(F.struct("exc", "ps")).alias("b")
    )
    joined = hosts_d.join(best.drop("_nl"), host_col, "left")
    ps = F.coalesce(F.col("b.ps"), F.lit(1))  # implicit "*" default rule
    lab2 = F.split(F.col(host_col), r"\.")
    nl2 = F.size(lab2)
    rd = F.when(
        nl2 > ps, F.array_join(F.slice(lab2, nl2 - ps, ps + 1), ".")
    ).otherwise(F.col(host_col))
    return joined.select(host_col, rd.alias(out_col))


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_intra_host: bool = True,
) -> DataFrame:
    """Aggregate page-level links to the weighted host graph
    (src_host, dst_host, weight = number of page-level links).

    One groupBy shuffle with map-side partial aggregation; host extraction
    stays in codegen. At crawl scale this is the standard first contraction
    (10^12 page edges -> 10^8 host edges) and every downstream kernel runs
    on the contracted table.
    """
    hg = links.select(
        url_host(F.col(src_col)).alias("src_host"),
        url_host(F.col(dst_col)).alias("dst_host"),
    )
    if drop_intra_host:
        hg = hg.filter(F.col("src_host") != F.col("dst_host"))
    return hg.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("double").alias("weight")
    )


def domain_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    psl: DataFrame | None = None,
) -> DataFrame:
    """Same contraction one level up: registered-domain graph.

    With ``psl`` (a :func:`psl_rules` table) domains follow full Public
    Suffix List semantics (``example.co.uk`` stays whole); the contraction
    then goes page links -> host graph -> host->domain map join -> domain
    agg, so the PSL matching runs once per DISTINCT host, never per link."""
    if psl is None:
        dg = links.select(
            registered_domain(url_host(F.col(src_col))).alias("src_domain"),
            registered_domain(url_host(F.col(dst_col))).alias("dst_domain"),
        ).filter(F.col("src_domain") != F.col("dst_domain"))
        return dg.groupBy("src_domain", "dst_domain").agg(
            F.count("*").cast("double").alias("weight")
        )
    hg = host_graph(links, src_col, dst_col, drop_intra_host=False)
    dmap = registered_domain_psl(host_nodes(hg).select(F.col("id").alias("host")), psl)
    dg = (
        hg.join(
            dmap.select(
                F.col("host").alias("src_host"),
                F.col("registered_domain").alias("src_domain"),
            ),
            "src_host",
        )
        .join(
            dmap.select(
                F.col("host").alias("dst_host"),
                F.col("registered_domain").alias("dst_domain"),
            ),
            "dst_host",
        )
        .filter(F.col("src_domain") != F.col("dst_domain"))
    )
    return dg.groupBy("src_domain", "dst_domain").agg(
        F.sum("weight").cast("double").alias("weight")
    )


def host_nodes(host_edges: DataFrame) -> DataFrame:
    """Distinct hosts appearing on either side, as (id) — string ids are
    join keys everywhere downstream, no dense encode needed for ranking."""
    return (
        host_edges.select(F.col("src_host").alias("id"))
        .union(host_edges.select(F.col("dst_host").alias("id")))
        .distinct()
    )


def host_pagerank(host_edges: DataFrame, iterations: int = 10, damp: float = 0.85) -> DataFrame:
    """(host, score): weighted fixed-iteration PageRank on the host graph —
    the Common-Crawl host-ranking artifact. Reuses the oracle-checkable
    fixed-iteration kernel (teleport-only + final rescale); weights are the
    page-link multiplicities from :func:`host_graph`."""
    from networkit_spark.operators.pagerank import pagerank_fixed

    edges = host_edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"), "weight"
    )
    out = pagerank_fixed(edges, host_nodes(host_edges), iterations, damp=damp)
    return out.select(F.col("node").alias("host"), "score")


def host_harmonic_approx(host_edges: DataFrame, k: int = 32) -> DataFrame:
    """(host, score): HyperBall approximate harmonic centrality on the
    DIRECTED host graph — the scale path (the public cc-webgraph pipeline
    computes exactly this at 10^9 hosts; `operators.anf.hyperball_harmonic`).
    Use :func:`host_harmonic` for the exact small-graph variant."""
    from networkit_spark.operators.anf import hyperball_harmonic

    e = host_edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    out = hyperball_harmonic(e, host_nodes(host_edges), k=k)
    return out.select(F.col("node").alias("host"), "score")


HOST_HARMONIC_MAX_N = 100_000


def host_harmonic(
    host_edges: DataFrame, max_nodes: int = HOST_HARMONIC_MAX_N
) -> DataFrame:
    """(host, score): exact harmonic centrality on the symmetrized host
    graph — the other Common-Crawl ranking. All-pairs multi-source BFS is
    quadratic in hosts, so it is guarded at ``max_nodes`` (mirroring the
    driver-side generator guards): above that, use
    :func:`host_harmonic_approx` (HyperBall — the algorithm the public
    cc-webgraph pipeline itself runs at 10^9 hosts)."""
    from networkit_spark.operators.closeness import closeness

    n_hosts = host_nodes(host_edges).count()
    if n_hosts > max_nodes:
        raise ValueError(
            f"host_harmonic is exact all-pairs (O(n*m)) and guarded at "
            f"n <= {max_nodes} hosts; got n={n_hosts}. Use "
            f"host_harmonic_approx for the HyperBall scale path."
        )
    und = (
        host_edges.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .union(
            host_edges.select(
                F.col("dst_host").alias("src"), F.col("src_host").alias("dst")
            )
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    nodes = und.select(F.col("src").alias("id")).distinct()
    out = closeness(und, nodes, harmonic=True)
    return out.select(F.col("node").alias("host"), "score")
