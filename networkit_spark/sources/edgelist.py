"""Edge-list / METIS / SNAP / KONECT readers + writers.

Reference: ``networkit/graphio.pyx`` dispatcher (``Format`` enum :1043-1065,
``getReader`` :1092-1130, ``guessFileFormat`` :1142-1302, ``readGraph``
:1308, ``writeGraph`` :1546); C++ ``cpp/io/EdgeListReader.cpp:19-168``
(configurable separator / firstNode / comment prefix; ``continuous=false``
builds a string->id dictionary :65-83), ``METISGraphReader.cpp`` (adjacency-
per-line), ``SNAPGraphReader.cpp`` (tab-separated, ``#`` comments),
``KONECTGraphReader.cpp`` (``%`` headers).

Spark mapping: ``spark.read.csv`` with separator/comment options — the scan
parallelizes and predicate-pushes for free; non-continuous ids dictionary-
encode exactly like the pages ingest (lexicographic dense rank — reproducible
under any parallelism, unlike the reference's insertion-order map).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Format presets mirroring graphio.pyx Format enum dialects
FORMATS = {
    "edgelist-tab-zero": {"sep": "\t", "first_node": 0, "comment": "#"},
    "edgelist-tab-one": {"sep": "\t", "first_node": 1, "comment": "#"},
    "edgelist-space-zero": {"sep": " ", "first_node": 0, "comment": "#"},
    "edgelist-space-one": {"sep": " ", "first_node": 1, "comment": "#"},
    "snap": {"sep": "\t", "first_node": 0, "comment": "#"},
    "konect": {"sep": " ", "first_node": 1, "comment": "%"},
}


def guess_format(path: str) -> str:
    """Extension sniffing (guessFileFormat analog, graphio.pyx:1142-1302)."""
    base = os.path.basename(path).lower()
    if base.endswith(".graph"):
        return "metis"
    if base.endswith((".konect", ".tsv")):
        return "konect"
    if base.endswith(".txt"):
        return "snap"
    if base.endswith((".rb", ".rua", ".rsa", ".pua", ".psa")):
        return "rb"
    if base.endswith(".thrill"):
        return "thrill"
    return "edgelist-tab-zero"


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    comment: str = "#",
    first_node: int = 0,
    continuous: bool = True,
    directed: bool = False,
):
    """-> (nodes(id[, raw]), edges(src, dst, weight)).

    ``continuous=True``: numeric ids shifted by ``first_node`` (reference
    ``scanId`` strtol path). ``continuous=False``: arbitrary string ids,
    dictionary-encoded to dense [0, n) by lexicographic rank
    (``EdgeListReader.cpp:65-83`` analog). Weight column auto-detected from
    a third csv column (``:43-44``).
    """
    if sep.strip() == "":
        # whitespace dialects tokenize on RUNS of blanks (the reference's
        # strtok-style scan — KONECT fixtures pad columns with double spaces)
        lines = spark.read.text(path).filter(
            ~F.col("value").startswith(comment) & (F.trim("value") != "")
        )
        toks = F.filter(F.split(F.trim("value"), r"\s+"), lambda t: t != "")
        raw = (
            lines.select(toks.alias("t"))
            .filter(F.size("t") >= 2)
            .select(
                F.col("t")[0].alias("c0"),
                F.col("t")[1].alias("c1"),
                F.when(F.size("t") >= 3, F.col("t")[2]).alias("c2"),
            )
        )
        w = F.coalesce(F.col("c2").cast("double"), F.lit(1.0))
    else:
        raw = (
            spark.read.option("sep", sep)
            .option("comment", comment)
            .csv(path)
            .toDF(*["c0", "c1", "c2"][: 3])
            if _ncols(spark, path, sep, comment) >= 3
            else spark.read.option("sep", sep).option("comment", comment).csv(path).toDF("c0", "c1")
        )
        has_w = "c2" in raw.columns
        w = F.col("c2").cast("double") if has_w else F.lit(1.0)
    if continuous:
        edges = raw.select(
            (F.col("c0").cast("long") - first_node).alias("src"),
            (F.col("c1").cast("long") - first_node).alias("dst"),
            w.alias("weight"),
        )
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        from networkit_spark.plans.ids import dense_ids

        ids = raw.select(F.col("c0").alias("raw")).union(raw.select(F.col("c1")))
        nodes = dense_ids(ids, "raw").select("id", "raw")
        edges = (
            raw.join(nodes.select(F.col("raw").alias("c0"), F.col("id").alias("src")), "c0")
            .join(nodes.select(F.col("raw").alias("c1"), F.col("id").alias("dst")), "c1")
            .select("src", "dst", w.alias("weight"))
        )
    if not directed:
        from networkit_spark.graph import symmetrize

        edges = symmetrize(edges)
    return nodes, edges


def _ncols(spark, path, sep, comment) -> int:
    probe = spark.read.option("sep", sep).option("comment", comment).csv(path).limit(1)
    return len(probe.columns)


def read_snap(spark: SparkSession, path: str, directed: bool = True):
    """SNAPGraphReader.cpp parity: tab-separated, '#' comments, 0-based ids."""
    return read_edge_list(spark, path, sep="\t", comment="#", first_node=0,
                          continuous=True, directed=directed)


def read_konect(spark: SparkSession, path: str, directed: bool = False):
    """KONECTGraphReader parity: space-separated, '%' headers, 1-based ids."""
    return read_edge_list(spark, path, sep=" ", comment="%", first_node=1,
                          continuous=True, directed=directed)


def read_metis(spark: SparkSession, path: str):
    """METISGraphReader.cpp parity: header ``n m [fmt [ncon]]``; the i-th
    non-comment line after the header lists the (1-based) neighbors of node
    i-1 (we emit 0-based ids). Undirected: each edge appears on both lines,
    which IS our symmetrized representation.

    '%' comment lines may appear anywhere (including before the header) and
    must NOT consume node indices: node ids are assigned by re-ranking the
    non-comment body lines (distributed dense rank over the original
    zipWithIndex line numbers — ``plans/ids.py``), and the header is the
    first non-comment line. ``fmt`` is honored: ones digit = edge weights
    (neighbor/weight pairs per line), tens digit = ``ncon`` vertex weights
    prefixed per line (skipped); anything else raises.
    """
    from networkit_spark.plans.ids import dense_ids

    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long")
    noncomment = df.filter(~F.col("line").startswith("%"))
    header_row = noncomment.orderBy("lineno").first()
    header = header_row["line"].split()
    n = int(header[0])
    fmt = int(header[2]) if len(header) > 2 else 0
    if fmt not in (0, 1, 10, 11, 100):
        raise ValueError(f"unsupported METIS fmt {fmt}")
    has_ewt = fmt % 10 == 1
    n_vwt = (int(header[3]) if len(header) > 3 else 1) if (fmt // 10) % 10 == 1 else 0

    body = noncomment.filter(F.col("lineno") > header_row["lineno"])
    # re-rank: i-th non-comment body line -> node id i (comments don't shift)
    idx = dense_ids(body.select("lineno"), "lineno", id_col="src")
    body = body.join(idx, "lineno")
    toks = F.filter(F.split(F.trim("line"), r"\s+"), lambda t: t != "")
    toks = F.slice(toks, n_vwt + 1, F.greatest(F.size(toks) - n_vwt, F.lit(0)))
    if has_ewt:
        pairs = body.select(
            "src",
            F.posexplode(toks).alias("pos", "tok"),
        )
        nbrs = pairs.filter(F.col("pos") % 2 == 0).select(
            "src", (F.col("pos") / 2).cast("long").alias("j"),
            (F.col("tok").cast("long") - 1).alias("dst"),
        )
        wts = pairs.filter(F.col("pos") % 2 == 1).select(
            "src", ((F.col("pos") - 1) / 2).cast("long").alias("j"),
            F.col("tok").cast("double").alias("weight"),
        )
        edges = nbrs.join(wts, ["src", "j"]).select("src", "dst", "weight")
    else:
        edges = (
            body.select("src", F.explode(toks).alias("nbr"))
            .select(
                "src",
                (F.col("nbr").cast("long") - 1).alias("dst"),
                F.lit(1.0).alias("weight"),
            )
        )
    nodes = spark.range(n).select(F.col("id").cast("long").alias("id"))
    return nodes, edges


def read_gml(spark: SparkSession, path: str):
    """GML reader (``GMLGraphReader``, ``networkit/graphio.pyx:1110``;
    fixtures ``/root/reference/input/*.gml``).

    GML is a small-fixture format (multi-line ``node [ id N ]`` /
    ``edge [ source A target B [weight W] ]`` blocks inside ``graph [...]``),
    so the parse reads the file as ONE text row (``wholetext``) and extracts
    blocks with JVM ``regexp_extract_all`` — no Python in the parse. Nested
    sub-blocks inside node/edge blocks (e.g. ``graphics [...]``) are not
    supported (the reference's reader is similarly minimal). Undirected
    graphs (``directed 0`` or absent) are symmetrized; returns
    (nodes(id), edges(src, dst, weight), directed).
    """
    txt = spark.read.text(path, wholetext=True)
    directed_row = txt.select(
        F.regexp_extract(F.col("value"), r"directed\s+(\d+)", 1).alias("d")
    ).first()
    directed = directed_row["d"] == "1"
    node_ids = txt.select(
        F.explode(
            F.regexp_extract_all(F.col("value"), F.lit(r"node\s*\[\s*([^\]]*)\]"), F.lit(1))
        ).alias("blk")
    ).select(F.regexp_extract("blk", r"id\s+(\d+)", 1).cast("long").alias("id"))
    edge_blocks = txt.select(
        F.explode(
            F.regexp_extract_all(F.col("value"), F.lit(r"edge\s*\[\s*([^\]]*)\]"), F.lit(1))
        ).alias("blk")
    )
    w_str = F.regexp_extract("blk", r"(?:weight|value)\s+([0-9.eE+-]+)", 1)
    edges = edge_blocks.select(
        F.regexp_extract("blk", r"source\s+(\d+)", 1).cast("long").alias("src"),
        F.regexp_extract("blk", r"target\s+(\d+)", 1).cast("long").alias("dst"),
        F.when(w_str == "", 1.0).otherwise(w_str.cast("double")).alias("weight"),
    )
    if not directed:
        # symmetrize WITHOUT weight summing: both (u,v) and (v,u) rows, a
        # self-loop stays one row (dropDuplicates collapses its mirror)
        edges = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        ).dropDuplicates(["src", "dst"])
    return node_ids, edges, directed


def read_graphml(spark: SparkSession, path: str):
    """GraphML reader (``GraphMLReader``, ``graphio.pyx:1110-1111``):
    ``<node id="..."/>`` + ``<edge source="..." target="..."/>`` elements,
    wholetext + JVM regex extraction like :func:`read_gml`. String node ids
    dictionary-encode to dense [0, n) by lexicographic rank. Undirected
    (``edgedefault="undirected"``, the GraphML default) symmetrizes.

    Returns (nodes(id, raw), edges(src, dst, weight), directed).
    """
    from networkit_spark.plans.ids import dense_ids

    txt = spark.read.text(path, wholetext=True)
    directed_row = txt.select(
        F.regexp_extract(F.col("value"), r'edgedefault="(\w+)"', 1).alias("d")
    ).first()
    directed = directed_row["d"] == "directed"
    raw_nodes = txt.select(
        F.explode(
            F.regexp_extract_all(F.col("value"), F.lit(r'<node\s+id="([^"]+)"'), F.lit(1))
        ).alias("raw")
    )
    nodes = dense_ids(raw_nodes, "raw").select("id", "raw")
    edge_blocks = txt.select(
        F.explode(
            F.regexp_extract_all(
                F.col("value"),
                F.lit(r'(?s)<edge\s+[^>]*source="[^"]+"[^>]*?(?:/>|>.*?</edge>)'),
                F.lit(0),
            )
        ).alias("blk")
    )
    w_str = F.regexp_extract("blk", r"<data[^>]*>\s*([0-9.eE+-]+)\s*</data>", 1)
    pairs = edge_blocks.select(
        F.regexp_extract("blk", r'source="([^"]+)"', 1).alias("sraw"),
        F.regexp_extract("blk", r'target="([^"]+)"', 1).alias("traw"),
        F.when(w_str == "", 1.0).otherwise(w_str.cast("double")).alias("weight"),
    )
    edges = (
        pairs.join(nodes.select(F.col("raw").alias("sraw"), F.col("id").alias("src")), "sraw")
        .join(nodes.select(F.col("raw").alias("traw"), F.col("id").alias("dst")), "traw")
        .select("src", "dst", "weight")
    )
    if not directed:
        edges = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        ).dropDuplicates(["src", "dst"])
    return nodes, edges, directed


def read_mtx(spark: SparkSession, path: str):
    """MatrixMarket coordinate reader (``MTXGraphReader.cpp`` parity):
    ``%`` comments, header line ``rows cols nnz``, body ``i j [w]``
    (1-based). ``symmetric`` in the banner symmetrizes. Distributed csv-like
    scan; the header is located as the first non-comment line."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long")
    banner = df.orderBy("lineno").first()["line"]
    symmetric = "symmetric" in banner
    noncomment = df.filter(~F.col("line").startswith("%") & (F.trim("line") != ""))
    header_row = noncomment.orderBy("lineno").first()
    n = int(header_row["line"].split()[0])
    body = noncomment.filter(F.col("lineno") > header_row["lineno"])
    toks = F.split(F.trim("line"), r"\s+")
    edges = body.select(
        (toks.getItem(0).cast("long") - 1).alias("src"),
        (toks.getItem(1).cast("long") - 1).alias("dst"),
        F.coalesce(toks.getItem(2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    if symmetric:
        edges = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        ).dropDuplicates(["src", "dst"])
    nodes = spark.range(n).select(F.col("id").cast("long").alias("id"))
    return nodes, edges


def write_edge_list(
    edges: DataFrame, path: str, sep: str = "\t", first_node: int = 0
) -> None:
    """EdgeListWriter analog (one undirected edge per line, src<dst for
    symmetrized inputs would be the caller's choice — we write rows as-is)."""
    (
        edges.select(
            (F.col("src") + first_node).cast("string"),
            (F.col("dst") + first_node).cast("string"),
            F.col("weight").cast("string"),
        )
        .write.mode("overwrite")
        .option("sep", sep)
        .csv(path)
    )


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader analog: one label per line, node = line number."""
    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long")
    return df.select(
        F.col("lineno").alias("node"), F.col("line").cast("long").alias("label")
    )


def read_gexf(spark: SparkSession, path: str):
    """GEXF reader (``GEXFReader``, ``graphio.pyx`` Python impl; fixtures
    ``input/staticTest.gexf``): ``<node id=.../>`` + ``<edge source=..
    target=.. [weight=..]/>`` elements, wholetext + JVM regex extraction
    like :func:`read_graphml`. ``defaultedgetype="directed"`` flips the
    symmetrize; dynamic spells (``start=``/``end=``) are surfaced as an
    optional ``start`` column on edges when present (the reference's
    dynamic mode replays them as events).

    Returns (nodes(id, raw), edges(src, dst, weight[, start]), directed).
    """
    from networkit_spark.plans.ids import dense_ids

    txt = spark.read.text(path, wholetext=True)
    directed_row = txt.select(
        F.regexp_extract(F.col("value"), r'defaultedgetype="(\w+)"', 1).alias("d")
    ).first()
    directed = directed_row["d"] == "directed"
    raw_nodes = txt.select(
        F.explode(
            F.regexp_extract_all(F.col("value"), F.lit(r'<node\s+[^>]*id="([^"]+)"'), F.lit(1))
        ).alias("raw")
    )
    nodes = dense_ids(raw_nodes, "raw").select("id", "raw")
    edge_blocks = txt.select(
        F.explode(
            F.regexp_extract_all(
                F.col("value"), F.lit(r'<edge\s+[^>]*source="[^"]+"[^>]*>'), F.lit(0)
            )
        ).alias("blk")
    )
    pairs = edge_blocks.select(
        F.regexp_extract("blk", r'source="([^"]+)"', 1).alias("sraw"),
        F.regexp_extract("blk", r'target="([^"]+)"', 1).alias("traw"),
        F.regexp_extract("blk", r'weight="([^"]+)"', 1).alias("wraw"),
        F.regexp_extract("blk", r'start="([^"]+)"', 1).alias("start_raw"),
    )
    has_dynamics = pairs.filter(F.col("start_raw") != "").limit(1).count() > 0
    edges = (
        pairs.join(nodes.select(F.col("raw").alias("sraw"), F.col("id").alias("src")), "sraw")
        .join(nodes.select(F.col("raw").alias("traw"), F.col("id").alias("dst")), "traw")
        .select(
            "src",
            "dst",
            F.when(F.col("wraw") != "", F.col("wraw").cast("double"))
            .otherwise(1.0)
            .alias("weight"),
            F.when(F.col("start_raw") != "", F.col("start_raw").cast("double")).alias("start"),
        )
    )
    if not has_dynamics:
        edges = edges.drop("start")
    if not directed:
        cols = edges.columns
        flipped = edges.withColumnRenamed("src", "_t").withColumnRenamed("dst", "src")
        flipped = flipped.withColumnRenamed("_t", "dst").select(cols)
        edges = edges.union(flipped).dropDuplicates(["src", "dst"])
    return nodes, edges, directed


def write_gexf(edges: DataFrame, path: str, directed: bool = False) -> None:
    """GEXF static writer (``GEXFWriter`` analog): one part-file of XML.
    Small-graph export format — the header/footer concat runs through a
    single coalesced partition by design (exports are presentation-sized;
    the engine's native interchange format stays parquet)."""
    e = edges
    if not directed:
        e = e.filter(F.col("src") <= F.col("dst"))
    node_xml = (
        e.select(F.explode(F.array("src", "dst")).alias("id"))
        .distinct()
        .select(F.format_string('            <node id="%s" label="%s"/>', "id", "id").alias("x"))
    )
    edge_xml = e.select(
        F.format_string(
            '            <edge source="%s" target="%s" weight="%s"/>',
            "src",
            "dst",
            F.col("weight").cast("string"),
        ).alias("x")
    )
    mode = "directed" if directed else "undirected"
    header = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">',
        f'    <graph mode="static" defaultedgetype="{mode}">',
        "        <nodes>",
    ]
    mid = ["        </nodes>", "        <edges>"]
    footer = ["        </edges>", "    </graph>", "</gexf>"]
    spark = edges.sparkSession
    parts = (
        spark.createDataFrame([(x,) for x in header], "x string")
        .unionByName(node_xml.orderBy("x"))
        .unionByName(spark.createDataFrame([(x,) for x in mid], "x string"))
        .unionByName(edge_xml.orderBy("x"))
        .unionByName(spark.createDataFrame([(x,) for x in footer], "x string"))
    )
    parts.coalesce(1).write.mode("overwrite").text(path)


def write_dot(edges: DataFrame, path: str, directed: bool = False) -> None:
    """DOT/GraphViz writer (``DotGraphWriter``, ``graphio.pyx:451-463`` —
    the reference ships DOT as writer-only; Format.DOT/Format.GraphViz both
    map to it at graphio.pyx:1526-1527). One ``a -- b;`` (or ``a -> b;``)
    line per edge, weights as ``[weight=w]`` attributes."""
    op = "->" if directed else "--"
    header = "digraph G {" if directed else "graph G {"
    has_w = "weight" in edges.columns
    body = edges.select(
        F.concat(
            F.col("src").cast("string"), F.lit(f" {op} "),
            F.col("dst").cast("string"),
            (
                F.concat(F.lit(" [weight="), F.col("weight").cast("string"), F.lit("]"))
                if has_w else F.lit("")
            ),
            F.lit(";"),
        ).alias("x")
    )
    spark = edges.sparkSession
    parts = (
        spark.createDataFrame([(header,)], "x string")
        .unionByName(body.orderBy("x"))
        .unionByName(spark.createDataFrame([("}",)], "x string"))
    )
    parts.coalesce(1).write.mode("overwrite").text(path)


def read_dot(spark: SparkSession, path: str):
    """Minimal DOT reader (roundtrip partner of :func:`write_dot`): integer
    node ids, ``a -- b`` / ``a -> b`` edge statements with an optional
    ``[weight=w]``. Returns (edges(src, dst, weight), directed)."""
    txt = spark.read.text(path)
    directed = txt.filter(F.col("value").rlike(r"^\s*digraph\b")).limit(1).count() > 0
    pat = r"^\s*(\d+)\s*(--|->)\s*(\d+)\s*(?:\[weight=([0-9.eE+-]+)\])?\s*;"
    rows = txt.select(
        F.regexp_extract("value", pat, 1).alias("src"),
        F.regexp_extract("value", pat, 3).alias("dst"),
        F.regexp_extract("value", pat, 4).alias("w"),
    ).filter(F.col("src") != "")
    edges = rows.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.when(F.col("w") == "", F.lit(1.0)).otherwise(F.col("w").cast("double")).alias("weight"),
    )
    return edges, directed


def read_rb(spark: SparkSession, path: str):
    """Rutherford-Boeing reader (``RBGraphReader.cpp`` /
    ``RBMatrixReader.cpp`` parity; fixture ``input/tiny_05.rb``): 4 header
    lines (line 2 = totalRows nPtrRows nIdxRows nValRows; line 3 =
    fmt nCols nRows nVals), then the CSC arrays as whitespace-separated
    tokens split across known line ranges. Supported fmt: r/i/p +
    a (assembled), 's' symmetrizes (undirected in the reference).

    Distributed plan: token global positions come from
    :func:`networkit_spark.plans.ids.dense_ids` ranks over (lineno, pos) —
    range-partitioned sort, NO unpartitioned window; the CSC->COO column
    assignment is an ``explode(sequence(ptr[c], ptr[c+1]-1))`` (linear) join
    on token index rather than a non-equi range join (quadratic).
    Returns (nodes, edges); matrix entry (row, col, v) -> edge row->col.
    """
    from networkit_spark.plans.ids import dense_ids

    lines = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, lineno long").persist()
    hdr = {r.lineno: r.line for r in df.filter(F.col("lineno") < 4).collect()}
    counts = hdr[1].split()
    n_ptr_rows, n_idx_rows, n_val_rows = int(counts[1]), int(counts[2]), int(counts[3])
    h3 = hdr[2].split()
    fmt = h3[0].lower()
    n_cols, n_rows = int(h3[1]), int(h3[2])
    if fmt[0] not in ("r", "i", "p"):
        raise ValueError(f"unsupported RB value type {fmt!r} (r/i/p only)")
    if fmt[2] != "a":
        raise ValueError("only assembled (a) RB matrices are supported")
    pattern_only = fmt[0] == "p"
    symmetric = fmt[1] == "s"

    def _section_tokens(first_line: int, n_lines: int):
        """(idx, token) 0-based global token rank within the section."""
        toks = (
            df.filter(
                (F.col("lineno") >= first_line)
                & (F.col("lineno") < first_line + n_lines)
            )
            .select(
                "lineno",
                F.posexplode(F.split(F.trim("line"), r"\s+")).alias("pos", "tok"),
            )
            .filter(F.col("tok") != "")
            # RB lines are <= 80 chars -> < 1e5 tokens; composite order key
            .select((F.col("lineno") * 100000 + F.col("pos")).alias("k"), "tok")
        )
        ranked = dense_ids(toks.select("k"), "k", id_col="idx", distinct=False)
        return toks.join(ranked, "k").select("idx", "tok")

    p0 = 4
    ptr = _section_tokens(p0, n_ptr_rows).select(
        F.col("idx").alias("c"), (F.col("tok").cast("long") - 1).alias("p")
    )
    # consecutive pointer pairs -> exploded (token_idx, col) assignment
    nxt = ptr.select((F.col("c") - 1).alias("c"), F.col("p").alias("p_next"))
    col_of = (
        ptr.join(nxt, "c")
        .filter(F.col("p_next") > F.col("p"))
        .select(
            F.col("c").alias("col"),
            F.explode(F.sequence("p", F.col("p_next") - 1)).alias("idx"),
        )
    )
    rows = _section_tokens(p0 + n_ptr_rows, n_idx_rows).select(
        "idx", (F.col("tok").cast("long") - 1).alias("row")
    )
    coo = col_of.join(rows, "idx")
    if pattern_only:
        edges = coo.select(
            F.col("row").alias("src"), F.col("col").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    else:
        vals = _section_tokens(p0 + n_ptr_rows + n_idx_rows, n_val_rows).select(
            "idx", F.col("tok").cast("double").alias("w")
        )
        edges = coo.join(vals, "idx").select(
            F.col("row").alias("src"), F.col("col").alias("dst"),
            F.col("w").alias("weight"),
        )
    if symmetric:
        edges = edges.union(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    if n_cols != n_rows:
        raise ValueError("RB matrix is not square - cannot build a graph")
    nodes = spark.range(n_cols).select(F.col("id").cast("long").alias("id"))
    return nodes, edges


def write_gml(edges: DataFrame, nodes: DataFrame, path: str, directed: bool = True) -> None:
    """GML writer (``GMLGraphWriter.cpp:15-37``): node blocks then edge
    blocks; undirected graphs pass canonical rows (each edge once, like the
    reference's forEdges). Weighted rows emit a ``weight`` attribute (read
    back by :func:`read_gml`). Sequential text format -> driver-streamed."""
    has_w = "weight" in edges.columns
    with open(path, "w") as f:
        f.write("graph [\n")
        if directed:
            f.write("  directed 1\n")
        for row in nodes.orderBy("id").toLocalIterator():
            f.write(f"  node [\n    id {row['id']}\n  ]\n")
        for row in edges.orderBy("src", "dst").toLocalIterator():
            f.write(f"  edge [\n    source {row['src']}\n    target {row['dst']}\n")
            if has_w:
                f.write(f"    weight {row['weight']}\n")
            f.write("  ]\n")
        f.write("]\n")


def write_graphml(
    edges: DataFrame, nodes: DataFrame, path: str, directed: bool = True
) -> None:
    """GraphML writer (``graphio.pyx:2325`` GraphMLWriter): key d1 = weight
    when present; ids written as ``n<k>`` like yEd-style exports our reader
    dictionary-encodes back."""
    has_w = "weight" in edges.columns
    dflt = "directed" if directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        if has_w:
            f.write('  <key for="edge" id="d1" attr.name="weight" attr.type="double"/>\n')
        f.write(f'  <graph id="G" edgedefault="{dflt}">\n')
        for row in nodes.orderBy("id").toLocalIterator():
            f.write(f'    <node id="n{row["id"]}"/>\n')
        for row in edges.orderBy("src", "dst").toLocalIterator():
            if has_w:
                f.write(
                    f'    <edge source="n{row["src"]}" target="n{row["dst"]}">'
                    f'<data key="d1">{row["weight"]}</data></edge>\n'
                )
            else:
                f.write(f'    <edge source="n{row["src"]}" target="n{row["dst"]}"/>\n')
        f.write("  </graph>\n</graphml>\n")


def write_metis(edges: DataFrame, n: int, path: str, weighted: bool = False) -> None:
    """METIS writer (``METISGraphWriter.cpp:20-50``): header ``n m fmt``,
    line i+1 = 1-based neighbors of node i (undirected symmetrized input;
    m = #undirected edges). ``weighted`` emits ``v w`` pairs (fmt=1)."""
    sym = edges.select("src", "dst", *(["weight"] if weighted else []))
    m = sym.filter(F.col("src") <= F.col("dst")).count()
    if weighted:
        nbr = F.concat(F.col("dst") + 1, F.lit(" "), F.col("weight"))
    else:
        nbr = (F.col("dst") + 1).cast("string")
    rows = (
        sym.groupBy("src")
        .agg(F.array_join(F.array_sort(F.collect_list(nbr)), " ").alias("line"))
        .select(F.col("src").alias("node"), "line")
    )
    by_node = {r["node"]: r["line"] for r in rows.toLocalIterator()}
    with open(path, "w") as f:
        f.write(f"{n} {m} {int(weighted)}\n")
        for u in range(n):
            f.write(by_node.get(u, "") + "\n")


def write_snap(edges: DataFrame, n: int, path: str) -> None:
    """SNAPGraphWriter (``io/SNAPGraphWriter.cpp:15-25``): a ``p n m u u 0``
    problem line then one ``u v`` line per undirected edge (canonical rows,
    src < dst expected from the caller)."""
    spark = edges.sparkSession
    body = edges.select(
        F.lit(1).alias("o"),
        F.col("src").cast("long").alias("k1"),
        F.col("dst").cast("long").alias("k2"),
        F.concat(
            F.col("src").cast("string"), F.lit(" "), F.col("dst").cast("string")
        ).alias("x"),
    )
    m = edges.count()
    header = spark.createDataFrame(
        [(0, 0, 0, f"p {n} {m} u u 0")], "o int, k1 long, k2 long, x string"
    )
    (
        header.unionByName(body)
        .orderBy("o", "k1", "k2")
        .select("x")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """LineFileReader (graphio.pyx:514-533) -> (line_no, line), 0-based in
    file order. Per-file order is inherently positional, so each file is
    one wholetext task (line_no = split position); a directory of files
    parallelizes file-level.
    """
    return (
        spark.read.text(path, wholetext=True)
        # std::getline yields no trailing empty element for a final newline
        .select(F.regexp_replace(F.col("value"), "\n$", "").alias("value"))
        .select(F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "line"))
    )


def read_graphs(
    spark,
    dir_path: str,
    pattern: str,
    reader=None,
    some: int | None = None,
    exclude: str | None = None,
    **kwargs,
) -> dict:
    """``readGraphs`` (graphio.pyx:1347): read every graph file in
    ``dir_path`` whose name matches the Unix-style ``pattern`` (minus
    those matching ``exclude``), at most ``some`` of them, into a dict
    of filename -> whatever the reader returns (for this module's
    readers: a (nodes, edges) DataFrame pair). ``reader`` is any of this module's
    read functions (default: dispatch per file via :func:`guess_format`);
    extra kwargs are forwarded to the reader. The frames stay lazy —
    nothing is scanned until a query runs."""
    import fnmatch
    import os

    out: dict = {}
    for name in sorted(os.listdir(dir_path)):
        if not fnmatch.fnmatch(name, pattern):
            continue
        if exclude is not None and fnmatch.fnmatch(name, exclude):
            continue
        path = os.path.join(dir_path, name)
        if reader is None:
            fmt = guess_format(path)
            fn = {
                "edgelist-tab-zero": read_edge_list,
                "snap": read_snap,
                "konect": read_konect,
                "metis": read_metis,
                "rb": read_rb,
            }.get(fmt)
            if fn is None:
                raise ValueError(f"no reader for guessed format {fmt!r}: {path}")
        else:
            fn = reader
        out[name] = fn(spark, path, **kwargs)
        if some is not None and len(out) >= some:
            break
    return out
