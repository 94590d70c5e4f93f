"""PostscriptWriter — reference parity for ``networkit/cpp/viz/
PostscriptWriter.cpp`` (EPS rendering of a laid-out graph with the 24-color
cyclic cluster palette).

Spark shape: the geometry (bounding box, scaling, per-edge/per-node colored
draw commands) is computed as DataFrame column expressions — one pass over
edges, one over nodes — and only the finished text lines stream to the
single output file through ``toLocalIterator`` (same single-file assembly
as the SNAP/DOT writers; EPS is a presentation artifact, inherently one
file). Nothing quadratic, no driver-side math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# PostscriptWriter.cpp:20-31 cyclic palette
_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]

_SIZE = 1020.0
_BORDER = 10.0

_HEADER = (
    "%!PS-Adobe-1.0\n"
    "%%Title: NetworKit visualization\n"
    f"%%BoundingBox: 0.000 0.000 {_SIZE} {_SIZE}\n"
    "%%EndComments\n%%EndProlog\ngsave\n"
)
_MACROS = (
    "/p {newpath} bind def\n/m {moveto} bind def\n/r {rmoveto} bind def\n"
    "/k {rlineto} bind def\n/l {lineto} bind def\n/n {rlineto} bind def\n"
    "/c {setrgbcolor} bind def\n/s {stroke} bind def\n/w {setlinewidth} bind def\n"
    "/h {show} bind def\n/a {arc closepath fill} bind def\n"
    "/b {closepath eofill} bind def\n"
)


def _color_cols(label_col):
    """(r, g, b) columns from the 24-color cyclic palette."""
    idx = F.pmod(label_col, F.lit(len(_COLORS))).cast("int")
    rs = F.array(*[F.lit(c[0]) for c in _COLORS])
    gs = F.array(*[F.lit(c[1]) for c in _COLORS])
    bs = F.array(*[F.lit(c[2]) for c in _COLORS])
    return rs[idx], gs[idx], bs[idx]


def write_postscript(edges: DataFrame, coords: DataFrame, path: str,
                     labels: DataFrame | None = None) -> None:
    """EPS of the graph: ``coords`` = (node, x, y); ``labels`` optional
    (node, label) partition — same-cluster edges and the node discs get the
    cluster's palette color, cut edges black (PostscriptWriter.cpp:86-132).
    """
    fmt = lambda c: F.format_number(c.cast("double"), 3)  # noqa: E731
    stats = coords.agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).first()
    sx = (_SIZE - 2 * _BORDER) / ((stats["x1"] - stats["x0"]) or 1.0)
    sy = (_SIZE - 2 * _BORDER) / ((stats["y1"] - stats["y0"]) or 1.0)

    def adj(xc, x0, s):
        return (xc - F.lit(x0)) * F.lit(s) + F.lit(_BORDER)

    c = coords.select(
        "node",
        adj(F.col("x"), stats["x0"], sx).alias("px"),
        adj(F.col("y"), stats["y0"], sy).alias("py"),
    )
    if labels is not None:
        c = c.join(labels.select("node", "label"), "node", "left")
    else:
        c = c.withColumn("label", F.lit(None).cast("long"))

    e = (
        edges.filter(F.col("src") < F.col("dst"))
        .join(c.select(F.col("node").alias("src"), F.col("px").alias("ux"),
                       F.col("py").alias("uy"), F.col("label").alias("lu")), "src")
        .join(c.select(F.col("node").alias("dst"), F.col("px").alias("vx"),
                       F.col("py").alias("vy"), F.col("label").alias("lv")), "dst")
    )
    same = F.col("lu").isNotNull() & (F.col("lu") == F.col("lv"))
    er, eg, eb = _color_cols(F.col("lu"))
    edge_lines = e.select(
        F.col("src"), F.col("dst"),
        F.concat_ws(
            " ",
            F.when(same, fmt(er)).otherwise(F.lit("0.000")),
            F.when(same, fmt(eg)).otherwise(F.lit("0.000")),
            F.when(same, fmt(eb)).otherwise(F.lit("0.000")),
            F.lit("c p"),
            fmt(F.col("ux")), fmt(F.col("uy")), F.lit("m"),
            fmt(F.col("vx")), fmt(F.col("vy")), F.lit("l s"),
        ).alias("line"),
    )
    nr, ng, nb = _color_cols(F.coalesce(F.col("label"), F.lit(0)))
    node_lines = c.select(
        F.col("node"),
        F.concat_ws(
            " ",
            F.when(F.col("label").isNotNull(), fmt(nr)).otherwise(F.lit("0.000")),
            F.when(F.col("label").isNotNull(), fmt(ng)).otherwise(F.lit("0.000")),
            F.when(F.col("label").isNotNull(), fmt(nb)).otherwise(F.lit("0.000")),
            F.lit("c p"),
            fmt(F.col("px")), fmt(F.col("py")), F.lit("2.0 0.00 360.00 a s"),
        ).alias("line"),
    )
    with open(path, "w") as f:
        f.write(_HEADER)
        f.write(_MACROS)
        f.write("1.0 w\n")
        for row in edge_lines.orderBy("src", "dst").select("line").toLocalIterator():
            f.write(row["line"] + "\n")
        for row in node_lines.orderBy("node").select("line").toLocalIterator():
            f.write(row["line"] + "\n")
        f.write("grestore\n")
