"""Canonical edge-table data model + graph transforms.

The reference's central structure is the mutable in-memory adjacency-list
``Graph`` (``include/networkit/graph/Graph.hpp:107``: vector-of-vectors
``inEdges/outEdges``, dense uint64 node ids, optional weights/direction).
Our relational dual:

- ``edges(src long, dst long, weight double)`` — one row per directed edge;
  undirected graphs are symmetrized (both (u,v) and (v,u) rows), mirroring
  NetworKit's double storage (``GraphBuilder.hpp:22-27``).
- ``nodes(id long)`` — carried separately so isolated nodes survive
  (teleport mass in PageRank, singleton labels in PLP).
- score/label results are ``(node long, score double)`` / ``(node long,
  label long)`` DataFrames — the ``Partition`` analog
  (``include/networkit/structures/Partition.hpp:27``).

Every transform below is a narrow projection/filter or a single
shuffle-on-key — the plans Catalyst produces are the ones you would write by
hand, and all of them scale linearly in executors (no driver-side state).

Reference parity map (``networkit/graphtools.pyx:48-717``,
``cpp/graph/GraphTools.cpp``): see function docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def edges_df(spark: SparkSession, pairs, weighted: bool = False) -> DataFrame:
    """Build an edge DataFrame from (u, v[, w]) tuples (test/ingest helper).

    Reference analog: ``Graph.addEdge`` bulk path (``graph.pyx:427-494``
    numpy COO fast path).
    """
    rows = [(int(p[0]), int(p[1]), float(p[2]) if weighted else 1.0) for p in pairs]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def nodes_from_edges(edges: DataFrame) -> DataFrame:
    """nodes(id) = distinct endpoint ids. Isolated nodes need an explicit table."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def nodes_range(spark: SparkSession, n: int) -> DataFrame:
    """Dense node table [0, n) — the reference's ``[0, z)`` id domain."""
    return spark.range(n).select(F.col("id").cast("long").alias("id"))


# -- transforms (GraphTools parity) -----------------------------------------

def transpose(edges: DataFrame) -> DataFrame:
    """Reverse every edge. Ref: ``GraphTools.cpp:344`` (directed transpose)."""
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Directed -> undirected: union with transpose, dedupe on (src, dst).

    Ref: ``graphtools.pyx:293 toUndirected``; double storage per
    ``GraphBuilder.hpp:22-27``. Parallel (multi-)edges combine **additively**:
    in the reference an undirected multigraph stores each parallel edge
    separately and kernels sum over them (e.g. the PageRank gather,
    ``PageRank.cpp:70-74``, and ``weightedDegree``), so summing weights on
    (src, dst) is the exact relational equivalent.
    """
    return (
        edges.select(*EDGE_COLS)
        .union(transpose(edges))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def remove_self_loops(edges: DataFrame) -> DataFrame:
    """Ref: ``graph.pyx:556 removeSelfLoops``."""
    return edges.filter(F.col("src") != F.col("dst"))


def remove_multi_edges(edges: DataFrame, combine: str = "first") -> DataFrame:
    """Ref: ``graph.pyx:564 removeMultiEdges``. combine in {first, sum}."""
    if combine == "sum":
        return edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    return edges.groupBy("src", "dst").agg(F.min("weight").alias("weight"))


def to_unweighted(edges: DataFrame) -> DataFrame:
    """Ref: ``graphtools.pyx:312 toUnweighted``."""
    return edges.select("src", "dst", F.lit(1.0).alias("weight"))


def subgraph_from_nodes(edges: DataFrame, keep: DataFrame, in_and_out: bool = True) -> DataFrame:
    """Edges with both endpoints in ``keep(id)`` (semi-join x2).

    Ref: ``GraphTools.cpp:260 subgraphFromNodes``. ``in_and_out=False`` keeps
    edges with only the src side in the set
    (``subgraphAndNeighborsFromNodes``, ``GraphTools.cpp:264``).
    """
    out = edges.join(keep.select(F.col("id").alias("src")), "src", "left_semi")
    if not in_and_out:
        return out
    return out.join(keep.select(F.col("id").alias("dst")), "dst", "left_semi").select(*EDGE_COLS)


def compact_node_ids(edges: DataFrame, nodes: DataFrame | None = None):
    """Re-map sparse ids to dense [0, n) by ascending old id.

    Ref: ``GraphTools::getContinuousNodeIds`` + ``getCompactedGraph``
    (``GraphTools.cpp:424-439``). Returns (mapping(old_id, id), edges').
    """
    from networkit_spark.plans.ids import dense_ids

    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    mapping = dense_ids(nodes.select(F.col("id").alias("old_id")), "old_id").select(
        "old_id", "id"
    )
    e = (
        edges.join(mapping.select(F.col("old_id").alias("src"), F.col("id").alias("new_src")), "src")
        .join(mapping.select(F.col("old_id").alias("dst"), F.col("id").alias("new_dst")), "dst")
        .select(F.col("new_src").alias("src"), F.col("new_dst").alias("dst"), "weight")
    )
    return mapping, e


# -- degree tables (the core materialized intermediate) ----------------------

def out_degrees(edges: DataFrame, nodes: DataFrame | None = None, weighted: bool = True) -> DataFrame:
    """degrees(node, deg, wdeg): out-degree and weighted out-degree per node.

    Ref: ``Graph::computeWeightedDegree`` (``Graph.cpp:462-468``); isolated /
    sink nodes get deg 0 via the left join (ref keeps them in ``[0, z)``).
    One partial+final hash aggregation; reused by every kernel.
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg"), F.sum("weight").alias("wdeg")
    )
    if nodes is None:
        return deg
    return (
        nodes.select(F.col("id").alias("node"))
        .join(deg, "node", "left")
        .fillna({"deg": 0, "wdeg": 0.0})
    )


def in_degrees(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    return out_degrees(transpose(edges), nodes)


# -- global properties (GraphTools parity) -----------------------------------

def size(edges: DataFrame, nodes: DataFrame | None = None) -> tuple[int, int]:
    """(n, m). Ref: ``GraphTools.cpp:228 size``."""
    nodes = nodes if nodes is not None else nodes_from_edges(edges)
    return nodes.count(), edges.count()


def density(edges: DataFrame, nodes: DataFrame | None = None, directed: bool = True) -> float:
    """Ref: ``GraphTools.hpp density`` — m / (n*(n-1)) (directed)."""
    n, m = size(edges, nodes)
    if n <= 1:
        return 0.0
    return m / (n * (n - 1)) if directed else m / (n * (n - 1))


def volume(edges: DataFrame) -> float:
    """Sum of edge weights. Ref: ``GraphTools.hpp:131-190 volume``."""
    return edges.agg(F.sum("weight")).first()[0] or 0.0


def max_degree(edges: DataFrame, in_: bool = False) -> int:
    """Ref: ``GraphTools.cpp:19-38 maxDegree/maxInDegree``."""
    key = "dst" if in_ else "src"
    row = edges.groupBy(key).count().agg(F.max("count")).first()
    return int(row[0] or 0)


def check_consistency(edges: DataFrame) -> bool:
    """No duplicate (src, dst) rows. Ref: ``graph.pyx:820 checkConsistency``."""
    dup = (
        edges.groupBy("src", "dst").count().filter(F.col("count") > 1).limit(1).count()
    )
    return dup == 0


def append_graph(
    edges_a: DataFrame,
    nodes_a: DataFrame,
    edges_b: DataFrame,
    nodes_b: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """GraphTools::append (GraphTools.cpp:382-394): add B's nodes after A's
    (B's node u becomes ``u + max(A)+1`` — the compact-id dual of the
    reference's sequential addNode walk) and its edges under the remap.
    Returns (edges, nodes)."""
    off_row = nodes_a.agg(F.max("id")).first()[0]
    off = int(off_row) + 1 if off_row is not None else 0
    nb = nodes_b.select((F.col("id") + off).alias("id"))
    eb = edges_b.select(
        (F.col("src") + off).alias("src"),
        (F.col("dst") + off).alias("dst"),
        *[c for c in edges_b.columns if c not in ("src", "dst")],
    )
    return edges_a.unionByName(eb), nodes_a.union(nb)


def merge_graphs(
    edges_a: DataFrame,
    nodes_a: DataFrame,
    edges_b: DataFrame,
    nodes_b: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """GraphTools::merge (GraphTools.cpp:396-420): same id space; node set =
    union, edge set = union with A's weight winning on conflicts (the
    reference skips addEdge when the edge already exists)."""
    nodes = nodes_a.union(nodes_b).distinct()
    keep = [c for c in edges_a.columns if c not in ("src", "dst")]
    new_b = edges_b.join(edges_a.select("src", "dst"), ["src", "dst"], "left_anti")
    return edges_a.unionByName(new_b.select("src", "dst", *keep)), nodes
