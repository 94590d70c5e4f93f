"""networkx interop — parity for the reference's ``networkit/nxadapter.py``
(``nx2nk`` at :41, ``nk2nx`` at :165).

These are DRIVER-SIDE conveniences by construction (networkx is a
single-machine library): ``to_networkx`` collects the edge table, so it is
for small graphs / visualization / test-oracle use only — the inverse of
this engine's design goal. Guarded with a row-count ceiling so nobody
accidentally collects a 10^12-edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_COLLECT_EDGES = 5_000_000


def to_networkx(
    edges: DataFrame,
    directed: bool = False,
    weighted: bool = True,
    max_edges: int = MAX_COLLECT_EDGES,
):
    """Collect an edge table into a networkx Graph/DiGraph (nk2nx analog)."""
    import networkx as nx

    n_edges = edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"to_networkx: {n_edges} edges > max_edges={max_edges}; "
            "networkx is single-machine — subgraph or sparsify first"
        )
    G = nx.DiGraph() if directed else nx.Graph()
    cols = ["src", "dst"] + (["weight"] if "weight" in edges.columns and weighted else [])
    for r in edges.select(*cols).collect():
        if weighted and len(cols) == 3:
            G.add_edge(r.src, r.dst, weight=r.weight)
        else:
            G.add_edge(r.src, r.dst)
    return G


def from_networkx(spark: SparkSession, G) -> DataFrame:
    """networkx graph -> (src, dst, weight) edge DataFrame (nx2nk analog).

    Non-integer node labels are dictionary-encoded by sorted label (same
    contract as sources/edgelist.read_edge_list string ids); the mapping is
    returned as a second DataFrame via ``from_networkx_with_map`` when
    needed."""
    df, _ = from_networkx_with_map(spark, G)
    return df


def from_networkx_with_map(spark: SparkSession, G):
    all_int = all(isinstance(v, int) for v in G.nodes)
    if all_int:
        ids = {v: v for v in G.nodes}
    else:
        ids = {v: i for i, v in enumerate(sorted(G.nodes, key=str))}
    rows = [
        (int(ids[u]), int(ids[v]), float(d.get("weight", 1.0)))
        for u, v, d in G.edges(data=True)
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    mapping = spark.createDataFrame(
        [(str(v), int(i)) for v, i in ids.items()], "label string, id long"
    )
    if G.is_directed():
        return edges, mapping
    # undirected nx graph -> store one canonical direction per edge
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ),
        mapping,
    )
