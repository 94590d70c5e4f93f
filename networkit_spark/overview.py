"""Graph profile "dashboard" — ``nk.overview(G)`` parity.

Reference: ``networkit/__init__.py:111-159`` — chains size, density, degree
stats, clustering coefficient, components and assortativity into one
summary. Ours is a handful of DataFrame aggregates over the edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import nodes_from_edges
from networkit_spark.operators.components import ConnectedComponents
from networkit_spark.operators.correlation import degree_assortativity
from networkit_spark.operators.triangles import (
    avg_local_clustering_coefficient,
    global_clustering_coefficient,
)


def overview(und_edges: DataFrame, nodes: DataFrame | None = None,
             with_components: bool = True) -> dict:
    """Summary dict for a symmetrized undirected edge table."""
    nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
    n = nodes.count()
    m = und_edges.count() // 2
    deg = und_edges.groupBy("src").agg(F.count("*").alias("d"))
    drow = deg.agg(
        F.min("d"), F.max("d"), F.avg("d"), F.expr("percentile_approx(d, 0.5)")
    ).first()
    out = {
        "nodes": n,
        "edges": m,
        "density": (2.0 * m / (n * (n - 1))) if n > 1 else 0.0,
        "isolated_nodes": n - deg.count(),
        "min_degree": int(drow[0] or 0),
        "max_degree": int(drow[1] or 0),
        "avg_degree": float(drow[2] or 0.0),
        "median_degree": int(drow[3] or 0),
        "degree_assortativity": degree_assortativity(und_edges),
        "global_clustering_coefficient": global_clustering_coefficient(und_edges),
        "avg_local_clustering_coefficient": avg_local_clustering_coefficient(und_edges, nodes),
    }
    if with_components:
        cc = ConnectedComponents().run(und_edges, nodes)
        sizes = cc.component_sizes().agg(F.max("size"), F.count("*")).first()
        out["connected_components"] = int(sizes[1])
        out["largest_component_size"] = int(sizes[0])
    return out
