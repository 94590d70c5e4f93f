"""forNodePairs analog: ordered node-pair enumeration (guarded cross join).

Reference: ``networkit/graph.pyx:1729 forNodePairs`` — sequential handler
over all O(n²) ordered pairs (u < v). Used by the reference's small-graph
utilities (exact all-pairs statistics, brute-force oracles).

Spark spelling: ``crossJoin`` with a ``u < v`` filter. Catalyst plans it as
a broadcast nested-loop join when one side fits the broadcast threshold —
exactly right for the primitive's legitimate use (a filtered subset of
nodes). O(n²) output is inherent to the SEMANTICS, not the engine, so the
entry point carries the same explicit guard as the driver-side generators:
callers must opt in past ``max_nodes`` (at 10¹² documents, an unguarded
all-pairs is the canonical scale accident).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def for_node_pairs(
    nodes: DataFrame,
    node_col: str = "node",
    max_nodes: int = 100_000,
) -> DataFrame:
    """-> DataFrame(u, v) of all ordered pairs u < v from ``nodes``.

    Raises above ``max_nodes`` distinct nodes (n² row blowup); pass a larger
    cap deliberately if you truly want more (the reference's forNodePairs is
    likewise an inherently quadratic small-n tool).
    """
    distinct = nodes.select(F.col(node_col)).distinct()
    n = distinct.count()
    if n > max_nodes:
        raise ValueError(
            f"for_node_pairs over {n} nodes would emit {n * (n - 1) // 2:,} "
            f"pairs; pass max_nodes>={n} to opt in (quadratic by semantics)"
        )
    a = distinct.select(F.col(node_col).alias("u"))
    b = distinct.select(F.col(node_col).alias("v"))
    return a.crossJoin(b).filter(F.col("u") < F.col("v"))
