"""Gephi graph-streaming export/import (file-based).

Reference: ``networkit/gephi.py`` (GephiStreamingClient.exportGraph /
exportNodeValues) — streams the graph to a running Gephi instance as
graph-streaming-API JSON events (``{"an": {...}}`` add-node,
``{"ae": {...}}`` add-edge, ``{"cn": {...}}`` change-node). The network
client itself is presentation; the FORMAT is the portable part, so this
module writes/reads the same event stream as JSON-lines files any Gephi
master can replay — produced partition-parallel (one shard per task,
``df.write.text``), no driver materialization.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_gephi_events(
    und_edges: DataFrame,
    path: str,
    node_values: DataFrame | None = None,
    value_col: str | None = None,
    directed: bool = False,
) -> None:
    """Write add-node / add-edge (and optional change-node attribute) events.

    Node ids and edge ids mirror the reference's export: node events first
    (``an``), then one ``ae`` per undirected edge (src<dst orientation,
    edge id "src_dst"), then ``cn`` value events when ``node_values``
    (node, <value_col>) is given — the exportNodeValues analog.
    """
    nodes = (
        und_edges.select(F.col("src").alias("node"))
        .union(und_edges.select(F.col("dst")))
        .distinct()
    )
    an = nodes.select(
        F.concat(
            F.lit('{"an": {"'), F.col("node").cast("string"),
            F.lit('": {"label": "'), F.col("node").cast("string"),
            F.lit('"}}}'),
        ).alias("value")
    )
    e = und_edges.select("src", "dst").filter(F.col("src") < F.col("dst")).distinct()
    ae = e.select(
        F.concat(
            F.lit('{"ae": {"'),
            F.col("src").cast("string"), F.lit("_"), F.col("dst").cast("string"),
            F.lit('": {"source": "'), F.col("src").cast("string"),
            F.lit('", "target": "'), F.col("dst").cast("string"),
            F.lit('", "directed": '), F.lit("true" if directed else "false"),
            F.lit("}}}"),
        ).alias("value")
    )
    out = an.unionByName(ae)
    if node_values is not None and value_col is not None:
        cn = node_values.select(
            F.concat(
                F.lit('{"cn": {"'), F.col("node").cast("string"),
                F.lit('": {"'), F.lit(value_col), F.lit('": '),
                F.col(value_col).cast("double").cast("string"),
                F.lit("}}}"),
            ).alias("value")
        )
        out = out.unionByName(cn)
    out.write.mode("overwrite").text(path)


_EVENT_SCHEMA = (
    "kind string, id string, source bigint, target bigint, "
    "directed boolean, attr string, value double"
)


def read_gephi_events(spark: SparkSession, path: str) -> DataFrame:
    """Parse a gephi event-stream file back into a typed event table.

    Arrow-batched JSON parse (mapInPandas) — the event objects are keyed by
    entity id, so a fixed relational schema can't be inferred by
    ``spark.read.json`` without schema explosion.
    """
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for line in b["value"]:
                if not line.strip():
                    continue
                ev = json.loads(line)
                for kind, body in ev.items():
                    for eid, attrs in body.items():
                        if kind == "ae":
                            rows.append((kind, eid, int(attrs["source"]),
                                         int(attrs["target"]),
                                         bool(attrs.get("directed", False)),
                                         None, None))
                        elif kind == "cn":
                            (attr, value), = attrs.items()
                            rows.append((kind, eid, None, None, None,
                                         attr, float(value)))
                        else:
                            rows.append((kind, eid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["kind", "id", "source", "target", "directed",
                         "attr", "value"],
            )

    return spark.read.text(path).mapInPandas(parse, _EVENT_SCHEMA)
