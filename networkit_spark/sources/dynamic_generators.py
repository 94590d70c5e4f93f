"""Dynamic graph generators — GraphEvent stream producers.

References: ``cpp/generators/DynamicPathGenerator.cpp``,
``DynamicDorogovtsevMendesGenerator.cpp``, ``DynamicForestFireGenerator.cpp``.
Each ``generate(nSteps)`` emits NODE_ADDITION / EDGE_ADDITION / TIME_STEP
events that the streaming consumers (``streaming/events.py`` windowed
analytics, ``streaming/dyn_*`` incremental kernels, ``streaming/dgs``
round-trip IO) replay.

Event streams are inherently sequential (each step reads the graph the
previous steps built), so these run driver-side with a portable seeded
RNG, guarded by ``_guard_driver_n`` — the same contract as the static
small-n generators (``havel_hakimi``, ``dorogovtsev_mendes``); the
DISTRIBUTED work is in the consumers, not the producers.  Output schema
matches ``streaming/dgs.read_dgs``: (seq long, etype string, u long,
v long, w double) — TIME_STEP rows carry null u/v/w.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from networkit_spark.sources.generators import _guard_driver_n
from networkit_spark.streaming.events import (
    EDGE_ADDITION,
    NODE_ADDITION,
    TIME_STEP,
)

_SCHEMA = "seq long, etype string, u long, v long, w double"


def _df(spark: SparkSession, rows) -> DataFrame:
    return spark.createDataFrame(
        [(i, t, u, v, w) for i, (t, u, v, w) in enumerate(rows)], _SCHEMA
    )


def dynamic_path_events(spark: SparkSession, n_steps: int) -> DataFrame:
    """``DynamicPathGenerator.cpp:12-29``: one growing path — per step a
    new node and the edge to its predecessor, then a TIME_STEP."""
    _guard_driver_n(n_steps, "dynamic_path_events", "spark.range-based bulk ingest")
    rows = [(NODE_ADDITION, 0, None, None)]
    u = 0
    for _ in range(n_steps):
        v = u + 1
        rows.append((NODE_ADDITION, v, None, None))
        rows.append((EDGE_ADDITION, u, v, 1.0))
        rows.append((TIME_STEP, None, None, None))
        u = v
    return _df(spark, rows)


def dynamic_dorogovtsev_mendes_events(
    spark: SparkSession, n_steps: int, seed: int = 42
) -> DataFrame:
    """``DynamicDorogovtsevMendesGenerator.cpp:14-53``: seed triangle, then
    per step a new node attached to both endpoints of a uniformly random
    existing edge."""
    _guard_driver_n(n_steps, "dynamic_dorogovtsev_mendes_events", "barabasi_albert")
    rng = random.Random(seed)
    rows = [
        (NODE_ADDITION, 0, None, None),
        (NODE_ADDITION, 1, None, None),
        (NODE_ADDITION, 2, None, None),
        (EDGE_ADDITION, 0, 1, 1.0),
        (EDGE_ADDITION, 1, 2, 1.0),
        (EDGE_ADDITION, 2, 0, 1.0),
        (TIME_STEP, None, None, None),
    ]
    edges = [(0, 1), (1, 2), (2, 0)]
    u = 2
    for _ in range(n_steps):
        u += 1
        rows.append((NODE_ADDITION, u, None, None))
        s, t = edges[rng.randrange(len(edges))]
        edges.append((s, u))
        edges.append((t, u))
        rows.append((EDGE_ADDITION, u, s, 1.0))
        rows.append((EDGE_ADDITION, u, t, 1.0))
        rows.append((TIME_STEP, None, None, None))
    return _df(spark, rows)


def dynamic_forest_fire_events(
    spark: SparkSession,
    n_steps: int,
    p: float,
    directed: bool = False,
    r: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """``DynamicForestFireGenerator.cpp:26-140``: per step a new node burns
    outward from a random ambassador — at each burned node, neighbors are
    claimed one at a time while a uniform draw stays below ``p`` (``p * r``
    for in-neighbors when directed), then the new node links to every
    burned node."""
    _guard_driver_n(n_steps, "dynamic_forest_fire_events", "lsh/banded ingest of a logged stream")
    rng = random.Random(seed)
    rows = []
    fwd: dict[int, list[int]] = {}
    bwd: dict[int, list[int]] = {}

    def select_edges(cands: list[int], prob: float, visited) -> list[int]:
        picked = []
        pool = [x for x in cands if x not in visited]
        while pool and rng.random() <= prob:
            i = rng.randrange(len(pool))
            picked.append(pool[i])
            pool[i] = pool[-1]
            pool.pop()
        return picked

    rows.append((NODE_ADDITION, 0, None, None))
    rows.append((TIME_STEP, None, None, None))
    fwd[0] = []
    bwd[0] = []
    n = 1
    for _ in range(max(0, n_steps - 1)):
        a = rng.randrange(n)
        v = n
        n += 1
        fwd[v] = []
        bwd[v] = []
        rows.append((NODE_ADDITION, v, None, None))
        visited = {a}
        active = [a]
        burned = [a]
        while active:
            w = active.pop(0)
            edges = select_edges(fwd[w], p, visited)
            if directed:
                edges = sorted(set(edges) | set(select_edges(bwd[w], p * r, visited)))
            for x in edges:
                visited.add(x)
                active.append(x)
                burned.append(x)
        for w in burned:
            fwd[v].append(w)
            bwd[w].append(v)
            if not directed:
                fwd[w].append(v)
                bwd[v].append(w)
            rows.append((EDGE_ADDITION, v, w, 1.0))
        rows.append((TIME_STEP, None, None, None))
    return _df(spark, rows)


def events_to_edges(events: DataFrame) -> DataFrame:
    """Materialize the final edge table of an addition-only event stream
    (the distributed consumer-side view)."""
    from pyspark.sql import functions as F

    return (
        events.filter(F.col("etype") == EDGE_ADDITION)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), F.col("w").alias("weight"))
    )
