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
    EDGE_REMOVAL,
    EDGE_WEIGHT_UPDATE,
    NODE_ADDITION,
    NODE_REMOVAL,
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


# ---------------------------------------------------------------------------
# DynamicPubWebGenerator / DynamicHyperbolicGenerator — unlike the
# node-at-a-time streams above, each step here is BULK work (5% churn /
# fractional movement + a full proximity-edge recompute), so these run
# DISTRIBUTED: the per-step edge set reuses the grid / band joins of the
# static generators and the event diff is one full-outer join.
# ---------------------------------------------------------------------------


def _seq_events(parts: list[DataFrame]) -> DataFrame:
    """Union per-step event frames (step, prio, etype, u, v, w) and assign
    the global seq by (step, prio, u, v) — the deterministic analog of the
    reference's in-step emission order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)
    w = Window.orderBy("step", "prio", F.col("u").asc_nulls_last(), F.col("v").asc_nulls_last())
    return ev.select(
        (F.row_number().over(w) - 1).alias("seq"), "etype", "u", "v", "w"
    )


def _ev(df: DataFrame, step: int, prio: int, etype: str, u="u", v="v", w=None):
    from pyspark.sql import functions as F

    return df.select(
        F.lit(step).alias("step"),
        F.lit(prio).alias("prio"),
        F.lit(etype).alias("etype"),
        (F.col(u) if isinstance(u, str) else u).cast("long").alias("u"),
        (F.col(v).cast("long") if isinstance(v, str) else F.lit(None).cast("long")).alias("v"),
        (F.col(w).cast("double") if isinstance(w, str) else F.lit(None).cast("double")).alias("w"),
    )


def dynamic_pubweb_events(
    spark: SparkSession,
    n: int,
    num_dense_areas: int,
    neighborhood_radius: float,
    max_neighbors: int,
    n_steps: int,
    seed: int = 42,
    churn: float = 0.05,
) -> DataFrame:
    """DynamicPubWebGenerator.generate (``DynamicPubWebGenerator.cpp:24-190``):
    per step delete ``churn * n`` random nodes (incident EDGE_REMOVALs
    first), insert the same number (cluster-weighted placement,
    ``:76-100``), recompute the mutual-kNN edge set, and emit
    EDGE_WEIGHT_UPDATE for surviving edges, EDGE_REMOVAL for edges no
    longer mutually eligible, EDGE_ADDITION for new ones (``:105-175``),
    then TIME_STEP.

    Node selection / placement use the portable md5 draws; the per-step
    edge rule is the shared distributed grid join
    (``generators.pubweb_edges_from_points``); the old-vs-new diff is one
    full outer join on the canonical pair.
    """
    from pyspark.sql import functions as F

    from networkit_spark.operators.sampling import _draw
    from networkit_spark.sources.generators import (
        _pubweb_areas,
        pubweb_edges_from_points,
        pubweb_points,
    )

    radii, centers = _pubweb_areas(num_dense_areas, seed)
    pts = pubweb_points(spark, n, num_dense_areas, seed).localCheckpoint(eager=True)
    prev = (
        pubweb_edges_from_points(pts, neighborhood_radius, max_neighbors)
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=True)
    )
    num_churn = int(n * churn)
    next_id = n
    parts: list[DataFrame] = []
    mod = 1_000_000_007
    for step in range(n_steps):
        # --- deletions: lowest num_churn portable draws among alive nodes
        doomed = (
            pts.select("node", (_draw("pw_del", seed + step, F.col("node")) % mod).alias("dr"))
            .orderBy("dr", "node")
            .limit(num_churn)
            .select("node")
            .localCheckpoint(eager=True)
        )
        inc = prev.join(
            doomed.withColumnRenamed("node", "src"), "src", "left_semi"
        ).unionByName(
            prev.join(doomed.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst", "weight")
        ).select("src", "dst").distinct()
        parts.append(_ev(inc, step, 0, EDGE_REMOVAL, u="src", v="dst"))
        parts.append(_ev(doomed, step, 1, NODE_REMOVAL, u="node", v=None))
        pts = pts.join(doomed, "node", "left_anti")
        prev = prev.join(doomed.withColumnRenamed("node", "src"), "src", "left_anti") \
                   .join(doomed.withColumnRenamed("node", "dst"), "dst", "left_anti")
        # --- insertions: cluster-weighted placement (uniform over
        # areas+1 slots; slot < areas -> polar draw in that disk, else noise)
        new_nodes = spark.range(next_id, next_id + num_churn).select(
            F.col("id").alias("node")
        )
        u_slot = (_draw("pw_ins_c", seed + step, F.col("node")) % mod) / float(mod)
        u_ang = (_draw("pw_ins_a", seed + step, F.col("node")) % mod) / float(mod)
        u_dst = (_draw("pw_ins_d", seed + step, F.col("node")) % mod) / float(mod)
        u_x = (_draw("pw_ins_x", seed + step, F.col("node")) % mod) / float(mod)
        u_y = (_draw("pw_ins_y", seed + step, F.col("node")) % mod) / float(mod)
        slot = F.floor(u_slot * (num_dense_areas + 1)).cast("int")
        x = u_x
        y = u_y
        import math as _math

        for a in range(num_dense_areas):
            cxa, cya = centers[a]
            dist = u_dst * radii[a]
            x = F.when(slot == a, (F.lit(cxa) + F.cos(u_ang * 2 * _math.pi) * dist)).otherwise(x)
            y = F.when(slot == a, (F.lit(cya) + F.sin(u_ang * 2 * _math.pi) * dist)).otherwise(y)
        ins = new_nodes.select(
            "node",
            F.pmod(x, F.lit(1.0)).alias("x"),
            F.pmod(y, F.lit(1.0)).alias("y"),
        )
        parts.append(_ev(ins, step, 2, NODE_ADDITION, u="node", v=None))
        pts = pts.unionByName(ins).localCheckpoint(eager=True)
        next_id += num_churn
        # --- recompute + diff
        new = (
            pubweb_edges_from_points(pts, neighborhood_radius, max_neighbors)
            .filter(F.col("src") < F.col("dst"))
            .localCheckpoint(eager=True)
        )
        d = prev.select("src", "dst").withColumn("had", F.lit(1)).join(
            new.select("src", "dst", F.col("weight").alias("nw")).withColumn("has", F.lit(1)),
            ["src", "dst"],
            "full_outer",
        )
        parts.append(_ev(
            d.filter(F.col("had").isNotNull() & F.col("has").isNotNull()),
            step, 3, EDGE_WEIGHT_UPDATE, u="src", v="dst", w="nw",
        ))
        parts.append(_ev(
            d.filter(F.col("had").isNotNull() & F.col("has").isNull()),
            step, 4, EDGE_REMOVAL, u="src", v="dst",
        ))
        parts.append(_ev(
            d.filter(F.col("had").isNull() & F.col("has").isNotNull()),
            step, 5, EDGE_ADDITION, u="src", v="dst", w="nw",
        ))
        ts = spark.createDataFrame([(step, 6)], "step int, prio int").select(
            "step", "prio", F.lit(TIME_STEP).alias("etype"),
            F.lit(None).cast("long").alias("u"),
            F.lit(None).cast("long").alias("v"),
            F.lit(None).cast("double").alias("w"),
        )
        parts.append(ts)
        prev = new
    return _seq_events(parts)


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    n_steps: int,
    avg_degree: float = 6.0,
    plexp: float = 3.0,
    move_each_step: float = 1.0,
    move_distance: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """DynamicHyperbolicGenerator (T=0; ``DynamicHyperbolicGenerator.cpp``):
    per step a ``move_each_step`` fraction of nodes moves — radial motion
    in cosh-cdf space with boundary bounce / center crossing
    (``moveNode :176-220``), angular motion scaled by 1/r — then the edge
    set (hyperbolic distance <= R) is recomputed and the diff emitted as
    EDGE_REMOVAL / EDGE_ADDITION + TIME_STEP.

    The per-node angular/radial movement vectors are seeded once like
    ``initializeMovement`` (:77-85, radial scale 10x) as portable draws;
    the bounce sign-flip is carried in the point state. Every step's edge
    rule is the shared distributed band join
    (``generators.hyperbolic_edges_from_points``).
    """
    import math

    from pyspark.sql import functions as F

    from networkit_spark.operators.sampling import _draw
    from networkit_spark.sources.generators import (
        _u01,
        hyperbolic_edges_from_points,
        hyperbolic_target_radius,
    )

    mod = 1_000_000_007
    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(n, avg_degree, alpha)
    cosh_r = math.cosh(alpha * R)
    scale = 10.0

    def u01(tag):
        return (_draw(tag, seed, F.col("node")) % mod) / float(mod)

    pts = spark.range(n).select(
        F.col("id").alias("node"),
        (2 * math.pi * _u01(F.col("id"), F.lit(seed), F.lit(0))).alias("theta"),
        (
            F.acosh(1 + _u01(F.col("id"), F.lit(seed), F.lit(1)) * F.lit(cosh_r - 1))
            / F.lit(alpha)
        ).alias("r"),
    ).select(
        "node", "theta", "r",
        (u01("hyp_am") * 2 * move_distance - move_distance).alias("am"),
        (u01("hyp_rm") * 2 * scale * move_distance - scale * move_distance).alias("rm"),
    ).localCheckpoint(eager=True)
    prev = (
        hyperbolic_edges_from_points(pts.select("node", "theta", "r"), n, avg_degree, plexp)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    parts: list[DataFrame] = []
    two_pi = 2 * math.pi
    for step in range(n_steps):
        mv = (_draw("hyp_mv", seed + step, F.col("node")) % mod) / float(mod) < move_each_step
        newcosh = F.cosh(F.lit(alpha) * F.col("r")) + F.lit(alpha) * F.col("rm")
        bounced_hi = newcosh > cosh_r
        nc1 = F.when(bounced_hi, 2 * F.lit(cosh_r) - newcosh).otherwise(newcosh)
        crossed = nc1 < 1.0
        nc2 = F.when(crossed, 2.0 - nc1).otherwise(nc1)
        rm2 = F.when(bounced_hi | crossed, -F.col("rm")).otherwise(F.col("rm"))
        phi1 = F.when(
            crossed,
            F.when(F.col("theta") > math.pi, F.col("theta") - math.pi)
            .otherwise(F.col("theta") + math.pi),
        ).otherwise(F.col("theta"))
        newr = F.least(F.acosh(F.greatest(nc2, F.lit(1.0))) / alpha, F.lit(R - 1e-12))
        phi2 = phi1 + F.col("am") / newr
        phi3 = F.pmod(phi2, F.lit(two_pi))
        pts = pts.select(
            "node",
            F.when(mv, phi3).otherwise(F.col("theta")).alias("theta"),
            F.when(mv, newr).otherwise(F.col("r")).alias("r"),
            "am",
            F.when(mv, rm2).otherwise(F.col("rm")).alias("rm"),
        ).localCheckpoint(eager=True)
        new = (
            hyperbolic_edges_from_points(pts.select("node", "theta", "r"), n, avg_degree, plexp)
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        d = prev.withColumn("had", F.lit(1)).join(
            new.withColumn("has", F.lit(1)), ["src", "dst"], "full_outer"
        )
        parts.append(_ev(
            d.filter(F.col("had").isNotNull() & F.col("has").isNull()),
            step, 0, EDGE_REMOVAL, u="src", v="dst",
        ))
        parts.append(_ev(
            d.filter(F.col("had").isNull() & F.col("has").isNotNull()),
            step, 1, EDGE_ADDITION, u="src", v="dst",
        ))
        ts = spark.createDataFrame([(step, 2)], "step int, prio int").select(
            "step", "prio", F.lit(TIME_STEP).alias("etype"),
            F.lit(None).cast("long").alias("u"),
            F.lit(None).cast("long").alias("v"),
            F.lit(None).cast("double").alias("w"),
        )
        parts.append(ts)
        prev = new
    return _seq_events(parts)


def dynamic_barabasi_albert_events(
    spark: SparkSession, n_steps: int, k: int, seed: int = 42
) -> DataFrame:
    """DynamicBarabasiAlbertGenerator (``DynamicBarabasiAlbertGenerator.cpp:
    14-78``): initial k-node path, then per step one new node with k
    degree-proportional distinct targets — the reference's exact selection
    walk (draw in [0, degSum], subtract degrees in node-id order, re-draw
    on duplicates), TIME_STEP after each insertion. Driver-side seeded +
    guarded like the other sequential streams; the scalable bulk analog is
    ``generators.barabasi_albert``."""
    if k < 1:
        raise ValueError("k must be at least 1")
    _guard_driver_n(n_steps, "dynamic_barabasi_albert_events", "barabasi_albert")
    import random as _random

    rng = _random.Random(seed)
    rows = [(NODE_ADDITION, 0, None, None)]
    deg = [0]
    for i in range(1, k):
        rows.append((NODE_ADDITION, i, None, None))
        rows.append((EDGE_ADDITION, i, i - 1, 1.0))
        deg.append(1)
        deg[i - 1] += 1
    deg_sum = sum(deg)
    n = k
    for _ in range(n_steps):
        u = n
        n += 1
        deg.append(0)
        rows.append((NODE_ADDITION, u, None, None))
        targets: set[int] = set()
        while len(targets) < k:
            r = rng.randint(0, deg_sum)
            for v in range(n):
                if v == u:
                    continue
                if r <= deg[v]:
                    targets.add(v)
                    break
                r -= deg[v]
        for v in sorted(targets):
            rows.append((EDGE_ADDITION, u, v, 1.0))
            deg[u] += 1
            deg[v] += 1
            deg_sum += 2
        rows.append((TIME_STEP, None, None, None))
    return _df(spark, rows)
