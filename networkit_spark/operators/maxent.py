"""MaxentStress layout (reference ``viz/MaxentStress.cpp``).

Gansner-Hu-North maxent-stress: minimize stress over the *known* distance
set S (the k-hop neighborhood) plus an entropy barrier over all other
pairs, by repeatedly solving ``L_w x_d = rhs_d`` — the same weighted
Laplacian every solve (``setupWeightedLaplacianMatrix``, weights
``1/d_ij^2``) with a per-round right-hand side mixing the attractive
coordinate term (``computeCoordinateLaplacianTerm``, :416-439) and an
``alpha``-damped repulsive entropy force (``approxRepulsiveForces``,
:473-500), on a cooling ladder ``alpha *= 0.3`` down to 0.008 (:78-205).

Spark-first shape:

* known distances: ONE batched k-hop BFS for all sources (frontier join per
  hop; the per-source sequential BFS of ``computeKnownDistances`` :503-545
  becomes one shuffle per hop level).
* every linear solve reuses the block conjugate-gradient Laplacian solver
  from ``operators/electrical.py`` — all ``dim`` coordinate systems advance
  together (one edge-join matvec per CG iteration for ALL dimensions).
* the repulsive entropy term replaces the driver-side octree with a grid
  Barnes-Hut analog: coordinates are bucketed into at most ``grid^dim``
  cells, far cells contribute through their (count, center-of-mass)
  aggregate (broadcast — the cell table is tiny by construction), the
  3^dim-neighborhood contributes exact point pairs via a cell-key join.
  Same O(n · cells + near pairs) contract as the octree's theta pruning,
  no driver materialization of coordinates.

The reference seeds from ``randomSphereCoordinates`` (OS RNG); we use the
portable md5 draw so layouts are deterministic and replayable (same stance
as every seeded operator in this repo).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.operators.electrical import laplacian_cg
from networkit_spark.operators.sampling import _draw

_MOD = 1_000_000_007


def sphere_coordinates(nodes: DataFrame, dim: int, seed: int = 42) -> DataFrame:
    """Deterministic unit-sphere start (randomSphereCoordinates :697+ with
    the portable draw): dim uniforms in [-1, 1], normalized."""
    raw = [
        (2.0 * ((_draw(f"maxent{d}", seed, F.col("node")) % _MOD) / float(_MOD)) - 1.0)
        for d in range(dim)
    ]
    nrm = F.sqrt(sum(c * c for c in raw))
    return nodes.select(
        "node",
        F.array(*[F.when(nrm > 0, c / nrm).otherwise(F.lit(1.0)) for c in raw]).alias("x"),
    )


def k_neighborhood_distances(und_edges: DataFrame, k: int) -> DataFrame:
    """computeKnownDistances EDGE_WEIGHT unweighted path (:503-545 +
    addKNeighborhoodOfVertex :589+): (u, v, d) for all pairs with hop
    distance d <= k, batched — every source expands in the same frontier."""
    e = und_edges.select("src", "dst")
    known = e.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1.0).alias("d"))
    frontier = known
    for _hop in range(2, k + 1):
        nxt = (
            frontier.join(e.withColumnRenamed("src", "v"), "v")
            .select("u", F.col("dst").alias("v"), (F.col("d") + 1).alias("d"))
            .filter(F.col("u") != F.col("v"))
        )
        nxt = nxt.join(known.select("u", "v"), ["u", "v"], "left_anti").groupBy("u", "v").agg(
            F.min("d").alias("d")
        )
        known = known.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return known


def _cellify(coords: DataFrame, dim: int, grid: int) -> tuple[DataFrame, DataFrame]:
    """Bucket coordinates into grid cells; return (coords+cell, cell table
    with count + center of mass)."""
    mins = coords.agg(
        *[F.min(F.element_at("x", d + 1)).alias(f"lo{d}") for d in range(dim)],
        *[F.max(F.element_at("x", d + 1)).alias(f"hi{d}") for d in range(dim)],
    ).first()
    cells = []
    for d in range(dim):
        lo, hi = mins[f"lo{d}"], mins[f"hi{d}"]
        h = max((hi - lo) / grid, 1e-9)
        cells.append(
            F.least(
                F.floor((F.element_at("x", d + 1) - F.lit(lo)) / F.lit(h)),
                F.lit(grid - 1),
            ).cast("int")
        )
    with_cell = coords.withColumn("cell", F.array(*cells))
    cell_tab = with_cell.groupBy("cell").agg(
        F.count("*").alias("cnt"),
        F.array(
            *[F.avg(F.element_at("x", d + 1)).alias(f"c{d}") for d in range(dim)]
        ).alias("com"),
    )
    return with_cell, cell_tab


def repulsive_forces(
    coords: DataFrame, dim: int, q: float, grid: int = 8
) -> DataFrame:
    """approxRepulsiveForces (:473-500) with the grid Barnes-Hut analog:
    far cells via (cnt, com) aggregate, the 3^dim near-neighborhood via
    exact pairs, pairs closer than 1e-5 skipped, then the per-dimension
    global L2 normalization the reference applies to b."""
    q_sign = 1.0 if q >= 0.0 else -1.0
    q2 = (q + 2.0) / 2.0
    with_cell, cell_tab = _cellify(coords, dim, grid)
    with_cell = with_cell.localCheckpoint(eager=True)

    def sq_dist(a, b):
        return sum(
            (F.element_at(a, d + 1) - F.element_at(b, d + 1))
            * (F.element_at(a, d + 1) - F.element_at(b, d + 1))
            for d in range(dim)
        )

    def is_near(ca, cb):
        return F.greatest(
            *[F.abs(F.element_at(ca, d + 1) - F.element_at(cb, d + 1)) for d in range(dim)]
        ) <= 1

    # far field: every node x every non-near occupied cell (cell table is
    # <= grid^dim rows -> broadcast nested-loop, no shuffle of the big side)
    far = (
        with_cell.alias("a")
        .join(F.broadcast(cell_tab.alias("c")), ~is_near(F.col("a.cell"), F.col("c.cell")))
        .select(
            F.col("a.node").alias("node"),
            *[
                (
                    F.lit(q_sign)
                    * F.col("c.cnt")
                    / F.pow(sq_dist(F.col("a.x"), F.col("c.com")), F.lit(q2))
                    * (F.element_at(F.col("a.x"), d + 1) - F.element_at(F.col("c.com"), d + 1))
                ).alias(f"f{d}")
                for d in range(dim)
            ],
        )
    )
    # near field: exact pairs against the 3^dim neighboring cells
    offsets = [[]]
    for _d in range(dim):
        offsets = [o + [s] for o in offsets for s in (-1, 0, 1)]
    probe = with_cell.select(
        "node",
        "x",
        F.explode(
            F.array(
                *[
                    F.array(
                        *[
                            (F.element_at("cell", d + 1) + F.lit(off[d])).cast("int")
                            for d in range(dim)
                        ]
                    )
                    for off in offsets
                ]
            )
        ).alias("cell"),
    )
    near = (
        probe.alias("a")
        .join(
            with_cell.select(
                F.col("node").alias("bnode"), F.col("x").alias("bx"), "cell"
            ).alias("b"),
            "cell",
        )
        .filter(F.col("a.node") != F.col("bnode"))
        .filter(sq_dist(F.col("a.x"), F.col("bx")) >= 1e-5)
        .select(
            F.col("a.node").alias("node"),
            *[
                (
                    F.lit(q_sign)
                    / F.pow(sq_dist(F.col("a.x"), F.col("bx")), F.lit(q2))
                    * (F.element_at(F.col("a.x"), d + 1) - F.element_at(F.col("bx"), d + 1))
                ).alias(f"f{d}")
                for d in range(dim)
            ],
        )
    )
    b = (
        far.union(near)
        .groupBy("node")
        .agg(*[F.sum(f"f{d}").alias(f"f{d}") for d in range(dim)])
    )
    norms = b.agg(
        *[F.sqrt(F.sum(F.col(f"f{d}") * F.col(f"f{d}"))).alias(f"n{d}") for d in range(dim)]
    ).first()
    return b.select(
        "node",
        F.array(
            *[
                (F.col(f"f{d}") / F.lit(norms[f"n{d}"] or 1.0)).alias(f"f{d}")
                for d in range(dim)
            ]
        ).alias("rep"),
    )


def maxent_stress(
    und_edges: DataFrame,
    dim: int = 2,
    k: int = 1,
    q: float = 0.0,
    alpha: float = 1.0,
    alpha_reduction: float = 0.3,
    final_alpha: float = 0.008,
    max_solves_per_alpha: int = 50,
    conv_threshold: float = 1e-6,
    fast_computation: bool = False,
    seed: int = 42,
    grid: int = 8,
    cg_tol: float = 1e-5,
    cg_max_iterations: int = 100,
    coordinates: DataFrame | None = None,
) -> DataFrame:
    """MaxentStress::run (:78-205) -> (node, x: array<double> length dim).

    Parameter names and the cooling/convergence protocol match the
    reference (alpha ladder, rhs L2-normalization for the first fifth of
    the solves per alpha, zero-sum rhs correction, relative-change
    convergence test, repulsive recomputation on the floor(5*ln(s))
    schedule). The >30%-degree-1 q=0.8 rule (:533-541) is applied the same.
    """
    nodes = (
        und_edges.select(F.col("src").alias("node"))
        .union(und_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    deg1 = und_edges.groupBy("src").count().filter(F.col("count") == 1).count()
    if n and deg1 / n > 0.3:
        q = 0.8
    known = k_neighborhood_distances(und_edges, k).localCheckpoint(eager=True)
    # weighted Laplacian edge list: one orientation, weight = 1/d^2
    lap_edges = known.filter(F.col("u") < F.col("v")).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        (F.lit(1.0) / (F.col("d") * F.col("d"))).alias("weight"),
    )
    coords = (
        coordinates if coordinates is not None else sphere_coordinates(nodes, dim, seed)
    ).localCheckpoint(eager=True)

    current_alpha = alpha
    converged = False
    rep = None
    lower_bound = None
    while not converged:
        for num_solves in range(max_solves_per_alpha):
            new_lb = -1 if num_solves == 0 else math.floor(5 * math.log(num_solves))
            if new_lb != lower_bound or rep is None:
                rep = repulsive_forces(coords, dim, q, grid).localCheckpoint(eager=True)
                lower_bound = new_lb
            # attractive rhs: sum over known pairs of w * (x_u - x_v),
            # w = (1/d^2) * d / max(dist, 1e-5)
            j = (
                known.join(coords.select(F.col("node").alias("u"), F.col("x").alias("xu")), "u")
                .join(coords.select(F.col("node").alias("v"), F.col("x").alias("xv")), "v")
            )
            dist = F.greatest(
                F.sqrt(
                    sum(
                        (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))
                        * (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))
                        for d in range(dim)
                    )
                ),
                F.lit(1e-5),
            )
            w = (F.lit(1.0) / (F.col("d") * F.col("d"))) * F.col("d") / dist
            rhs = (
                j.select(
                    "u",
                    *[
                        (w * (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))).alias(
                            f"r{d}"
                        )
                        for d in range(dim)
                    ],
                )
                .groupBy(F.col("u").alias("node"))
                .agg(*[F.sum(f"r{d}").alias(f"r{d}") for d in range(dim)])
            )
            if num_solves < max_solves_per_alpha / 5:
                nr = rhs.agg(
                    *[
                        F.sqrt(F.sum(F.col(f"r{d}") * F.col(f"r{d}"))).alias(f"n{d}")
                        for d in range(dim)
                    ]
                ).first()
                rhs = rhs.select(
                    "node",
                    *[
                        (F.col(f"r{d}") / F.lit(nr[f"n{d}"] or 1.0)).alias(f"r{d}")
                        for d in range(dim)
                    ],
                )
            rhs = (
                rhs.join(rep, "node", "left")
                .select(
                    "node",
                    *[
                        (
                            F.col(f"r{d}")
                            + F.lit(current_alpha)
                            * F.coalesce(F.element_at("rep", d + 1), F.lit(0.0))
                        ).alias(f"r{d}")
                        for d in range(dim)
                    ],
                )
            )
            means = rhs.agg(
                *[F.avg(f"r{d}").alias(f"m{d}") for d in range(dim)]
            ).first()
            b = rhs.select(
                "node",
                F.array(
                    *[(F.col(f"r{d}") - F.lit(means[f"m{d}"] or 0.0)) for d in range(dim)]
                ).alias("b"),
            )
            new_coords = laplacian_cg(
                lap_edges, b, dim, tol=cg_tol, max_iterations=cg_max_iterations
            ).localCheckpoint(eager=True)
            chg = (
                coords.select("node", F.col("x").alias("xo"))
                .join(new_coords, "node")
                .agg(
                    F.sum(
                        sum(
                            (F.element_at("x", d + 1) - F.element_at("xo", d + 1))
                            * (F.element_at("x", d + 1) - F.element_at("xo", d + 1))
                            for d in range(dim)
                        )
                    ).alias("rel"),
                    F.sum(
                        sum(
                            F.element_at("xo", d + 1) * F.element_at("xo", d + 1)
                            for d in range(dim)
                        )
                    ).alias("old"),
                )
                .first()
            )
            coords = new_coords
            converged = (chg["rel"] or 0.0) / max(chg["old"] or 1.0, 1e-12) < conv_threshold
            if converged:
                if not fast_computation:
                    converged = False
                else:
                    break
        current_alpha *= alpha_reduction
        converged = converged or current_alpha < final_alpha
        lower_bound = None  # new alpha round recomputes like the reference reset
    return coords.select("node", "x")


def ldme(coords: DataFrame, known: DataFrame, dim: int = 2) -> float:
    """MaxentStress::ldme (:352-362): sqrt(mean (d_ij - ||x_i-x_j||)^2)
    over the known-distance set."""
    j = (
        known.join(coords.select(F.col("node").alias("u"), F.col("x").alias("xu")), "u")
        .join(coords.select(F.col("node").alias("v"), F.col("x").alias("xv")), "v")
    )
    dist = F.sqrt(
        sum(
            (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))
            * (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))
            for d in range(dim)
        )
    )
    row = j.agg(F.avg((F.col("d") - dist) * (F.col("d") - dist)).alias("m")).first()
    return math.sqrt(row["m"] or 0.0)


def scaling_factor(coords: DataFrame, known: DataFrame, dim: int = 2) -> float:
    """computeScalingFactor (:207-251) restricted to the known set (the
    reference runs SSSP on the augmented known graph; over the known pairs
    the distances coincide): s = sum(geo/d) / sum(geo^2/d^2)."""
    j = (
        known.join(coords.select(F.col("node").alias("u"), F.col("x").alias("xu")), "u")
        .join(coords.select(F.col("node").alias("v"), F.col("x").alias("xv")), "v")
    )
    sq = sum(
        (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))
        * (F.element_at("xu", d + 1) - F.element_at("xv", d + 1))
        for d in range(dim)
    )
    row = j.agg(
        F.sum(F.sqrt(sq) / F.col("d")).alias("top"),
        F.sum(sq / (F.col("d") * F.col("d"))).alias("bot"),
    ).first()
    return (row["top"] or 0.0) / max(row["bot"] or 1.0, 1e-12)


def scale_layout(coords: DataFrame, known: DataFrame, dim: int = 2) -> DataFrame:
    """MaxentStress::scaleLayout (:253-263)."""
    s = scaling_factor(coords, known, dim)
    return coords.select(
        "node", F.transform("x", lambda v: v * F.lit(s)).alias("x")
    )
