"""Electrical / spanning-edge centrality family: effective resistance via a
distributed block-CG Laplacian solver.

Reference semantics:

- ``cpp/centrality/SpanningEdgeCentrality.cpp:34-65`` — exact: solve
  ``L x = e_u - e_v`` per edge with the LAMG multigrid solver, score =
  ``|x_u - x_v|`` (= effective resistance for unweighted graphs);
  ``:67-106`` — approximation: k = ceil(log2 n)/eps^2 Johnson-Lindenstrauss
  projections of the incidence matrix, score = sum of squared solution
  differences.
- ``cpp/centrality/ApproxElectricalCloseness.cpp:529-538`` — electrical
  closeness(u) = (n - 1) / (n * diag(L^+)[u] + trace(L^+)).
- Commute time: ``C(u,v) = vol(G) * r(u,v)`` (public identity; the
  reference's ``CommuteTimeDistance``).

The reference runs a sequential sparse solver per right-hand side on one
machine. Here the solver itself is the Spark-first kernel: **block conjugate
gradient on the graph Laplacian**, all k right-hand sides advancing together
as one ``array<double>`` column per node. One matvec = one edge join + one
grouped aggregation per iteration (the only shuffle); inner products are k
scalar aggregations over the array elements in a single pass. State is
eagerly localCheckpoint-ed per iteration (lineage truncation, same
discipline as ``plans/iteration.py``). This scales exactly like the
PageRank superstep: linear in edges, partitioned by node, no single-task
stage, no per-row Python.

Singular-L note: the Laplacian's nullspace is the constant vector per
component. Every right-hand side built here sums to zero per component
(pair vectors e_u - e_v, incidence projections B^T q, centered Rademacher
probes), so CG stays in range(L) and converges to the pseudoinverse
solution (public standard result).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import nodes_from_edges


def _ksum(col: str, k: int):
    """Cross-row elementwise sum of an array<double> column (k aggs)."""
    return F.array(*[F.sum(F.element_at(F.col(col), i + 1)) for i in range(k)])


def _zeros(k: int):
    return F.array(*[F.lit(0.0) for _ in range(k)])


def _und_sym(edges: DataFrame) -> DataFrame:
    """Idempotent undirected symmetrization: canonicalize (least, greatest),
    dedupe (max weight), emit both directions. Unlike ``graph.symmetrize``
    (additive multi-edge semantics) this maps an already-symmetric input to
    itself — the Laplacian must see each undirected edge exactly once per
    direction or every resistance halves."""
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    return canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )



def _combine(a_col, b_col, coefs: list[float]):
    """a + coef_i * b, arrays elementwise (coef varies per system i)."""
    arr = F.array(*[F.lit(float(c)) for c in coefs])
    zipped = F.arrays_zip(a_col.alias("a"), b_col.alias("b"), arr.alias("c"))
    return F.transform(zipped, lambda z: z["a"] + z["c"] * z["b"])


def laplacian_cg(
    edges: DataFrame,
    b: DataFrame,
    k: int,
    tol: float = 1e-10,
    max_iterations: int = 300,
    shift: float = 0.0,
) -> DataFrame:
    """Solve ``(L + shift*I) x_i = b_i`` for k right-hand sides at once.

    ``edges``: undirected rows (will be symmetrized); ``b``: (node, b:
    array<double> length k), each b_i summing to zero per component when
    ``shift == 0`` (singular L); any b when ``shift > 0`` (the shifted
    system is SPD nonsingular — used by the forest matrix, shift=1).
    Returns (node, x: array<double>). Block CG: per iteration one edge-join
    matvec shuffle + two one-row aggregations.
    """
    sym = _und_sym(edges).select("src", "dst", "weight").persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("deg")
    )
    st = (
        b.join(deg, "node", "left")
        .select(
            "node",
            F.coalesce("deg", F.lit(0.0)).alias("deg"),
            _zeros(k).alias("x"),
            F.col("b").alias("r"),
            F.col("b").alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    rs_row = st.agg(
        F.array(
            *[F.sum(F.element_at("r", i + 1) * F.element_at("r", i + 1)) for i in range(k)]
        ).alias("rs")
    ).first()
    rs = [v or 0.0 for v in rs_row["rs"]]
    tol2 = tol * tol
    for _ in range(max_iterations):
        if max(rs) <= tol2:
            break
        # matvec: (L p)(v) = deg(v) * p(v) - sum_{u~v} w * p(u)
        msgs = (
            sym.join(st.select(F.col("node").alias("src"), "p"), "src")
            .select(
                F.col("dst").alias("node"),
                F.transform("p", lambda z: z * F.col("weight")).alias("wp"),
            )
            .groupBy("node")
            .agg(_ksum("wp", k).alias("m"))
        )
        j = (
            st.join(msgs, "node", "left")
            .select(
                "node", "deg", "x", "r", "p",
                F.coalesce(
                    F.col("m"), _zeros(k)
                ).alias("m"),
            )
            .select(
                "node", "deg", "x", "r", "p",
                F.transform(
                    F.arrays_zip(F.col("p").alias("p"), F.col("m").alias("m")),
                    lambda z: (F.col("deg") + F.lit(float(shift))) * z["p"] - z["m"],
                ).alias("ap"),
            )
            .localCheckpoint(eager=True)
        )
        pap_row = j.agg(
            F.array(
                *[F.sum(F.element_at("p", i + 1) * F.element_at("ap", i + 1)) for i in range(k)]
            ).alias("pap")
        ).first()
        pap = [v or 0.0 for v in pap_row["pap"]]
        alpha = [rs[i] / pap[i] if pap[i] > 0 else 0.0 for i in range(k)]
        st2 = j.select(
            "node", "deg",
            _combine(F.col("x"), F.col("p"), alpha).alias("x"),
            _combine(F.col("r"), F.col("ap"), [-a for a in alpha]).alias("r"),
            "p",
        ).localCheckpoint(eager=True)
        rs_new_row = st2.agg(
            F.array(
                *[F.sum(F.element_at("r", i + 1) * F.element_at("r", i + 1)) for i in range(k)]
            ).alias("rs")
        ).first()
        rs_new = [v or 0.0 for v in rs_new_row["rs"]]
        beta = [rs_new[i] / rs[i] if rs[i] > 0 else 0.0 for i in range(k)]
        st = st2.select(
            "node", "deg", "x", "r",
            _combine(F.col("r"), F.col("p"), beta).alias("p"),
        ).localCheckpoint(eager=True)
        rs = rs_new
    sym.unpersist()
    return st.select("node", "x")


def effective_resistance(
    edges: DataFrame,
    pairs: list[tuple[int, int]],
    tol: float = 1e-10,
    max_iterations: int = 300,
) -> DataFrame:
    """r(u, v) for each pair, batched as one block-CG solve
    (SpanningEdgeCentrality.cpp:44-58 exact semantics: L x = e_u - e_v,
    r = x_u - x_v). Pairs must connect nodes in the same component.
    Returns (u, v, resistance)."""
    spark = edges.sparkSession
    k = len(pairs)
    nodes = nodes_from_edges(edges)
    b = nodes.select(
        F.col("id").alias("node"),
        F.array(
            *[
                F.when(F.col("id") == int(u), F.lit(1.0))
                .when(F.col("id") == int(v), F.lit(-1.0))
                .otherwise(F.lit(0.0))
                for u, v in pairs
            ]
        ).alias("b"),
    )
    x = laplacian_cg(edges, b, k, tol=tol, max_iterations=max_iterations)
    pairs_df = spark.createDataFrame(
        [(i, int(u), int(v)) for i, (u, v) in enumerate(pairs)], "i int, u long, v long"
    )
    xu = x.select(F.col("node").alias("u"), F.col("x").alias("xu"))
    xv = x.select(F.col("node").alias("v"), F.col("x").alias("xv"))
    return (
        pairs_df.join(xu, "u").join(xv, "v")
        .select(
            "u", "v",
            (
                F.element_at("xu", F.col("i") + 1) - F.element_at("xv", F.col("i") + 1)
            ).alias("resistance"),
        )
    )


def commute_time(
    edges: DataFrame, pairs: list[tuple[int, int]], **kw
) -> DataFrame:
    """C(u,v) = vol(G) * r(u,v), vol = total weighted degree (2m unweighted)."""
    vol = _und_sym(edges).agg(F.sum("weight")).first()[0] or 0.0
    return effective_resistance(edges, pairs, **kw).select(
        "u", "v", (F.lit(float(vol)) * F.col("resistance")).alias("commute_time")
    )


def _rademacher(*cols):
    """Deterministic +/-1 hash coin."""
    return (F.pmod(F.xxhash64(*cols), F.lit(2)) * 2 - 1).cast("double")


def spanning_edge_centrality(
    edges: DataFrame,
    eps: float = 0.3,
    k_override: int | None = None,
    seed: int = 42,
    tol: float = 1e-9,
    max_iterations: int = 300,
) -> DataFrame:
    """Approximate spanning-edge centrality / effective resistance per edge
    (SpanningEdgeCentrality.cpp:67-106): project the weighted incidence
    matrix with k = ceil(log2 n)/eps^2 random +/-1/sqrt(k) vectors, solve
    the k systems L z_i = (B^T q_i), score(u,v) = sum_i (z_i(u) - z_i(v))^2
    — the Spielman-Srivastava JLT estimate of r(u,v) within (1 +/- eps).

    Returns canonical undirected (src, dst, score). On a tree every score
    is ~1 (every edge is in every spanning tree)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    n = nodes_from_edges(und).count()
    k = k_override or max(4, int(math.ceil(math.log2(max(n, 2))) / (eps * eps)))
    inv_sqrt_k = 1.0 / math.sqrt(k)
    # b(v) = sum over incident edges of +/- q_i(e) * sqrt(w): +q at src, -q at dst
    q = F.array(
        *[
            _rademacher(F.col("src"), F.col("dst"), F.lit(seed), F.lit(i))
            * F.lit(inv_sqrt_k)
            * F.sqrt("weight")
            for i in range(k)
        ]
    )
    signed = und.select("src", "dst", q.alias("q")).select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), F.col("q").alias("qv")),
                F.struct(
                    F.col("dst").alias("node"),
                    F.transform("q", lambda z: -z).alias("qv"),
                ),
            )
        ).alias("s")
    ).select("s.node", "s.qv")
    b = signed.groupBy("node").agg(_ksum("qv", k).alias("b"))
    z = laplacian_cg(und, b, k, tol=tol, max_iterations=max_iterations)
    zu = z.select(F.col("node").alias("src"), F.col("x").alias("zu"))
    zv = z.select(F.col("node").alias("dst"), F.col("x").alias("zv"))
    out = (
        und.join(zu, "src").join(zv, "dst")
        .select(
            "src", "dst",
            F.aggregate(
                F.zip_with(F.col("zu"), F.col("zv"), lambda a_, b_: (a_ - b_) * (a_ - b_)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("score"),
        )
    )
    und.unpersist()
    return out


def electrical_closeness(
    edges: DataFrame,
    k: int = 128,
    seed: int = 42,
    exact_diag: bool = False,
    tol: float = 1e-9,
    max_iterations: int = 300,
) -> DataFrame:
    """Electrical closeness (ApproxElectricalCloseness.cpp:529-538):
    score(u) = (n - 1) / (n * diag(L^+)[u] + trace(L^+)). Requires a
    connected graph (reference requirement too).

    diag(L^+) via the public Hutchinson estimator: diag ~= mean_i q_i (*)
    L^+ q_i over k centered Rademacher probes (the reference instead
    samples uniform spanning trees — a sequential-PRNG construction; the
    probe estimator is the solver-friendly public equivalent and uses the
    same block-CG kernel as everything else here). ``exact_diag=True``
    solves one system per node (small-graph/test mode, k = n).
    Returns (node, score, diag)."""
    nodes = nodes_from_edges(edges)
    n = nodes.count()
    if exact_diag:
        # b_i = e_i - 1/n: x_i = L^+ e_i, diag = x_i(i)
        k = n
        b = nodes.select(
            F.col("id").alias("node"),
            F.array(
                *[
                    (F.when(F.col("id") == i, F.lit(1.0)).otherwise(F.lit(0.0)) - F.lit(1.0 / n))
                    for i in range(n)
                ]
            ).alias("b"),
        )
        x = laplacian_cg(edges, b, k, tol=tol, max_iterations=max_iterations)
        diag = x.select("node", F.element_at("x", F.col("node").cast("int") + 1).alias("diag"))
    else:
        mean_row = nodes.agg(
            F.array(
                *[F.avg(_rademacher(F.col("id"), F.lit(seed), F.lit(i))) for i in range(k)]
            ).alias("mu")
        ).first()
        mu = list(mean_row["mu"])
        q_arr = F.array(
            *[
                _rademacher(F.col("id"), F.lit(seed), F.lit(i)) - F.lit(float(mu[i]))
                for i in range(k)
            ]
        )
        b = nodes.select(F.col("id").alias("node"), q_arr.alias("b"))
        x = laplacian_cg(edges, b, k, tol=tol, max_iterations=max_iterations)
        # diag(v) ~= (1/k) sum_i q_i(v) * z_i(v)  (q centered)
        qv = F.array(
            *[
                _rademacher(F.col("node"), F.lit(seed), F.lit(i)) - F.lit(float(mu[i]))
                for i in range(k)
            ]
        )
        diag = x.select(
            "node",
            (
                F.aggregate(
                    F.zip_with(qv, F.col("x"), lambda a_, b_: a_ * b_),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                )
                / F.lit(float(k))
            ).alias("diag"),
        )
    trace = diag.agg(F.sum("diag")).first()[0] or 0.0
    return diag.select(
        "node",
        (F.lit(float(n - 1)) / (F.lit(float(n)) * F.col("diag") + F.lit(float(trace)))).alias(
            "score"
        ),
        "diag",
    )


def effective_resistance_jacobi(
    edges: DataFrame,
    pairs: list[tuple[int, int]],
    iterations: int = 10,
    omega: float = 0.5,
) -> DataFrame:
    """Deterministic fixed-iteration twin for the driver oracle: ``iterations``
    damped-Jacobi sweeps (x' = (1-w) x + w (b + A x)/deg, x0 = 0) of the
    per-pair system L x = e_u - e_v, reported as r_est = x(u) - x(v). The
    arithmetic is plain joins + grouped sums, so the identical computation
    is expressible as unrolled ANSI SQL (see entry_queries_graph) — the
    same fixed-iteration pattern as `eigenvector_fixed10`. Full CG
    (:func:`effective_resistance`) is the converged operator; pytest pins
    it against numpy pseudoinverse oracles.

    Long-format state (pair, node, x): mirrors the SQL oracle exactly.
    Only touches nodes with degree > 0; pairs must be within a component.
    """
    spark = edges.sparkSession
    sym = _und_sym(edges).select("src", "dst", "weight").persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("deg"))
    pairs_df = spark.createDataFrame(
        [(i, int(u), int(v)) for i, (u, v) in enumerate(pairs)], "i int, u long, v long"
    )
    b = (
        deg.crossJoin(F.broadcast(pairs_df))
        .select(
            "i", "node", "deg",
            (
                F.when(F.col("node") == F.col("u"), F.lit(1.0))
                .when(F.col("node") == F.col("v"), F.lit(-1.0))
                .otherwise(F.lit(0.0))
            ).alias("b"),
        )
    )
    st = b.select("i", "node", "deg", "b", F.lit(0.0).alias("x")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        msgs = (
            sym.join(
                st.select(F.col("node").alias("src"), "i", "x"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "i")
            .agg(F.sum(F.col("weight") * F.col("x")).alias("m"))
        )
        st = (
            st.join(msgs, ["node", "i"], "left")
            .select(
                "i", "node", "deg", "b",
                (
                    F.lit(1.0 - omega) * F.col("x")
                    + F.lit(omega)
                    * (F.col("b") + F.coalesce(F.col("m"), F.lit(0.0)))
                    / F.col("deg")
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    xu = st.select(F.col("i").alias("iu"), F.col("node").alias("u"), F.col("x").alias("xu"))
    xv = st.select(F.col("i").alias("iv"), F.col("node").alias("v"), F.col("x").alias("xv"))
    out = (
        pairs_df.join(xu, (F.col("i") == F.col("iu")) & (pairs_df["u"] == xu["u"]))
        .join(xv, (F.col("i") == F.col("iv")) & (pairs_df["v"] == xv["v"]))
        .select(pairs_df["u"], pairs_df["v"], (F.col("xu") - F.col("xv")).alias("r_est"))
    )
    sym.unpersist()
    return out


def create_augmented_graph(und_edges: DataFrame, nodes: DataFrame) -> tuple[DataFrame, int]:
    """``GraphTools::createAugmentedGraph`` — a universal root node (id = n)
    connected to every existing node with unit weight; returns the
    symmetrized augmented edge table and the root id. The reference's
    ForestCentrality requires its input in this form
    (ForestCentrality.cpp:31-34); forest distances in G equal effective
    resistances in the augmented graph (public identity, Angriman et al.)."""
    n = nodes.count()
    spokes = nodes.select(
        F.col("id").alias("src"),
        F.lit(n).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    aug = (
        und_edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
        .unionByName(spokes)
        .unionByName(spokes.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    )
    return aug, n


def forest_centrality(
    und_edges: DataFrame,
    nodes: DataFrame | None = None,
    k: int = 128,
    seed: int = 42,
    exact_diag: bool = False,
    tol: float = 1e-9,
    max_iterations: int = 300,
) -> DataFrame:
    """Forest closeness centrality (ForestCentrality.cpp:109-147).

    The forest matrix is ``Omega = (I + L)^(-1)`` (Chebotarev-Shamis);
    forest distance ``rho(u,v) = Omega_uu + Omega_vv - 2 Omega_uv``, and
    because ``Omega 1 = 1`` the farness collapses to the reference's closed
    form ``n * diag[u] + trace(Omega) - 2`` (computeScores,
    ForestCentrality.cpp:139-147); score = n / farness.

    The reference estimates diag(Omega) by sampling uniform spanning trees
    of the augmented graph with a sequential PRNG plus one CG solve
    (sampleUSTs/solveLinearSystem). Spark-first replacement: the SAME
    block-CG kernel as the rest of this module on the SHIFTED system
    ``(L + I) x = b`` — nonsingular SPD, so no probe centering or nullspace
    care is needed. ``exact_diag=True`` solves e_i per node (test mode);
    otherwise diag ~= mean_i q_i * x_i over k Rademacher probes (public
    Hutchinson estimator). Returns (node, score, diag). Works per connected
    component (the shifted system never couples components, matching the
    augmented-graph construction applied per component)."""
    nodes = nodes if nodes is not None else nodes_from_edges(und_edges)
    n = nodes.count()
    if exact_diag:
        k = n
        b = nodes.select(
            F.col("id").alias("node"),
            F.array(
                *[
                    F.when(F.col("id") == i, F.lit(1.0)).otherwise(F.lit(0.0))
                    for i in range(n)
                ]
            ).alias("b"),
        )
        x = laplacian_cg(und_edges, b, k, tol=tol, max_iterations=max_iterations, shift=1.0)
        diag = x.select("node", F.element_at("x", F.col("node").cast("int") + 1).alias("diag"))
    else:
        q_arr = F.array(*[_rademacher(F.col("id"), F.lit(seed), F.lit(i)) for i in range(k)])
        b = nodes.select(F.col("id").alias("node"), q_arr.alias("b"))
        x = laplacian_cg(und_edges, b, k, tol=tol, max_iterations=max_iterations, shift=1.0)
        qv = F.array(*[_rademacher(F.col("node"), F.lit(seed), F.lit(i)) for i in range(k)])
        diag = x.select(
            "node",
            (
                F.aggregate(
                    F.zip_with(qv, F.col("x"), lambda a_, b_: a_ * b_),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                )
                / F.lit(float(k))
            ).alias("diag"),
        )
    trace = diag.agg(F.sum("diag")).first()[0] or 0.0
    return diag.select(
        "node",
        (
            F.lit(float(n))
            / (F.lit(float(n)) * F.col("diag") + F.lit(float(trace)) - F.lit(2.0))
        ).alias("score"),
        "diag",
    )


def forest_matrix_columns_jacobi(
    edges: DataFrame,
    nodes: DataFrame,
    sources: list[int],
    iterations: int = 10,
    omega: float = 0.5,
) -> DataFrame:
    """Deterministic fixed-iteration oracle twin for the forest kernel:
    ``iterations`` damped-Jacobi sweeps of the shifted system
    ``(I + L) x = e_u`` per source u — x converges to column u of the
    forest matrix ``(I + L)^(-1)``. Same unrolled join+agg recurrence as
    :func:`effective_resistance_jacobi` with denominator ``deg + 1``
    (strictly diagonally dominant, so plain Jacobi converges); isolated
    nodes are included (their row is just ``x = b``). Long format
    (u, node, x)."""
    spark = edges.sparkSession
    sym = _und_sym(edges).select("src", "dst", "weight").persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.sum("weight").alias("deg"))
    src_df = spark.createDataFrame([(int(u),) for u in sources], "u long")
    st = (
        nodes.select(F.col("id").alias("node"))
        .join(deg, "node", "left")
        .select("node", F.coalesce("deg", F.lit(0.0)).alias("deg"))
        .crossJoin(F.broadcast(src_df))
        .select(
            "u", "node", "deg",
            F.when(F.col("node") == F.col("u"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("b"),
            F.lit(0.0).alias("x"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        msgs = (
            sym.join(st.select(F.col("node").alias("src"), "u", "x"), "src")
            .groupBy(F.col("dst").alias("node"), "u")
            .agg(F.sum(F.col("weight") * F.col("x")).alias("m"))
        )
        st = (
            st.join(msgs, ["node", "u"], "left")
            .select(
                "u", "node", "deg", "b",
                (
                    F.lit(1.0 - omega) * F.col("x")
                    + F.lit(omega)
                    * (F.col("b") + F.coalesce(F.col("m"), F.lit(0.0)))
                    / (F.col("deg") + F.lit(1.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return st.select("u", "node", "x")
