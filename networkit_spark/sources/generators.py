"""Deterministic graph generators (hash-based, fully distributed).

Reference: ``networkit/generators.pyx`` / ``cpp/generators/`` (29 files):
ErdosRenyi (:296), ChungLu (:438), RMAT (:1431), WattsStrogatz (:1627),
ClusteredRandomGraph (:394), BarabasiAlbert (:83), PowerlawDegreeSequence
(:633) et al. The reference uses sequential PRNG state; our generators are
**pure functions of (seed, index)** via xxhash64 — reproducible under any
parallelism, generated straight from ``spark.range`` (no data motion, no
driver loops), which is the only shape that works at 10^12 edges.

- :func:`gnm` — G(n, m): m edges with hash-uniform endpoints (the scalable
  Erdos-Renyi form; G(n, p) == G(n, round(p*n*(n-1)))) in expectation).
- :func:`powerlaw_digraph` — Chung-Lu-style: endpoints drawn from a Zipf-ish
  power law by inverse-transform on hash uniforms (BarabasiAlbert /
  PowerlawDegreeSequence stand-in with closed-form sampling).
- :func:`rmat` — recursive-matrix: each of ``scale`` address bits chooses a
  quadrant by (a, b, c, d); bit choices are per-(edge, bit) hashes.
- :func:`watts_strogatz` — ring lattice + hash-decided rewiring.
- :func:`planted_partition` — k blocks, m_in intra + m_out inter edges
  (ClusteredRandomGraphGenerator analog; the PLP/PLM test substrate).

All return directed (src, dst, weight) with self-loops removed and
duplicates dropped; symmetrize() for undirected use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hash of the given columns."""
    return (F.abs(F.xxhash64(*cols)) % F.lit(1_000_000_007)) / 1_000_000_007.0


def _finish(edges: DataFrame) -> DataFrame:
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


def gnm(spark: SparkSession, n: int, m: int, seed: int = 42) -> DataFrame:
    """Erdos-Renyi G(n, m) (ErdosRenyiGenerator analog)."""
    df = spark.range(m)
    return _finish(
        df.select(
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(0))) % n).alias("src"),
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(1))) % n).alias("dst"),
        )
    )


def powerlaw_digraph(
    spark: SparkSession, n: int, m: int, gamma: float = 2.5, seed: int = 42
) -> DataFrame:
    """Chung-Lu-ish: node popularity ~ rank^(-1/(gamma-1)); endpoint =
    floor(n * u^(1/(1-gamma)+1))... implemented as the standard Zipf inverse
    transform ``node = floor(n * u^(gamma-1))`` applied to the *rank* scale
    so small ids are hubs (matches the hub-skew shape of web graphs)."""
    df = spark.range(m)
    # src: uniform (every page links out); dst: 70% uniform + 30% Zipf tail
    # (rank r = u^(-1/(gamma-1)), node r-1, capped) — the web-crawl shape:
    # uniform out-links, power-law in-degree hubs.
    ex = -1.0 / (gamma - 1.0)
    src = (F.abs(F.xxhash64("id", F.lit(seed), F.lit(0))) % n).alias("src")
    u = _u01(F.col("id"), F.lit(seed), F.lit(1))
    zipf = F.least(
        (F.floor(F.pow(F.greatest(u, F.lit(1e-12)), F.lit(ex))) - 1).cast("long"),
        F.lit(n - 1),
    )
    uniform_dst = F.abs(F.xxhash64("id", F.lit(seed), F.lit(2))) % n
    is_hub = _u01(F.col("id"), F.lit(seed), F.lit(3)) < 0.3
    dst = F.when(is_hub, zipf).otherwise(uniform_dst).alias("dst")
    return _finish(df.select(src, dst))


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> DataFrame:
    """RMAT (RmatGenerator analog): n = 2^scale, m = n * edge_factor; per
    edge, each address bit picks a quadrant from (a, b, c, d)."""
    n = 1 << scale
    m = n * edge_factor
    df = spark.range(m)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for bit in range(scale):
        u = _u01(F.col("id"), F.lit(seed), F.lit(bit))
        src_bit = (u >= a + b).cast("long")  # quadrants c, d set the src bit
        dst_bit = ((u >= a) & (u < a + b) | (u >= a + b + c)).cast("long")
        src = src + F.shiftleft(src_bit, bit)
        dst = dst + F.shiftleft(dst_bit, bit)
    return _finish(df.select(src.alias("src"), dst.alias("dst")))


def watts_strogatz(
    spark: SparkSession, n: int, k: int = 4, beta: float = 0.1, seed: int = 42
) -> DataFrame:
    """Ring lattice (each node to k/2 clockwise neighbors) + rewiring with
    probability beta (WattsStrogatzGenerator analog). Directed rows; the
    undirected graph is symmetrize() of this."""
    half = max(1, k // 2)
    df = spark.range(n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(half))).alias("off"),
    )
    ring_dst = (F.col("src") + F.col("off")) % n
    rewire = _u01(F.col("src"), F.col("off"), F.lit(seed)) < beta
    rnd_dst = F.abs(F.xxhash64("src", "off", F.lit(seed), F.lit(1))) % n
    return _finish(
        df.select("src", F.when(rewire, rnd_dst).otherwise(ring_dst).alias("dst"))
    )


def barabasi_albert(
    spark: SparkSession, n: int, k: int = 4, seed: int = 42
) -> DataFrame:
    """Barabasi-Albert stand-in (``generators.pyx:83``): node i attaches its
    k edges preferentially to earlier nodes. Sequential PA has the known
    closed-form equivalent (Bollobas et al., public result): choosing target
    ``j = floor(i * u^2)`` for u ~ U[0,1) reproduces the degree ~ (i/j)^(1/2)
    attachment distribution — a pure function of (seed, i, slot), so the
    generator is one ``spark.range`` pass, no sequential state."""
    df = spark.range(1, n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    )
    u = _u01(F.col("src"), F.col("slot"), F.lit(seed))
    dst = F.floor(F.col("src") * u * u).cast("long")
    return _finish(df.select("src", dst.alias("dst")))


def lfr_like(
    spark: SparkSession,
    n: int,
    k_communities: int = 10,
    mu: float = 0.2,
    avg_degree: int = 10,
    max_degree: int = 50,
    tau1: float = 2.5,
    tau2: float = 1.5,
    seed: int = 42,
):
    """LFR-style benchmark substrate (``LFRGenerator``, ``generators.pyx:831``
    — same *shape*, hash-deterministic construction): power-law degrees
    (exponent tau1, capped at ``max_degree``), power-law community sizes
    (exponent tau2, contiguous node ranges), and mixing parameter ``mu``
    (fraction of each node's edges landing OUTSIDE its community).

    Returns (edges, ground_truth(node, community)). The community-recovery
    tests for PLP/PLM run on this substrate like the reference's tests run
    on LFR's ``community.dat``.
    """
    # community boundaries: sizes ~ (c+1)^(-tau2), normalized to n (tiny,
    # driver-side; k_communities is small by construction)
    raw = [(c + 1) ** (-tau2) for c in range(k_communities)]
    tot = sum(raw)
    sizes = [max(2, int(round(n * x / tot))) for x in raw]
    drift = n - sum(sizes)
    sizes[0] += drift
    bounds = [0]
    for s in sizes:
        bounds.append(bounds[-1] + s)
    lo_arr = F.array(*[F.lit(b) for b in bounds[:-1]])
    hi_arr = F.array(*[F.lit(b) for b in bounds[1:]])

    df = spark.range(n).select(F.col("id").alias("src"))
    comm = (
        F.size(F.filter(lo_arr, lambda b: b <= F.col("src"))) - 1
    ).alias("comm")
    df = df.select("src", comm)
    # degree ~ bounded Zipf(tau1): d = min(max_degree, ceil(avg * u^(-1/(tau1-1)) / norm))
    ud = _u01(F.col("src"), F.lit(seed), F.lit(100))
    deg = F.least(
        F.lit(max_degree),
        F.greatest(
            F.lit(2),
            F.ceil(F.lit(avg_degree / 2.0) * F.pow(F.greatest(ud, F.lit(1e-9)), F.lit(-1.0 / (tau1 - 1.0)) * 0.5)),
        ),
    ).cast("int")
    df = df.select("src", "comm", deg.alias("deg"))
    slots = df.select(
        "src", "comm", F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("slot")
    )
    lo = F.element_at(lo_arr, F.col("comm") + 1)
    hi = F.element_at(hi_arr, F.col("comm") + 1)
    intra_dst = lo + F.pmod(F.xxhash64("src", "slot", F.lit(seed), F.lit(1)), hi - lo)
    global_dst = F.pmod(F.xxhash64("src", "slot", F.lit(seed), F.lit(2)), F.lit(n))
    is_out = _u01(F.col("src"), F.col("slot"), F.lit(seed + 1)) < mu
    edges = _finish(
        slots.select(
            "src", F.when(is_out, global_dst).otherwise(intra_dst).alias("dst")
        )
    )
    truth = df.select(F.col("src").alias("node"), F.col("comm").alias("community"))
    return edges, truth


def planted_partition(
    spark: SparkSession,
    blocks: int,
    block_size: int,
    m_in: int,
    m_out: int,
    seed: int = 42,
) -> DataFrame:
    """k blocks of ``block_size``; ``m_in`` intra-block edges per block +
    ``m_out`` inter-block edges total (ClusteredRandomGraphGenerator shape).
    Ground-truth community of node v = v // block_size."""
    n = blocks * block_size
    intra = spark.range(blocks * m_in).select(
        (F.col("id") % blocks).alias("b"), F.col("id").alias("i")
    ).select(
        (F.col("b") * block_size + F.abs(F.xxhash64("i", F.lit(seed), F.lit(0))) % block_size).alias("src"),
        (F.col("b") * block_size + F.abs(F.xxhash64("i", F.lit(seed), F.lit(1))) % block_size).alias("dst"),
    )
    inter = spark.range(m_out).select(
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(2))) % n).alias("src"),
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(3))) % n).alias("dst"),
    )
    return _finish(intra.union(inter))


def hyperbolic_target_radius(n: int, avg_degree: float, alpha: float) -> float:
    """Disk radius R hitting the target average degree at T=0
    (``HyperbolicSpace.hpp:getExpectedDegree/searchTargetRadius...:169-202``
    binary search on the Krioukov expected-degree closed form)."""
    import math

    def expected_degree(R: float) -> float:
        gamma = 2 * alpha + 1
        xi = (gamma - 1) / (gamma - 2)
        first = math.exp(-R / 2)
        second = math.exp(-alpha * R) * (
            alpha
            * (R / 2)
            * ((math.pi / 4) * (1 / alpha) ** 2 - (math.pi - 1) * (1 / alpha) + (math.pi - 2))
            - 1
        )
        return (2 / math.pi) * xi * xi * n * (first + second)

    gamma = 2 * alpha + 1
    xi_inv = (gamma - 2) / (gamma - 1)
    v = avg_degree * (math.pi / 2) * xi_inv * xi_inv
    current = 2 * math.log(n / v)
    lo, hi = current / 2, current * 2
    while True:
        current = (lo + hi) / 2
        k = expected_degree(current)
        if abs(k - avg_degree) <= 0.01:
            return current
        if k < avg_degree:
            hi = current
        else:
            lo = current


def hyperbolic_graph(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    plexp: float = 3.0,
    seed: int = 42,
) -> DataFrame:
    """Hyperbolic random graph at temperature 0
    (``HyperbolicGenerator.cpp``; Krioukov et al. model): node i gets polar
    coordinates (theta uniform, r with density ~ sinh(alpha*r)), an edge
    joins every pair at hyperbolic distance <= R
    (``HyperbolicSpace::nativeDistance:19-41``). The reference samples with
    a sequential PRNG and ranges over a quadtree; coordinates here are hash
    functions of (seed, i) and the pair search is a **core/periphery band
    join**: nodes with r <= r_c (expected ~sqrt(n), the hubs) broadcast
    against everyone; periphery pairs (both r > r_c) can only connect
    within an angular window w = max delta-theta at (r_c, r_c), so a
    theta-bucket join of width w with adjacent buckets covers all of them
    — candidate count scales ~linearly in n instead of n^2. Both candidate
    sets pass the exact cosh distance filter.

    Returns symmetrized (src, dst, weight=1.0).
    """
    import math

    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(n, avg_degree, alpha)
    cosh_r = math.cosh(alpha * R)
    pts = spark.range(n).select(
        F.col("id").alias("node"),
        (2 * math.pi * _u01(F.col("id"), F.lit(seed), F.lit(0))).alias("theta"),
        (
            F.acosh(1 + _u01(F.col("id"), F.lit(seed), F.lit(1)) * F.lit(cosh_r - 1))
            / F.lit(alpha)
        ).alias("r"),
    ).persist()
    pts.count()
    out = hyperbolic_edges_from_points(pts, n, avg_degree, plexp)
    pts.unpersist()
    return out


def hyperbolic_edges_from_points(
    pts: DataFrame, n: int, avg_degree: float = 6.0, plexp: float = 3.0
) -> DataFrame:
    """The T=0 hyperbolic edge rule (distance <= R) over an explicit
    (node, theta, r) point table — shared by the static generator and the
    dynamic (moving-points) twin. Same core/periphery band join."""
    import math

    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(n, avg_degree, alpha)
    cosh_r = math.cosh(alpha * R)
    # split radius: expected core size ~ sqrt(n)
    frac = math.sqrt(n) / n
    r_c = math.acosh(1 + frac * (cosh_r - 1)) / alpha
    # periphery angular window at (r_c, r_c): cos(w) = (cosh^2 r_c - cosh R)/sinh^2 r_c
    cw = (math.cosh(r_c) ** 2 - math.cosh(R)) / (math.sinh(r_c) ** 2)
    w = math.pi if cw <= -1 else (0.0 if cw >= 1 else math.acos(cw))
    n_buckets = max(1, int(2 * math.pi / max(w, 1e-9)))
    bucket_w = 2 * math.pi / n_buckets

    def dist_ok(t1, r1, t2, r2):
        dphi = F.lit(math.pi) - F.abs(F.lit(math.pi) - F.abs(t1 - t2))
        coshd = F.cosh(r1) * F.cosh(r2) - F.sinh(r1) * F.sinh(r2) * F.cos(dphi)
        return coshd <= F.lit(math.cosh(R))

    a = pts.select(
        F.col("node").alias("src"), F.col("theta").alias("ta"), F.col("r").alias("ra")
    )
    b = pts.select(
        F.col("node").alias("dst"), F.col("theta").alias("tb"), F.col("r").alias("rb")
    )
    core = a.filter(F.col("ra") <= r_c)
    core_pairs = (
        F.broadcast(core).join(b, F.col("src") != F.col("dst"))
        .filter(dist_ok(F.col("ta"), F.col("ra"), F.col("tb"), F.col("rb")))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    # periphery: same or adjacent theta buckets (duplicate each node into
    # its own + next bucket; join on bucket then filter) — covers every
    # pair with delta-theta <= w
    peri = pts.filter(F.col("r") > r_c).select(
        "node", "theta", "r", F.floor(F.col("theta") / bucket_w).alias("bkt")
    )
    dup = peri.select(
        "node", "theta", "r", F.explode(
            F.array(F.col("bkt"), F.pmod(F.col("bkt") + 1, F.lit(n_buckets)))
        ).alias("jb")
    )
    pa = dup.select(F.col("node").alias("src"), F.col("theta").alias("ta"),
                    F.col("r").alias("ra"), "jb")
    pb = peri.select(F.col("node").alias("dst"), F.col("theta").alias("tb"),
                     F.col("r").alias("rb"), F.col("bkt").alias("jb"))
    peri_pairs = (
        pa.join(pb, "jb")
        .filter(F.col("src") != F.col("dst"))
        .filter(dist_ok(F.col("ta"), F.col("ra"), F.col("tb"), F.col("rb")))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    und = core_pairs.unionByName(peri_pairs).distinct()
    out = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    pts.unpersist()
    return out


# Inherently-sequential generators build their edge list on the driver;
# above this n that is a misuse (memory + zero parallelism), and each such
# generator documents a distributed twin to use instead.
DRIVER_GEN_MAX_N = 1_000_000


def _guard_driver_n(n: int, name: str, scale_twin: str) -> None:
    if n > DRIVER_GEN_MAX_N:
        raise ValueError(
            f"{name} is a driver-side sequential generator (inherently "
            f"sequential reference semantics) guarded at n <= "
            f"{DRIVER_GEN_MAX_N}; got n={n}. Use {scale_twin} for the "
            f"distributed realization at scale."
        )


def havel_hakimi_edges(degrees: list[int]) -> list[tuple[int, int]]:
    """Exact Havel-Hakimi realization of a degree sequence
    (``cpp/generators/HavelHakimiGenerator.cpp`` — same greedy: repeatedly
    connect the node of highest residual degree to the next-highest ones).
    Inherently sequential, so this is the driver-side small-n exact form
    (tests, fixture realization); the scale path for "realize this degree
    sequence" is :func:`configuration_model`. Raises ``ValueError`` if the
    sequence is not graphical (greedy failure == Erdos-Gallai violation).

    Guarded at ``DRIVER_GEN_MAX_N`` nodes: beyond that this O(n log n)
    driver loop is the wrong tool — use :func:`configuration_model`."""
    import heapq

    _guard_driver_n(len(degrees), "havel_hakimi", "configuration_model")
    if sum(degrees) % 2 != 0:
        raise ValueError("degree sum must be even")
    heap = [(-d, v) for v, d in enumerate(degrees) if d > 0]
    heapq.heapify(heap)
    edges: list[tuple[int, int]] = []
    while heap:
        nd, u = heapq.heappop(heap)
        d = -nd
        if d > len(heap):
            raise ValueError("degree sequence is not graphical")
        taken = [heapq.heappop(heap) for _ in range(d)]
        for nd2, v in taken:
            edges.append((min(u, v), max(u, v)))
        for nd2, v in taken:
            if -nd2 - 1 > 0:
                heapq.heappush(heap, (nd2 + 1, v))
    return edges


def havel_hakimi(spark: SparkSession, degrees: list[int]) -> DataFrame:
    """Havel-Hakimi realization as a symmetrized (src, dst, weight) edge
    DataFrame (undirected rows both ways), matching the reference
    generator's output contract (exact degree sequence)."""
    und = havel_hakimi_edges(degrees)
    df = spark.createDataFrame(und or [(0, 0)][:0], "src long, dst long")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))


def configuration_model(
    degrees: DataFrame, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Erased configuration model: realize a degree sequence at scale
    (the distributed replacement for sequential Havel-Hakimi; public
    construction — Molloy-Reed stub matching with self-loops/multi-edges
    erased). ``degrees`` = (node long, deg int).

    Plan: explode node -> ``deg`` stubs; give each stub a hash-random but
    deterministic sort key; rank stubs with the distributed range-sort
    (:func:`networkit_spark.plans.ids.dense_ids` plan — no single-partition
    window); pair rank 2k with 2k+1 via a self-join on pair id. Every step
    is a range or hash shuffle linear in executors; result is a pure
    function of (degrees, seed) — reproducible under any parallelism.

    Returns symmetrized simple (src, dst, weight) rows; per-node degree is
    <= requested (erasure loses the few colliding stubs), exact in the
    large-n limit.
    """
    from ..plans.ids import dense_ids

    stubs = degrees.select(
        "node",
        F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("slot"),
    ).filter(F.col("slot") >= 0)
    keyed = stubs.select(
        "node",
        F.struct(
            F.xxhash64("node", "slot", F.lit(seed)).alias("h"),
            F.col("node").alias("n"),
            F.col("slot").alias("s"),
        ).alias("k"),
    )
    ranked = dense_ids(
        keyed.select("k"), "k", id_col="rank", num_partitions=num_partitions,
        distinct=False,
    ).join(keyed, "k").select("rank", "node")
    evens = ranked.filter(F.col("rank") % 2 == 0).select(
        (F.col("rank") / 2).cast("long").alias("pair"), F.col("node").alias("a")
    )
    odds = ranked.filter(F.col("rank") % 2 == 1).select(
        ((F.col("rank") - 1) / 2).cast("long").alias("pair"), F.col("node").alias("b")
    )
    und = (
        evens.join(odds, "pair")
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .distinct()
    )
    return und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))


def edge_switching(
    edges: DataFrame, rounds: int = 10, seed: int = 42
) -> DataFrame:
    """Degree-preserving edge-switching Markov chain
    (``cpp/generators/EdgeSwitchingMarkovChainGenerator.cpp`` /
    ``randomization/EdgeSwitching.cpp`` semantics): repeatedly pick two
    edges (a,b), (c,d) and rewire to (a,d), (c,b) iff the result stays a
    simple graph. The reference mutates one global graph with a sequential
    PRNG; here each round pairs ALL edges at once — hash-bucket pairing
    (bucket = hash(edge, round) % (m/2), the two lowest-hash edges in a
    bucket form a proposal) — and applies exactly the proposals that keep
    the graph simple:

    - no self-loop, the two replacement edges distinct,
    - neither replacement already present (anti-join against current set),
    - no two proposals creating the same edge (count>1 rejection).

    One hash shuffle + one broadcast-scale anti-join per round; a pure
    function of (edges, seed) under any parallelism. Input/output:
    canonical undirected rows (src < dst); degrees are preserved exactly.

    ``cur``/``rn`` are referenced several times per round, so each round
    eagerly localCheckpoints — the same lineage-truncation discipline as
    ``plans/iteration.py`` (without it the plan grows ~4x per round).
    """
    cur = (
        edges.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = cur.count()
    n_buckets = max(1, m // 2)
    for r in range(rounds):
        h = F.xxhash64("src", "dst", F.lit(seed), F.lit(r))
        bucketed = cur.select(
            "src", "dst", h.alias("h"), F.pmod(h, F.lit(n_buckets)).alias("bkt")
        )
        w = Window.partitionBy("bkt").orderBy("h", "src", "dst")
        rn = bucketed.withColumn("rn", F.row_number().over(w)).localCheckpoint(eager=True)
        first = rn.filter(F.col("rn") == 1).select(
            "bkt", F.col("src").alias("a"), F.col("dst").alias("b")
        )
        second = rn.filter(F.col("rn") == 2).select(
            "bkt", F.col("src").alias("c"), F.col("dst").alias("d")
        )
        unpaired = rn.filter(F.col("rn") > 2).select("src", "dst")
        # buckets holding a single edge have no partner: keep that edge as-is
        lone_first = first.join(second.select("bkt"), "bkt", "left_anti").select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        props = (
            first.join(second, "bkt")
            .select(
                "bkt", "a", "b", "c", "d",
                F.least("a", "d").alias("n1s"), F.greatest("a", "d").alias("n1d"),
                F.least("c", "b").alias("n2s"), F.greatest("c", "b").alias("n2d"),
            )
            .withColumn(
                "ok",
                (F.col("n1s") != F.col("n1d"))
                & (F.col("n2s") != F.col("n2d"))
                & ~((F.col("n1s") == F.col("n2s")) & (F.col("n1d") == F.col("n2d"))),
            )
        )
        cand = props.filter("ok").select(
            "bkt",
            F.explode(
                F.array(
                    F.struct(F.col("n1s").alias("src"), F.col("n1d").alias("dst")),
                    F.struct(F.col("n2s").alias("src"), F.col("n2d").alias("dst")),
                )
            ).alias("e"),
        ).select("bkt", "e.src", "e.dst")
        # reject: replacement already in the graph, or proposed twice
        hit_existing = cand.join(cur, ["src", "dst"], "left_semi").select("bkt")
        dup_edge = (
            cand.groupBy("src", "dst").agg(F.collect_list("bkt").alias("bs"), F.count("*").alias("c"))
            .filter("c > 1").select(F.explode("bs").alias("bkt"))
        )
        bad = hit_existing.unionByName(dup_edge).distinct()
        good = props.filter("ok").join(bad, "bkt", "left_anti")
        kept_pairs = props.join(good.select("bkt"), "bkt", "left_anti").select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("c").alias("src"), F.col("d").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
        new_edges = good.select(
            F.explode(
                F.array(
                    F.struct(F.col("n1s").alias("src"), F.col("n1d").alias("dst")),
                    F.struct(F.col("n2s").alias("src"), F.col("n2d").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
        cur = (
            unpaired.unionByName(lone_first)
            .unionByName(kept_pairs)
            .unionByName(new_edges)
            .localCheckpoint(eager=True)
        )
    return cur.withColumn("weight", F.lit(1.0))


def regular_ring_lattice(spark: SparkSession, n: int, k: int) -> DataFrame:
    """RegularRingLatticeGenerator.cpp:12-24: node i connects to the k
    clockwise neighbors (i+1 .. i+k) mod n, with k clamped to n/2 - 1.
    Closed form — one range + explode, no shuffle."""
    k = min(k, n // 2 - 1)
    df = spark.range(n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("off"),
    )
    return _finish(df.select("src", ((F.col("src") + F.col("off")) % n).alias("dst")))


def dorogovtsev_mendes(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """DorogovtsevMendesGenerator.cpp:17-38: start from a triangle; each new
    node attaches to both endpoints of a uniformly random existing edge.

    The growth step reads its own output (edge t must exist before edge
    t+1's choice), so like the reference this is inherently sequential —
    generated driver-side with a seeded RNG (same small-n stance as
    ``havel_hakimi``); the scalable preferential-attachment analog is
    :func:`barabasi_albert`. Guarded at ``DRIVER_GEN_MAX_N`` nodes."""
    import random

    _guard_driver_n(n, "dorogovtsev_mendes", "barabasi_albert")
    rng = random.Random(seed)
    edges = [(0, 1), (1, 2), (2, 0)]
    for w in range(3, n):
        u, v = edges[rng.randrange(len(edges))]
        edges.append((w, u))
        edges.append((w, v))
    return _finish(spark.createDataFrame(edges, "src long, dst long"))


# ---------------------------------------------------------------------------
# Exact LFR (constrained realization with rewiring)
# ---------------------------------------------------------------------------


def _powerlaw_cumprob(min_deg: int, max_deg: int, gamma: float) -> list[float]:
    """PowerlawDegreeSequence.cpp:151-169: cumulative P(deg >= max_deg - i)
    for i = 0..max_deg-min_deg, from d^gamma summed heaviest-first."""
    s = 0.0
    cum = []
    for d in range(max_deg, min_deg - 1, -1):
        s += float(d) ** gamma
        cum.append(s)
    cum = [c / s for c in cum]
    cum[-1] = 1.0
    return cum


def _powerlaw_expected_avg(cum: list[float], max_deg: int) -> float:
    avg = cum[0] * max_deg
    for i in range(1, len(cum)):
        avg += (cum[i] - cum[i - 1]) * (max_deg - i)
    return avg


def _powerlaw_min_from_avg(avg_deg: float, max_deg: int, gamma: float) -> int:
    """PowerlawDegreeSequence.cpp:61-101 binary search for the minimum
    degree whose expected average is closest to ``avg_deg``."""
    lo, hi = 1, max_deg
    avg_lo = _powerlaw_expected_avg(_powerlaw_cumprob(lo, max_deg, gamma), max_deg)
    if avg_lo > avg_deg:
        raise RuntimeError("The average degree is too low")
    if max_deg < avg_deg:
        raise RuntimeError("The average degree must not be higher than the maximum degree")
    avg_hi = float(max_deg)
    while lo + 1 < hi:
        mid = int((lo + hi) * 0.5)
        avg = _powerlaw_expected_avg(_powerlaw_cumprob(mid, max_deg, gamma), max_deg)
        if avg > avg_deg:
            hi, avg_hi = mid, avg
        else:
            lo, avg_lo = mid, avg
    return lo if (avg_deg - avg_lo) < (avg_hi - avg_deg) else hi


def _powerlaw_draw(rng, cum: list[float], max_deg: int) -> int:
    """getDegree(): max_deg - lower_bound(cum, U)."""
    import bisect

    return max_deg - bisect.bisect_left(cum, rng.random())


def _hh_edges_ignore(degrees: list[int]) -> list[tuple[int, int]]:
    """Havel-Hakimi with ``ignoreIfNotRealizable=true`` semantics
    (HavelHakimiGenerator used by EdgeSwitchingMarkovChainGenerator.cpp:14
    inside LFR): when the sequence is not realizable, connect as many
    stubs as available instead of raising."""
    import heapq

    heap = [(-d, v) for v, d in enumerate(degrees) if d > 0]
    heapq.heapify(heap)
    edges: list[tuple[int, int]] = []
    while heap:
        nd, u = heapq.heappop(heap)
        d = min(-nd, len(heap))  # ignore-unrealizable: cap at available
        taken = [heapq.heappop(heap) for _ in range(d)]
        for nd2, v in taken:
            edges.append((min(u, v), max(u, v)))
        for nd2, v in taken:
            if -nd2 - 1 > 0:
                heapq.heappush(heap, (nd2 + 1, v))
    return edges


class _SimpleGraph:
    """Driver-side adjacency for the sequential switch/rewire phases."""

    def __init__(self, n: int, edges):
        self.nbr: list[list[int]] = [[] for _ in range(n)]
        self.eset: set[tuple[int, int]] = set()
        for a, b in edges:
            self.add(a, b)

    def add(self, a, b):
        key = (min(a, b), max(a, b))
        if key in self.eset or a == b:
            return
        self.eset.add(key)
        self.nbr[a].append(b)
        self.nbr[b].append(a)

    def remove(self, a, b):
        self.eset.discard((min(a, b), max(a, b)))
        self.nbr[a].remove(b)
        self.nbr[b].remove(a)

    def has(self, a, b):
        return (min(a, b), max(a, b)) in self.eset

    def swap(self, s1, t1, s2, t2):
        # swapEdge: s1-t1, s2-t2 -> s1-t2, s2-t1
        self.remove(s1, t1)
        self.remove(s2, t2)
        self.add(s1, t2)
        self.add(s2, t1)


def _edge_switch_inplace(g: _SimpleGraph, rng, switches_per_edge: int = 10) -> None:
    """EdgeSwitching.cpp:10-51 (EdgeSwitchingInPlace::run), seeded python
    twin: degree-weighted endpoint picks, early rejects, swapEdge."""
    m = len(g.eset)
    if m < 2:
        return
    weighted = [v for v in range(len(g.nbr)) for _ in range(len(g.nbr[v]))]
    for _ in range(int(switches_per_edge * m)):
        s1 = weighted[rng.randrange(len(weighted))]
        s2 = weighted[rng.randrange(len(weighted))]
        if not g.nbr[s1] or not g.nbr[s2]:
            continue
        t1 = g.nbr[s1][rng.randrange(len(g.nbr[s1]))]
        if s2 == t1 or g.has(s2, t1):
            continue
        t2 = g.nbr[s2][rng.randrange(len(g.nbr[s2]))]
        if t1 == t2 or s1 == t2 or g.has(s1, t2):
            continue
        g.swap(s1, t1, s2, t2)


def lfr_exact(
    spark: SparkSession,
    n: int,
    avg_degree: float = 10,
    max_degree: int = 50,
    degree_exp: float = -2.0,
    min_community: int = 10,
    max_community: int = 50,
    community_exp: float = -1.0,
    mu: float = 0.3,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Exact LFR benchmark generator (``cpp/generators/LFRGenerator.cpp``):
    constrained degree/community realization with intra/inter split and
    rewiring — NOT the hash-deterministic ``lfr_like`` sketch.

    Faithful phases (same structure, seeded python RNG in place of the
    reference's URNG — a seeded twin like the repo's other generators):

    1. power-law degrees with minimum fitted to ``avg_degree``
       (``PowerlawDegreeSequence::setMinimumFromAverageDegree``);
    2. power-law community sizes filled to n, remainder added to the
       smallest (``generatePowerlawCommunitySizeSequence``);
    3. internal degrees ``(1-mu)*deg`` with the reference's probabilistic
       rounding (``setMu``, LFRGenerator.cpp:84-104);
    4. node-to-community assignment with the retry/merge loop
       (``assignNodesToCommunities``) and the run() realizability checks;
    5. per-community intra graphs: parity fix + Havel-Hakimi
       (ignore-unrealizable) + 10-switches-per-edge Markov chain
       (``generateIntraClusterGraph``);
    6. global inter graph on external degrees, with the intra-edge
       rewiring loop and drop-after-10m-attempts fallback
       (``generateInterClusterGraph``).

    Returns (edges, partition(node, subset)); edges symmetrized with unit
    weights. Driver-side like the reference (guarded at
    ``DRIVER_GEN_MAX_N``); the distributed substrate for huge planted
    graphs remains :func:`lfr_like`.
    """
    import math
    import random

    _guard_driver_n(n, "lfr_exact", "lfr_like")
    rng = random.Random(seed)

    # -- 1. degrees ---------------------------------------------------------
    min_deg = _powerlaw_min_from_avg(avg_degree, max_degree, degree_exp)
    cum = _powerlaw_cumprob(min_deg, max_degree, degree_exp)
    deg = [_powerlaw_draw(rng, cum, max_degree) for _ in range(n)]
    if sum(deg) % 2 != 0:
        deg[deg.index(max(deg))] -= 1

    # -- 2. community sizes -------------------------------------------------
    ccum = _powerlaw_cumprob(min_community, max_community, community_exp)
    sizes: list[int] = []
    tot = 0
    while True:
        s = _powerlaw_draw(rng, ccum, max_community)
        if tot + s <= n:
            sizes.append(s)
            tot += s
        else:
            sizes[sizes.index(min(sizes))] += n - tot
            break

    # -- 3. internal degrees (probabilistic rounding, setMu) ----------------
    int_deg = [0] * n
    for u in range(n):
        if deg[u] == 0:
            continue
        x = (1.0 - mu) * deg[u]
        if x < 1:
            int_deg[u] = 1
        elif rng.random() >= math.remainder(x, 1.0):
            int_deg[u] = int(x)
        else:
            int_deg[u] = math.ceil(x)

    # -- realizability checks (run(), LFRGenerator.cpp:409-439) -------------
    if max(int_deg) >= max(sizes):
        raise RuntimeError(
            "Graph not realizable, the maximum internal degree is greater "
            "than the largest possible internal degree."
        )
    if min(int_deg) >= min(sizes):
        raise RuntimeError("Graph not realizable, no node can be placed in the smallest community.")
    sorted_int = sorted(int_deg)
    sorted_sizes = sorted(sizes)
    ci, in_comm = 0, 0
    for d in sorted_int:
        if in_comm == sorted_sizes[ci]:
            ci += 1
            in_comm = 0
        if d >= sorted_sizes[ci]:
            raise RuntimeError(
                "Graph not realizable, community sizes too small or internal degrees too large"
            )
        in_comm += 1

    # -- 4. assignment (assignNodesToCommunities) ---------------------------
    while True:
        ok = True
        comm_nodes: list[list[int]] = [[] for _ in sizes]
        selection = [c for c, s in enumerate(sizes) for _ in range(s)]
        rng.shuffle(selection)
        remaining = list(sizes)
        to_assign: list[int] = []
        for u in range(n):
            c = selection[u]
            if sizes[c] > int_deg[u]:
                comm_nodes[c].append(u)
                remaining[c] -= 1
            else:
                to_assign.append(u)
        attempts = 0
        while to_assign:
            c = selection[rng.randrange(len(selection))]
            i = rng.randrange(len(to_assign))
            u = to_assign[i]
            to_assign[i] = to_assign[-1]
            to_assign.pop()
            while int_deg[u] >= sizes[c]:
                c = selection[rng.randrange(len(selection))]
            comm_nodes[c].append(u)
            if remaining[c] > 0:
                remaining[c] -= 1
                attempts = 0
            else:
                r = rng.randrange(len(comm_nodes[c]))
                to_assign.append(comm_nodes[c][r])
                comm_nodes[c][r] = comm_nodes[c][-1]
                comm_nodes[c].pop()
                attempts += 1
            if attempts > 3 * n:
                # merge the two smallest communities and retry
                mi = sizes.index(min(sizes))
                mv = sizes.pop(mi)
                sizes[sizes.index(min(sizes))] += mv
                ok = False
                break
        if ok:
            break

    zeta = [0] * n
    for c, members in enumerate(comm_nodes):
        for u in members:
            zeta[u] = c

    # -- 5. intra-cluster graphs --------------------------------------------
    all_edges: set[tuple[int, int]] = set()
    for members in comm_nodes:
        if not members:
            continue
        intra = [int_deg[u] for u in members]
        # parity fix (generateIntraClusterGraph, LFRGenerator.cpp:158-181)
        j = 0
        while sum(intra) % 2 != 0 and j < len(intra):
            j += 1
            i = rng.randrange(len(intra))
            u = members[i]
            if rng.random() >= 0.5:
                if intra[i] < len(intra) - 1 and intra[i] < deg[u]:
                    intra[i] += 1
                    int_deg[u] += 1
            else:
                if intra[i] > 1:
                    intra[i] -= 1
                    int_deg[u] -= 1
        g = _SimpleGraph(len(members), _hh_edges_ignore(intra))
        _edge_switch_inplace(g, rng)
        for a, b in g.eset:
            all_edges.add((min(members[a], members[b]), max(members[a], members[b])))

    # -- 6. inter-cluster graph ---------------------------------------------
    ext_deg = [deg[u] - int_deg[u] for u in range(n)]
    inter = _SimpleGraph(n, _hh_edges_ignore(ext_deg))
    _edge_switch_inplace(inter, rng)
    # rewire intra-community edges to inter (generateInterClusterGraph)
    to_rewire = [e for e in inter.eset if zeta[e[0]] == zeta[e[1]]]
    if to_rewire:
        weighted = [v for v in range(n) for _ in range(len(inter.nbr[v]))]
        attempts, max_attempts = 0, len(inter.eset) * 10
        while to_rewire:
            i = rng.randrange(len(to_rewire))
            s1, t1 = to_rewire[i]
            if not inter.has(s1, t1):
                to_rewire[i] = to_rewire[-1]
                to_rewire.pop()
                continue
            attempts += 1
            s2 = weighted[rng.randrange(len(weighted))]
            if s2 == s1 or s2 == t1 or not inter.nbr[s2]:
                if attempts > max_attempts:
                    break
                continue
            t2 = inter.nbr[s2][rng.randrange(len(inter.nbr[s2]))]
            if t1 == t2 or s1 == t2 or inter.has(s1, t2) or inter.has(s2, t1):
                if attempts > max_attempts:
                    break
                continue
            inter.swap(s1, t1, s2, t2)
            to_rewire[i] = to_rewire[-1]
            to_rewire.pop()
            if zeta[s1] == zeta[t2]:
                to_rewire.append((min(s1, t2), max(s1, t2)))
            if zeta[s2] == zeta[t1]:
                to_rewire.append((min(s2, t1), max(s2, t1)))
            if attempts > max_attempts:
                break
        for e in to_rewire:  # drop the unrewirable remainder (reference WARN path)
            if inter.has(*e):
                inter.remove(*e)
    for a, b in inter.eset:
        all_edges.add((min(a, b), max(a, b)))

    edges = _finish(
        spark.createDataFrame(sorted(all_edges) or [(0, 0)][:0], "src long, dst long")
    )
    part = spark.createDataFrame(
        [(u, zeta[u]) for u in range(n)], "node long, subset long"
    )
    return edges, part


_DENSE_P = 0.05  # above this, draw-and-dedup loses >~p/2 of the edges


def _class_pair_edges(
    members: DataFrame,
    sparse_rows: list[tuple[int, int, int]],
    dense_rows: list[tuple[int, int, float]],
    seed: int,
) -> DataFrame:
    """Shared fan-out for class/block-pair samplers (Chung-Lu, SBM).

    ``members``: (cls long, idx long, node long) with idx = 0..size(cls)-1.

    Two regimes per class pair (cls_a <= cls_b):

    * ``sparse_rows`` (ca, cb, n_draws), for p <= ``_DENSE_P``: each draw
      picks hash-uniform member indices — same-class draws use an offset
      (ia, ia + 1 + h % (n-1) mod n) so every draw is a distinct unordered
      pair; cross-class draws are distinct nodes by construction.  Draw
      collisions are deduplicated (the "erased" convention, expected loss
      ~ p/2 — negligible in this regime).
    * ``dense_rows`` (ca, cb, p), for p > ``_DENSE_P``: candidate pairs are
      enumerated by a member-member join and Bernoulli-filtered — exact,
      and the enumeration is O(candidate pairs) = O(edges / p), which is
      only reachable when the block itself is small enough to be dense.

    Returns distinct canonical (src < dst) node pairs.
    """
    spark = members.sparkSession
    sizes = members.groupBy(F.col("cls")).agg(F.count("*").alias("sz"))
    outs = []
    if sparse_rows:
        pairs = spark.createDataFrame(
            [r for r in sparse_rows if r[2] > 0], "ca long, cb long, m long"
        )
        draws = (
            pairs.join(F.broadcast(sizes.withColumnRenamed("cls", "ca").withColumnRenamed("sz", "na")), "ca")
            .join(F.broadcast(sizes.withColumnRenamed("cls", "cb").withColumnRenamed("sz", "nb")), "cb")
            .select(
                "ca", "cb", "na", "nb",
                F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("t"),
            )
            .select(
                "ca", "cb", "na",
                (F.abs(F.xxhash64("ca", "cb", "t", F.lit(seed), F.lit(0))) % F.col("na")).alias("ha"),
                (F.abs(F.xxhash64("ca", "cb", "t", F.lit(seed), F.lit(1)))).alias("hb"),
                F.col("nb"),
            )
            .select(
                "ca", "cb",
                F.col("ha").alias("ia"),
                F.when(
                    F.col("ca") == F.col("cb"),
                    (F.col("ha") + 1 + F.col("hb") % (F.col("na") - 1)) % F.col("na"),
                ).otherwise(F.col("hb") % F.col("nb")).alias("ib"),
            )
            .select(
                "ca", "cb",
                F.when(F.col("ca") == F.col("cb"), F.least("ia", "ib")).otherwise(F.col("ia")).alias("ia"),
                F.when(F.col("ca") == F.col("cb"), F.greatest("ia", "ib")).otherwise(F.col("ib")).alias("ib"),
            )
        )
        outs.append(draws)
    if dense_rows:
        dpairs = spark.createDataFrame(dense_rows, "ca long, cb long, p double")
        cand = (
            members.select(F.col("cls").alias("ca"), F.col("idx").alias("ia"))
            .join(F.broadcast(dpairs), "ca")
            .join(
                members.select(F.col("cls").alias("cb"), F.col("idx").alias("ib")),
                "cb",
            )
            .filter((F.col("ca") != F.col("cb")) | (F.col("ia") < F.col("ib")))
            .filter(
                _u01(
                    F.col("ca"), F.col("cb"), F.col("ia"), F.col("ib"), F.lit(seed)
                ) < F.col("p")
            )
            .select("ca", "cb", "ia", "ib")
        )
        outs.append(cand)
    if not outs:
        return spark.createDataFrame([], "src long, dst long")
    draws = outs[0] if len(outs) == 1 else outs[0].unionByName(outs[1])
    ma = members.select(
        F.col("cls").alias("ca"), F.col("idx").alias("ia"), F.col("node").alias("a")
    )
    mb = members.select(
        F.col("cls").alias("cb"), F.col("idx").alias("ib"), F.col("node").alias("b")
    )
    return (
        draws.join(ma, ["ca", "ia"]).join(mb, ["cb", "ib"])
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .distinct()
    )


def _indexed_members(keyed: DataFrame) -> DataFrame:
    """(cls, node) -> (cls, idx, node) with idx dense 0..size(cls)-1, via the
    distributed range-rank (no single-partition window)."""
    from ..plans.ids import dense_ids

    packed = keyed.select(
        (F.col("cls") * F.lit(1 << 33) + F.col("node")).alias("k")
    )
    ranked = dense_ids(packed, "k", id_col="r", distinct=False)
    withcls = ranked.select(
        "r",
        F.shiftright("k", 33).cast("long").alias("cls"),
        F.col("k").bitwiseAND(F.lit((1 << 33) - 1)).cast("long").alias("node"),
    )
    base = withcls.groupBy("cls").agg(F.min("r").alias("base"))
    return withcls.join(F.broadcast(base), "cls").select(
        "cls", (F.col("r") - F.col("base")).alias("idx"), "node"
    )


def chung_lu(weights: DataFrame, seed: int = 42) -> DataFrame:
    """Chung-Lu expected-degree random graph at scale.

    Reference semantics: ``generators/ChungLuGenerator.cpp:24-58`` — edge
    (u, v) present independently with ``p = min(w_u w_v / S, 1)``,
    ``S = sum(w)``.  The reference's geometric edge-skipping is inherently
    sequential per node; this uses the weight-class pair decomposition of
    its own scalable twin (``ChungLuGeneratorAlamEtAl.cpp``, Alam et al.):
    all pairs between two weight classes share one probability, so the
    per-class-pair edge count is a Binomial draw (numpy, seeded, on the
    driver over the O(k^2) distinct-weight pairs) and the edges themselves
    are hash-uniform member draws — one explode + two joins, no O(n^2)
    stage.  With-replacement draws are deduplicated ("erased", slight
    undercount at high density — documented, vanishes for sparse graphs).

    ``weights``: (node long, w double/long expected degree).  Returns
    symmetrized simple (src, dst, weight) rows.
    """
    import numpy as np

    cls_rows = sorted(
        (float(r["w"]), int(r["c"]))
        for r in weights.groupBy("w").agg(F.count("*").alias("c")).collect()
    )
    k = len(cls_rows)
    S = sum(w * c for w, c in cls_rows)
    if S <= 0:
        return weights.sparkSession.createDataFrame(
            [], "src long, dst long, weight double"
        )
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    sparse_rows: list[tuple[int, int, int]] = []
    dense_rows: list[tuple[int, int, float]] = []
    for i in range(k):
        wi, ni = cls_rows[i]
        for j in range(i, k):
            wj, nj = cls_rows[j]
            p = min(wi * wj / S, 1.0)
            npairs = ni * (ni - 1) // 2 if i == j else ni * nj
            if npairs <= 0 or p <= 0:
                continue
            if p > _DENSE_P:
                dense_rows.append((i, j, p))
                continue
            m = int(rng.binomial(npairs, p)) if npairs < (1 << 62) else int(
                round(npairs * p)
            )
            if m > 0:
                sparse_rows.append((i, j, m))
    cls_id = {w: i for i, (w, _) in enumerate(cls_rows)}
    mapping = weights.sparkSession.createDataFrame(
        [(w, i) for w, i in cls_id.items()], "w double, cls long"
    )
    keyed = weights.select(F.col("w").cast("double").alias("w"), "node").join(
        F.broadcast(mapping), "w"
    ).select("cls", "node")
    und = _class_pair_edges(_indexed_members(keyed), sparse_rows, dense_rows, seed)
    return und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))


def stochastic_blockmodel(
    membership: DataFrame, affinity: list[list[float]], seed: int = 42
) -> DataFrame:
    """Stochastic block model (``generators/StochasticBlockmodel.cpp:34-49``):
    edge (u, v) present with probability ``affinity[block(u)][block(v)]``.

    Same block-pair Binomial decomposition as :func:`chung_lu` (the
    reference's O(n^2) ``forNodePairs`` sweep collapses to one Binomial
    per block pair — G(n, p) conditioned on its edge count is uniform over
    edge sets, so drawing the count then hash-uniform member pairs samples
    the same model, minus the documented with-replacement erasure).
    ``affinity`` must be symmetric (the reference implicitly assumes it).

    ``membership``: (node long, block long).  Returns symmetrized simple
    (src, dst, weight) rows.
    """
    import numpy as np

    k = len(affinity)
    sizes = {
        int(r["block"]): int(r["c"])
        for r in membership.groupBy("block").agg(F.count("*").alias("c")).collect()
    }
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    sparse_rows: list[tuple[int, int, int]] = []
    dense_rows: list[tuple[int, int, float]] = []
    for a in range(k):
        na = sizes.get(a, 0)
        for b in range(a, k):
            nb = sizes.get(b, 0)
            p = min(float(affinity[a][b]), 1.0)
            npairs = na * (na - 1) // 2 if a == b else na * nb
            if npairs <= 0 or p <= 0:
                continue
            if p > _DENSE_P:
                dense_rows.append((a, b, p))
                continue
            m = int(rng.binomial(npairs, p))
            if m > 0:
                sparse_rows.append((a, b, m))
    keyed = membership.select(F.col("block").alias("cls"), "node")
    und = _class_pair_edges(_indexed_members(keyed), sparse_rows, dense_rows, seed)
    return und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))


# ---------------------------------------------------------------------------
# Geometric generators: PubWeb (unit torus), Mocnik (unit ball)
# ---------------------------------------------------------------------------

_PUBWEB_MAX_RAD = 0.2       # MAX_DENSE_AREA_RADIUS (PubWebGenerator.hpp:65)
_PUBWEB_FACTOR = 5.0        # MIN_MAX_DENSE_AREA_FACTOR (:66)
_PUBWEB_BASE_W = 0.01       # BASE_WEIGHT (:67)


def _u01_md5(tag: str, seed: int, *vals) -> float:
    """Driver-side twin of the column-level md5 draw (for the O(areas)
    scalar parameters; per-node draws stay columnar)."""
    import hashlib

    key = "|".join([tag, str(seed)] + [str(v) for v in vals])
    return int(hashlib.md5(key.encode()).hexdigest()[:13], 16) / float(1 << 52)


def _u01_col(tag: str, seed: int, *cols) -> F.Column:
    from networkit_spark.operators.sampling import _draw

    return (_draw(tag, seed, *cols) % F.lit(1 << 52)) / float(1 << 52)


def _pubweb_areas(num_dense_areas: int, seed: int) -> tuple[list[float], list[tuple[float, float]]]:
    """Seeded dense-area radii + centers (PubWebGenerator.cpp:86-105) —
    shared by the static placement and the dynamic generator's inserts."""
    radii = [
        _PUBWEB_MAX_RAD * f * f / (_PUBWEB_FACTOR * _PUBWEB_FACTOR)
        for f in (
            _u01_md5("pw_rad", seed, a) * _PUBWEB_FACTOR + 1.0
            for a in range(num_dense_areas)
        )
    ]
    centers = [
        (_u01_md5("pw_cx", seed, a), _u01_md5("pw_cy", seed, a))
        for a in range(num_dense_areas)
    ]
    return radii, centers


def pubweb_points(
    spark: SparkSession,
    n: int,
    num_dense_areas: int,
    seed: int = 42,
) -> DataFrame:
    """PubWeb node placement (``PubWebGenerator.cpp:86-140``): dense disks
    with anti-quadratic radii hold ``numDenseAreas/(numDenseAreas+2)`` of
    the nodes (sizes ~ rad^1.5), the rest spread uniformly; everything is
    wrapped into the unit torus.  Area parameters are O(areas) seeded
    scalars on the driver; per-node coordinates are pure hash columns.
    Returns (node, x, y)."""
    radii, centers = _pubweb_areas(num_dense_areas, seed)
    if num_dense_areas:
        f = sum(r ** 1.5 for r in radii)
        f = (n * (num_dense_areas / (num_dense_areas + 2.0))) / f
        per_area = [int(round(f * r ** 1.5)) for r in radii]
    else:
        per_area = []
    # node index -> area by offset ranges; remainder = background
    bounds = []
    off = 0
    for a, cnt in enumerate(per_area):
        bounds.append((off, min(off + cnt, n), a))
        off += cnt
        if off >= n:
            break
    pts = spark.range(n).select(F.col("id").alias("node"))
    area_col = F.lit(-1)
    for lo, hi, a in bounds:
        area_col = F.when(
            (F.col("node") >= lo) & (F.col("node") < hi), F.lit(a)
        ).otherwise(area_col)
    import math as _math

    cx = F.lit(-1.0)
    cy = F.lit(-1.0)
    rad = F.lit(0.0)
    for a in range(len(bounds)):
        cx = F.when(F.col("area") == a, F.lit(centers[a][0])).otherwise(cx)
        cy = F.when(F.col("area") == a, F.lit(centers[a][1])).otherwise(cy)
        rad = F.when(F.col("area") == a, F.lit(radii[a])).otherwise(rad)
    ang = _u01_col("pw_ang", seed, F.col("node")) * (2.0 * _math.pi)
    dst = _u01_col("pw_dst", seed, F.col("node")) * rad
    raw_x = F.when(F.col("area") >= 0, cx + F.cos(ang) * dst).otherwise(
        _u01_col("pw_bx", seed, F.col("node"))
    )
    raw_y = F.when(F.col("area") >= 0, cy + F.sin(ang) * dst).otherwise(
        _u01_col("pw_by", seed, F.col("node"))
    )

    def wrap(c):
        return F.when(c > 1.0, c - 1.0).when(c < 0.0, c + 1.0).otherwise(c)

    return pts.withColumn("area", area_col).select(
        "node", wrap(raw_x).alias("x"), wrap(raw_y).alias("y")
    )


def pubweb_graph(
    spark: SparkSession,
    n: int,
    num_dense_areas: int,
    neighborhood_radius: float,
    max_neighbors: int,
    seed: int = 42,
) -> DataFrame:
    """PubWebGenerator (``PubWebGenerator.cpp:46-85``): an undirected edge
    (u, v) with weight ``0.01 / sqrDist`` exists iff EACH endpoint ranks
    the other among its ``max_neighbors`` nearest torus-neighbors within
    ``neighborhood_radius`` (the reference's eligible-then-insert pass is
    exactly mutual selection).

    Distributed shape: torus grid with cell width >= radius — each point
    joins only its 3x3 cell ring (9-row explode, one equi-join), distances
    filter to the radius, a per-node window takes the top ``max_neighbors``
    (ties measure-zero under hash draws; pinned by (dist, neighbor id)),
    and a groupBy keeps pairs selected from BOTH sides.  No O(n^2) stage;
    per-cell load is bounded by the point density.
    Returns (src, dst, weight) symmetrized rows."""
    pts = pubweb_points(spark, n, num_dense_areas, seed).persist()
    pts.count()
    out = pubweb_edges_from_points(pts, neighborhood_radius, max_neighbors)
    pts.unpersist()
    return out


def pubweb_edges_from_points(
    pts: DataFrame, neighborhood_radius: float, max_neighbors: int
) -> DataFrame:
    """The PubWeb edge rule over an explicit (node, x, y) point table —
    shared by the static generator and the dynamic (moving-points) twin."""
    spark = pts.sparkSession
    ncell = max(1, int(1.0 / neighborhood_radius))
    cell = lambda c: F.least(  # noqa: E731
        F.floor(c * ncell).cast("long"), F.lit(ncell - 1)
    )
    a = pts.select(
        F.col("node").alias("u"), F.col("x").alias("xu"), F.col("y").alias("yu"),
        cell(F.col("x")).alias("cxu"), cell(F.col("y")).alias("cyu"),
    )
    deltas = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    a9 = a.crossJoin(F.broadcast(deltas)).select(
        "u", "xu", "yu",
        ((F.col("cxu") + F.col("dx") + ncell) % ncell).alias("cx"),
        ((F.col("cyu") + F.col("dy") + ncell) % ncell).alias("cy"),
    ).distinct()
    b = pts.select(
        F.col("node").alias("v"), F.col("x").alias("xv"), F.col("y").alias("yv"),
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )

    def tdelta(p, q):
        d = p - q
        return F.when(d > 0.5, 1.0 - d).when(d < -0.5, d + 1.0).otherwise(d)

    dx = tdelta(F.col("xu"), F.col("xv"))
    dy = tdelta(F.col("yu"), F.col("yv"))
    cand = (
        a9.join(b, ["cx", "cy"])
        .filter(F.col("u") != F.col("v"))
        .select("u", "v", (dx * dx + dy * dy).alias("sq"))
        .filter(F.col("sq") <= neighborhood_radius * neighborhood_radius)
    )
    from pyspark.sql import Window

    ranked = cand.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("u").orderBy(F.col("sq"), F.col("v"))
        ),
    ).filter(F.col("rk") <= max_neighbors)
    und = (
        ranked.select(
            F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"), "sq"
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("c"), F.min("sq").alias("sq"))
        .filter(F.col("c") == 2)
        .select("src", "dst", (F.lit(_PUBWEB_BASE_W) / F.col("sq")).alias("weight"))
    )
    return und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def mocnik_points(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Mocnik node placement (``MocnikGeneratorBasic.cpp:52-64``): uniform
    draws in the unit square, accepted when inside the ball B_0.5(0.5, 0.5).
    The reference redraws sequentially; here each node takes its first
    accepted attempt out of 48 hash draws (P[all rejected] ~ 1e-30).
    Returns (node, x, y)."""
    att = spark.range(n).select(
        F.col("id").alias("node"),
        F.explode(F.sequence(F.lit(0), F.lit(47))).alias("t"),
    ).select(
        "node", "t",
        _u01_col("mk_x", seed, F.col("node"), F.col("t")).alias("x"),
        _u01_col("mk_y", seed, F.col("node"), F.col("t")).alias("y"),
    )
    ok = att.filter(
        (F.col("x") - 0.5) * (F.col("x") - 0.5)
        + (F.col("y") - 0.5) * (F.col("y") - 0.5)
        < 0.25
    )
    return ok.groupBy("node").agg(
        F.min(F.struct("t", "x", "y")).alias("m")
    ).select("node", F.col("m.x").alias("x"), F.col("m.y").alias("y"))


def mocnik_graph(
    spark: SparkSession, n: int, k: float = 2.5, seed: int = 42,
    max_rings: int = 12,
) -> DataFrame:
    """MocnikGeneratorBasic (``MocnikGeneratorBasic.cpp:42-90``, dim = 2):
    directed edge u -> v iff ``dist(u, v) <= k * distMin(u)`` where
    ``distMin(u)`` is u's nearest-neighbor distance.

    Distributed shape: grid cells of width ~ the expected NN distance;
    distMin comes from expanding cell rings (doubling, driver loop) with
    the standard guarantee that a candidate at distance <= ring_radius
    cannot be beaten by an unexplored cell; the edge pass explodes each
    node over the cells its own ``k * distMin`` ball touches (bounded by
    ~(2k+3)^2 cells since distMin ~ cell width).  No O(n^2) stage.
    Returns directed (src, dst, weight=1.0) rows."""
    import math as _math

    pts = mocnik_points(spark, n, seed).persist()
    pts.count()
    h = max(1e-9, 0.5 / _math.sqrt(max(n, 2)))  # ~ NN scale in the ball
    ncell = max(1, int(1.0 / h))
    h = 1.0 / ncell
    cell = lambda c: F.least(F.floor(c / h).cast("long"), F.lit(ncell - 1))  # noqa: E731
    base = pts.select(
        F.col("node").alias("u"), F.col("x").alias("xu"), F.col("y").alias("yu"),
        cell(F.col("x")).alias("cu"), cell(F.col("y")).alias("du"),
    ).persist()
    tgt = pts.select(
        F.col("node").alias("v"), F.col("x").alias("xv"), F.col("y").alias("yv"),
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    ).persist()
    base.count()
    tgt.count()

    def ring_join(src_df, R):
        ring = src_df.select(
            "u", "xu", "yu",
            F.explode(F.sequence(F.lit(-R), F.lit(R))).alias("dx"),
            F.col("cu"), F.col("du"),
        ).select(
            "u", "xu", "yu", (F.col("cu") + F.col("dx")).alias("cx"), "du",
        ).filter((F.col("cx") >= 0) & (F.col("cx") < ncell)).select(
            "u", "xu", "yu", "cx",
            F.explode(F.sequence(F.lit(-R), F.lit(R))).alias("dy"),
            F.col("du"),
        ).select(
            "u", "xu", "yu", "cx", (F.col("du") + F.col("dy")).alias("cy"),
        ).filter((F.col("cy") >= 0) & (F.col("cy") < ncell))
        j = ring.join(tgt, ["cx", "cy"]).filter(F.col("u") != F.col("v"))
        d2 = (F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2
        return j.select("u", "v", F.sqrt(d2).alias("d"))

    # phase 1: distMin by doubling rings
    remaining = base
    nn_parts = []
    R = 1
    for _ in range(max_rings):
        if remaining.isEmpty():
            break
        cand = ring_join(remaining, R).groupBy("u").agg(F.min("d").alias("dmin"))
        # safe: every cell within ring R covers distance R*h from the cell
        settled = cand.filter(F.col("dmin") <= R * h)
        nn_parts.append(settled.localCheckpoint(eager=True))
        remaining = remaining.join(
            settled.select("u"), "u", "left_anti"
        ).localCheckpoint(eager=True)
        R *= 2
        if R > 2 * ncell:
            # everything within one global ring: finish exhaustively
            cand = ring_join(remaining, ncell).groupBy("u").agg(F.min("d").alias("dmin"))
            nn_parts.append(cand.localCheckpoint(eager=True))
            remaining = remaining.join(cand.select("u"), "u", "left_anti")
            break
    nn = nn_parts[0]
    for p in nn_parts[1:]:
        nn = nn.unionByName(p)

    # phase 2: edges within k * distMin(u)
    reach = base.join(nn, "u").withColumn(
        "R", F.least(F.ceil(F.col("dmin") * k / h).cast("long") + 1, F.lit(ncell))
    )
    ring2 = reach.select(
        "u", "xu", "yu", "dmin",
        F.explode(F.sequence(-F.col("R"), F.col("R"))).alias("dx"),
        "cu", "du", "R",
    ).select(
        "u", "xu", "yu", "dmin", (F.col("cu") + F.col("dx")).alias("cx"), "du", "R",
    ).filter((F.col("cx") >= 0) & (F.col("cx") < ncell)).select(
        "u", "xu", "yu", "dmin", "cx",
        F.explode(F.sequence(-F.col("R"), F.col("R"))).alias("dy"),
        "du",
    ).select(
        "u", "xu", "yu", "dmin", "cx", (F.col("du") + F.col("dy")).alias("cy"),
    ).filter((F.col("cy") >= 0) & (F.col("cy") < ncell))
    d2 = (F.col("xu") - F.col("xv")) ** 2 + (F.col("yu") - F.col("yv")) ** 2
    out = (
        ring2.join(tgt, ["cx", "cy"])
        .filter(F.col("u") != F.col("v"))
        .filter(F.sqrt(d2) <= F.col("dmin") * k)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    out = out.localCheckpoint(eager=True)
    pts.unpersist()
    base.unpersist()
    tgt.unpersist()
    return out


def _powerlaw_gamma_from_avg(avg_deg: float, min_deg: int, max_deg: int,
                             min_gamma: float = -1.0,
                             max_gamma: float = -6.0) -> float:
    """PowerlawDegreeSequence::setGammaFromAverageDegree (:103-145):
    bisect gamma to the expected average closest to ``avg_deg``. The
    reference's bound naming is inverted (minGamma = -1 > maxGamma = -6
    numerically); l = max_gamma (steep, low avg), r = min_gamma (flat,
    high avg), so gamma_l < gamma_r and the bisection is well-ordered."""
    gamma_l, gamma_r = max_gamma, min_gamma
    avg_l = _powerlaw_expected_avg(_powerlaw_cumprob(min_deg, max_deg, gamma_l), max_deg)
    avg_r = _powerlaw_expected_avg(_powerlaw_cumprob(min_deg, max_deg, gamma_r), max_deg)
    if avg_deg > avg_r:
        return gamma_r
    if avg_deg < avg_l:
        return gamma_l
    while gamma_l + 0.001 < gamma_r:
        gamma = (gamma_r + gamma_l) * 0.5
        avg = _powerlaw_expected_avg(_powerlaw_cumprob(min_deg, max_deg, gamma), max_deg)
        if avg > avg_deg:
            gamma_r, avg_r = gamma, avg
        else:
            gamma_l, avg_l = gamma, avg
    return gamma_l if (avg_deg - avg_l) < (avg_r - avg_deg) else gamma_r


_PL_MOD = 1_000_000_007


def powerlaw_degree_sequence(
    spark: SparkSession,
    n: int,
    min_deg: int,
    max_deg: int,
    gamma: float,
    seed: int = 42,
) -> DataFrame:
    """Distributed PowerlawDegreeSequence::getDegreeSequence
    (``PowerlawDegreeSequence.cpp:151-200``) -> (node, degree).

    The cumulative table (max_deg - min_deg + 1 breakpoints) is tiny and
    inlined as column expressions — the inverse-CDF lookup is a pure
    per-row computation, no join. Draws are the portable md5 fold, so a
    SQL oracle replays the identical sequence. The reference's even-sum
    repair (decrement ONE maximal element — the first in iteration order,
    i.e. the lowest node id) is one extra aggregation.
    """
    from networkit_spark.operators.sampling import _draw

    if min_deg > max_deg:
        raise ValueError("minDeg must not be larger than maxDeg")
    if gamma > -1:
        raise ValueError("gamma must be lower than -1")
    cum = _powerlaw_cumprob(min_deg, max_deg, gamma)
    nodes = spark.range(n).select(F.col("id").alias("node"))
    u = (_draw("pldeg", seed, F.col("node")) % _PL_MOD) / float(_PL_MOD)
    # bisect_left(cum, u) == count of breakpoints strictly below u
    idx = sum(
        (F.lit(float(c)) < u).cast("int") for c in cum[:-1]
    ) if len(cum) > 1 else F.lit(0)
    base = nodes.select("node", (F.lit(max_deg) - idx).cast("long").alias("degree"))
    par = base.agg(
        (F.sum("degree") % 2).alias("odd"),
        F.min(F.struct((-F.col("degree")).alias("nd"), F.col("node").alias("n"))).alias("mx"),
    ).first()
    if par["odd"] == 0:
        return base
    fix_node = par["mx"]["n"]
    return base.select(
        "node",
        F.when(F.col("node") == fix_node, F.col("degree") - 1)
        .otherwise(F.col("degree")).alias("degree"),
    )


def crg_cluster_col(node_col, k: int, seed: int = 42) -> F.Column:
    """Cluster id of a node in :func:`clustered_random_graph` — a pure hash
    column (uniform over 0..k-1), so membership never needs a join."""
    return F.pmod(F.xxhash64(node_col, F.lit(seed), F.lit(0xC16)), F.lit(k))


def clustered_random_graph(
    spark: SparkSession,
    n: int,
    k: int,
    p_intra: float,
    p_inter: float,
    seed: int = 42,
    blocks: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """ClusteredRandomGraphGenerator
    (``cpp/generators/ClusteredRandomGraphGenerator.cpp:25-143``,
    ``generators.pyx`` ClusteredRandomGraphGenerator): each node joins one
    of ``k`` clusters uniformly at random; each unordered pair (u < v) is
    an edge with probability ``p_intra`` when both endpoints share a
    cluster, else ``p_inter``.

    Distributed shape (the reference also skip-samples, sequentially): the
    n(n-1)/2 linear pair-index space is cut into ``blocks`` ranges; each
    range is Bernoulli *skip-sampled* (geometric gaps, one numpy pass per
    Arrow batch) independently at both rates — never an O(n^2)
    enumeration.  Cluster membership is the pure hash column
    :func:`crg_cluster_col`, so the same-/different-cluster acceptance
    test is a JVM column filter, no join or shuffle; the only shuffle in
    the whole generator is none at all (union of narrow maps).  Sampling
    cost is ~ P*(p_intra + p_inter) emitted candidates; for k clusters the
    intra-rate stream discards ~(k-1)/k of its draws, which is the price
    of avoiding the row_number shuffle a per-cluster pair space would
    need — fine while p_intra*P/k dominates, documented here for the
    1000-executor reading.

    Returns ``(edges, truth)``: directed (src<dst, weight=1.0) rows and
    the ground-truth (node, community) assignment.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    for p in (p_intra, p_inter):
        if not (0.0 <= p <= 1.0):
            raise ValueError("probabilities must be in [0, 1]")
    import numpy as np
    import pandas as pd

    P = n * (n - 1) // 2
    nb = max(1, min(blocks, P)) if P else 1
    step = (P + nb - 1) // nb if P else 1

    def gen(iterator):
        for pdf in iterator:
            for bid in pdf["id"].to_numpy():
                lo = int(bid) * step
                hi = min(lo + step, P)
                if lo >= hi:
                    continue
                for tag, p in ((0, p_intra), (1, p_inter)):
                    if p <= 0.0:
                        continue
                    if p >= 1.0:
                        idx = np.arange(lo, hi, dtype=np.int64)
                    else:
                        rng = np.random.default_rng([seed, int(bid), tag, 0xC16])
                        pos = lo - 1
                        parts = []
                        chunk = max(1024, int((hi - lo) * p * 1.25) + 16)
                        while pos < hi - 1:
                            draws = rng.geometric(p, size=chunk)
                            steps = np.cumsum(draws, dtype=np.int64) + pos
                            pos = int(steps[-1])
                            parts.append(steps[steps < hi])
                        idx = (
                            np.concatenate(parts)
                            if parts
                            else np.empty(0, dtype=np.int64)
                        )
                    if idx.size == 0:
                        continue
                    # triangular decode t -> (u, v), u < v; float estimate
                    # + exact integer correction (safe past 2^52 indices)
                    t = idx
                    u = (
                        n
                        - 2
                        - np.floor(
                            np.sqrt(-8.0 * t + 4.0 * n * (n - 1) - 7) / 2.0
                            - 0.5
                        )
                    ).astype(np.int64)
                    tstart = lambda w: w * (n - 1) - w * (w - 1) // 2  # noqa: E731
                    for _ in range(2):
                        u = np.where(t < tstart(u), u - 1, u)
                        u = np.where(t >= tstart(u + 1), u + 1, u)
                    start = tstart(u)
                    v = t - start + u + 1
                    yield pd.DataFrame(
                        {
                            "src": u,
                            "dst": v,
                            "tag": np.full(idx.size, tag, dtype=np.int32),
                        }
                    )

    cand = spark.range(nb).repartition(nb).mapInPandas(
        gen, "src long, dst long, tag int"
    )
    same = crg_cluster_col(F.col("src"), k, seed) == crg_cluster_col(
        F.col("dst"), k, seed
    )
    edges = cand.filter(
        ((F.col("tag") == 0) & same) | ((F.col("tag") == 1) & ~same)
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    truth = spark.range(n).select(
        F.col("id").alias("node"),
        crg_cluster_col(F.col("id"), k, seed).alias("community"),
    )
    return edges, truth
