"""Native distributed BTER (Block Two-level Erdős–Rényi) generator.

The reference's ``BTERReplicator`` (``generators.pyx:1777-1860``) only
*shells out* to the FEASTPACK Octave implementation — it fits
``nd`` (nodes per degree) and ``ccd`` (mean clustering per degree) from an
input graph and calls ``bter(nd, ccd)``. This module implements the BTER
model itself (Kolda, Pinar, Plantenga, Seshadhri, "A scalable generative
graph model with community structure", 2013) Spark-first, so the
fit → generate loop runs with no external runtime:

* ``bter_fit``: degree histogram + per-degree mean clustering from an
  input graph (one degree agg + the existing exact LCC operator).
* ``bter_generate``: phase 1 plants affinity blocks — consecutive
  degree-sorted nodes in blocks of size d+1, each an ER(rho) with
  ``rho = ccd(d)^(1/3)`` (so expected within-block triangles match the
  target clustering); phase 2 realizes the *excess* degree
  ``e_i = max(0, d_i - rho (b-1))`` with the existing Chung-Lu
  class-pair generator. Degree-1 nodes skip phase 1 entirely.

Scale shape: the degree histogram is O(#distinct degrees) on the driver;
block boundaries are walked per degree CLASS (not per block) and shipped
as a tiny broadcast rules table; per-node block ids come from one
broadcast range join; phase-1 pairs from one self-join on block id
(Σ block_size² ≈ graph volume); phase 2 reuses ``chung_lu``'s binomial
class-pair decomposition. No O(n²) stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.operators.sampling import _draw

_MOD = 1_000_000_007


def bter_fit(und_edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(nd, ccd) from a symmetrized simple graph — the ``ccperdeg`` +
    ``accumarray`` fit step of the reference's Octave script
    (generators.pyx:1794-1797): nd = (degree, cnt), ccd = (degree, cc)."""
    deg = und_edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    )
    nd = deg.groupBy("degree").agg(F.count("*").alias("cnt"))
    from networkit_spark.operators.triangles import local_clustering_coefficient

    lcc = local_clustering_coefficient(und_edges)
    ccd = (
        deg.join(lcc, "node", "left")
        .fillna({"lcc": 0.0})
        .groupBy("degree")
        .agg(F.avg("lcc").alias("cc"))
    )
    return nd, ccd


def _block_rules(classes: list[tuple[int, int, float]]) -> list[dict]:
    """Walk degree classes (degree asc), each ``(d, cnt, cc)`` with d >= 2,
    and emit O(#classes) node-index range rules:

    ``{"lo", "hi", "kind", ...}`` with kind ``run`` (blocks of size s
    repeating from base id) or ``fill`` (the tail of a block that started
    in an earlier class). Every rule carries the owning block's leader
    degree ``d``, size ``s`` and ER probability ``rho``.
    """
    rules: list[dict] = []
    idx = 0
    next_block = 0
    carry_left = 0  # nodes still needed by the open block
    carry = None  # (block_id, d, s, rho)
    for d, cnt, cc in classes:
        rho = min(1.0, max(0.0, cc)) ** (1.0 / 3.0)
        start = idx
        remaining = cnt
        if carry_left > 0:
            take = min(carry_left, remaining)
            rules.append({
                "lo": idx, "hi": idx + take, "kind": "fill",
                "block": carry[0], "d": carry[1], "s": carry[2], "rho": carry[3],
            })
            idx += take
            remaining -= take
            carry_left -= take
            if carry_left > 0:
                continue  # class exhausted inside the open block
            carry = None
        s = d + 1
        q, rest = divmod(remaining, s)
        if q > 0:
            rules.append({
                "lo": idx, "hi": idx + q * s, "kind": "run",
                "base": next_block, "d": d, "s": s, "rho": rho,
            })
            next_block += q
            idx += q * s
        if rest > 0:
            rules.append({
                "lo": idx, "hi": idx + rest, "kind": "fill",
                "block": next_block, "d": d, "s": s, "rho": rho,
            })
            carry = (next_block, d, s, rho)
            carry_left = s - rest
            next_block += 1
            idx += rest
    return rules


def bter_generate(
    spark: SparkSession,
    nd: DataFrame,
    ccd: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """Generate a BTER graph from ``nd`` (degree, cnt) and ``ccd``
    (degree, cc; missing degrees default cc=0). Returns symmetrized simple
    (src, dst, weight=1.0) rows; node ids are degree-sorted ascending
    (ties by degree class order), 0-based."""
    cc_map: dict[int, float] = {}
    if ccd is not None:
        cc_map = {int(r["degree"]): float(r["cc"]) for r in ccd.collect()}
    hist = sorted(
        (int(r["degree"]), int(r["cnt"])) for r in nd.collect() if int(r["cnt"]) > 0
    )
    n = sum(c for _, c in hist)
    if n == 0:
        return spark.createDataFrame([], "src long, dst long, weight double")
    # node id layout: ascending degree; degree<=1 nodes first (unblocked)
    low = [(d, c) for d, c in hist if d < 2]
    high = [(d, c, cc_map.get(d, 0.0)) for d, c in hist if d >= 2]
    n_low = sum(c for _, c in low)
    rules = _block_rules(high)
    for r in rules:
        r["lo"] += n_low
        r["hi"] += n_low
    # degree per node: range rules too (same layout walk)
    deg_rules = []
    off = 0
    for d, c in low + [(d, c) for d, c, _ in high]:
        deg_rules.append((off, off + c, d))
        off += c
    nodes = spark.range(n).select(F.col("id").alias("node"))
    deg_col = F.lit(0)
    for lo, hi, d in deg_rules:
        deg_col = F.when((F.col("node") >= lo) & (F.col("node") < hi), F.lit(d)).otherwise(deg_col)
    nodes = nodes.select("node", deg_col.cast("double").alias("degree"))

    rows = []
    for r in rules:
        rows.append((
            r["lo"], r["hi"], r.get("base", -1), r.get("block", -1),
            r["s"], float(r["rho"]),
        ))
    edges_p1 = None
    if rows:
        rdf = spark.createDataFrame(
            rows, "lo long, hi long, base long, block long, s long, rho double"
        )
        blocked = nodes.join(
            F.broadcast(rdf),
            (F.col("node") >= F.col("lo")) & (F.col("node") < F.col("hi")),
        ).select(
            "node", "degree", "rho", "s",
            F.when(F.col("base") >= 0,
                   F.col("base") + F.floor((F.col("node") - F.col("lo")) / F.col("s")))
            .otherwise(F.col("block")).alias("bid"),
        )
        a = blocked.select(F.col("node").alias("src"), F.col("bid"), F.col("rho"))
        b = blocked.select(F.col("node").alias("dst"), F.col("bid"))
        draw = (_draw("bter_p1", seed, F.col("src"), F.col("dst")) % _MOD) / float(_MOD)
        edges_p1 = (
            a.join(b, "bid")
            .filter(F.col("src") < F.col("dst"))
            .filter(draw < F.col("rho"))
            .select("src", "dst")
        )
        # phase-2 weights: excess over the expected within-block degree
        w2 = blocked.select(
            "node",
            F.greatest(
                F.col("degree") - F.col("rho") * (F.col("s") - 1), F.lit(0.0)
            ).alias("w"),
        )
        w_low = nodes.filter(F.col("node") < n_low).select(
            "node", F.col("degree").alias("w")
        )
        weights = w_low.unionByName(w2)
    else:
        weights = nodes.select("node", F.col("degree").alias("w"))

    from networkit_spark.sources.generators import chung_lu

    # round phase-2 weights to 2 decimals: chung_lu's class-pair
    # decomposition needs a bounded number of distinct weights
    weights = weights.select("node", F.round("w", 2).alias("w"))
    p2 = chung_lu(weights, seed=seed + 1).filter(F.col("src") < F.col("dst")).select("src", "dst")
    und = (edges_p1.unionByName(p2).distinct() if edges_p1 is not None else p2.distinct())
    return (
        und.withColumn("weight", F.lit(1.0))
        .unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .withColumn("weight", F.lit(1.0))
        )
    )


def bter_replicate(und_edges: DataFrame, scale: float = 1.0, seed: int = 42) -> DataFrame:
    """BTERReplicator.fit + generate: fit (nd, ccd) from the input graph,
    scale the degree histogram by ``scale`` (the reference's
    ``nd * scaleDegree``, generators.pyx:1797), regenerate."""
    spark = und_edges.sparkSession
    nd, ccd = bter_fit(und_edges)
    if scale != 1.0:
        nd = nd.select(
            "degree", F.greatest(F.round(F.col("cnt") * scale), F.lit(0)).cast("long").alias("cnt")
        ).filter(F.col("cnt") > 0)
    return bter_generate(spark, nd, ccd, seed=seed)
