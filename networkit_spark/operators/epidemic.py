"""SEIR epidemic simulation (reference `simulation` module).

Reference: ``cpp/simulation/EpidemicSimulationSEIR.cpp`` — states
S(0)/E(1)/I(2)/R(3); per timestep ``t`` a sweep over all nodes:

* an Exposed node becomes Infectious once ``t - timestamp >= eTime``;
* an Infectious node contacts every out-neighbor — a Susceptible contact
  becomes Exposed with probability ``transP`` (independent draw per contact);
* an Infectious node becomes Removed once ``t - timestamp >= iTime``
  (the removal check runs *after* its contacts, so a node infects in the
  same sweep it is removed — preserved here);

then a census of the four populations is appended to the stats table as
rows ``(zero, t, state, count)``. Node ``zero`` starts Infectious at t=0.

The reference's sweep is a racy ``parallelForNodes`` over shared state with a
thread-local RNG; this engine defines the *synchronous* semantics instead
(every decision at time t reads the state at time t-1's end) and replaces the
RNG with a deterministic 60-bit md5 hash per (seed, src, dst, t) — the same
portable construct the dedup family uses, so a DuckDB oracle replays the
identical epidemic (`functions/text.portable_hash60`).

Scale notes: the state is one (node, state, ts) row per node, co-partitioned
by node across supersteps; each sweep is one edges⋈infectious semi-join (the
frontier join is proportional to the *infectious* boundary, not the graph)
plus one left join to apply transitions. The census is a 4-row aggregate on
the already-materialized state — O(1) driver traffic per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.text import portable_hash60

S, E, I, R = 0, 1, 2, 3
PROB_MOD = 1_000_000


def _contact_ok(seed: int, t: int, trans_p: float):
    """Deterministic per-(src,dst,t) Bernoulli(transP) draw, oracle-portable."""
    thr = int(trans_p * PROB_MOD)
    h = portable_hash60(
        F.concat(
            F.lit(f"seir{seed}|"),
            F.col("src"),
            F.lit("|"),
            F.col("dst"),
            F.lit("|"),
            F.lit(str(t)),
        )
    )
    return (h % PROB_MOD) < thr


def seir_simulation(
    edges: DataFrame,
    nodes: DataFrame,
    t_max: int,
    trans_p: float,
    e_time: int,
    i_time: int,
    zero: int,
    seed: int = 42,
) -> DataFrame:
    """-> stats (zero long, t int, state int, population long): the census of
    S/E/I/R after each of the ``t_max`` sweeps — ``getData()`` row-for-row.

    ``edges`` is the directed contact graph (symmetrize for undirected).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    state = nodes.select(
        F.col("id").alias("node"),
        F.when(F.col("id") == zero, F.lit(I)).otherwise(F.lit(S)).alias("state"),
        F.lit(0).alias("ts"),
    ).localCheckpoint(eager=True)

    stats_rows: list[tuple[int, int, int, int]] = []
    for t in range(t_max):
        inf = state.filter(F.col("state") == I).select(F.col("node").alias("src"))
        exposed = (
            e.join(inf, "src")
            .filter(_contact_ok(seed, t, trans_p))
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("hit", F.lit(True))
        )
        to_i = (F.col("state") == E) & (F.lit(t) - F.col("ts") >= e_time)
        to_r = (F.col("state") == I) & (F.lit(t) - F.col("ts") >= i_time)
        to_e = (F.col("state") == S) & F.col("hit")
        state = (
            state.join(exposed, "node", "left")
            .withColumn("hit", F.coalesce("hit", F.lit(False)))
            .select(
                "node",
                F.when(to_e, F.lit(E))
                .when(to_i, F.lit(I))
                .when(to_r, F.lit(R))
                .otherwise(F.col("state"))
                .alias("state"),
                F.when(to_e | to_i | to_r, F.lit(t)).otherwise(F.col("ts")).alias("ts"),
            )
            .localCheckpoint(eager=True)
        )
        census = dict(
            (r["state"], r["c"])
            for r in state.groupBy("state").agg(F.count("*").alias("c")).collect()
        )
        for s in (S, E, I, R):
            stats_rows.append((zero, t, s, census.get(s, 0)))

    return spark.createDataFrame(
        stats_rows, "zero long, t int, state int, population long"
    )


def seir_oracle_sql(
    edges_cte: str,
    t_max: int,
    trans_p: float,
    e_time: int,
    i_time: int,
    zero: int,
    seed: int = 42,
) -> str:
    """ANSI-SQL (DuckDB) replay of :func:`seir_simulation` — the same md5
    draws, unrolled over ``t_max`` sweeps. ``edges_cte`` must define
    ``edges(src, dst, ...)`` and a ``documents`` view supplies the nodes."""
    thr = int(trans_p * PROB_MOD)
    parts = [
        f"WITH {edges_cte}",
        f", s0 AS (SELECT doc_id AS node,"
        f" CASE WHEN doc_id = {zero} THEN {I} ELSE {S} END AS state, 0 AS ts"
        f" FROM documents)",
    ]
    for k in range(1, t_max + 1):
        t, prev = k - 1, f"s{k - 1}"
        draw = (
            f"('0x'||substr(md5('seir{seed}|'||e.src||'|'||e.dst||'|{t}'),1,15))::BIGINT"
            f" % {PROB_MOD} < {thr}"
        )
        parts.append(
            f", x{k} AS (SELECT DISTINCT e.dst AS node FROM edges e"
            f"  JOIN {prev} pu ON e.src = pu.node AND pu.state = {I}"
            f"  JOIN {prev} pv ON e.dst = pv.node AND pv.state = {S}"
            f"  WHERE {draw})"
        )
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT p.node,"
            f" CASE WHEN p.state = {S} AND x.node IS NOT NULL THEN {E}"
            f"      WHEN p.state = {E} AND {t} - p.ts >= {e_time} THEN {I}"
            f"      WHEN p.state = {I} AND {t} - p.ts >= {i_time} THEN {R}"
            f"      ELSE p.state END AS state,"
            f" CASE WHEN (p.state = {S} AND x.node IS NOT NULL)"
            f"        OR (p.state = {E} AND {t} - p.ts >= {e_time})"
            f"        OR (p.state = {I} AND {t} - p.ts >= {i_time})"
            f"      THEN {t} ELSE p.ts END AS ts"
            f" FROM {prev} p LEFT JOIN x{k} x ON p.node = x.node)"
        )
    census = " UNION ALL ".join(
        f"SELECT CAST({zero} AS BIGINT) AS zero, CAST({k - 1} AS INT) AS t,"
        f" CAST(st.state AS INT) AS state, CAST(count(s.node) AS BIGINT) AS population"
        f" FROM (VALUES ({S}),({E}),({I}),({R})) st(state)"
        f" LEFT JOIN s{k} s ON s.state = st.state GROUP BY st.state"
        for k in range(1, t_max + 1)
    )
    parts.append(" " + census)
    return "\n".join(parts)
