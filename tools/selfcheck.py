"""Replicates the driver's correctness gate locally.

For every entry in ``__spark_entry__.queries()``: run the Spark query and the
DuckDB oracle at the given sf dir, compare row count, sorted column names, and
an order-insensitive value hash (rows sorted, columns sorted by name, values
stringified). Prints one line per query + a summary.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import math
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    argv = [a for a in sys.argv[1:] if a != "--json"]
    json_out = "--json" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict = {}

    import duckdb

    import __spark_entry__ as entry_mod
    from networkit_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok = bad = weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            record[name] = {"status": "fail", "err": f"spark: {str(e)[:200]}"}
            bad += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle) [{time.monotonic()-t0:.1f}s]")
            record[name] = {"status": "rows_only", "spark_rows": len(srows)}
            weak += 1
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            record[name] = {"status": "fail", "err": f"duckdb: {str(e)[:200]}"}
            bad += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.monotonic()-t0:.1f}s]")
            if "hash" in " ".join(problems) or "rows" in " ".join(problems):
                s_set = {tuple(norm_cell(v) for v in r) for r in srows}
                o_set = {tuple(norm_cell(v) for v in r) for r in orows}
                print(f"      spark-only: {list(s_set - o_set)[:3]}")
                print(f"      oracle-only: {list(o_set - s_set)[:3]}")
            record[name] = {"status": "fail", "detail": "; ".join(problems)}
            bad += 1
        else:
            print(f"ok    {name}: rows={len(srows)} [{time.monotonic()-t0:.1f}s]")
            record[name] = {
                "status": "ok", "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            ok += 1
    print(f"\n{ok} ok, {weak} weak (rows-only), {bad} fail")
    if json_out:
        import json as _json
        out_path = "/root/repo/BENCH/selfcheck_full.json"
        with open(out_path, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "summary": {"ok": ok, "rows_only": weak, "fail": bad},
                 "queries": record},
                f, indent=1,
            )
        print(f"wrote {out_path}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
