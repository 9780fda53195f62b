"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the given sf, compare
row counts, column names, and values (order-insensitive).

Usage: python tools/check_parity.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from prql_query_spark.engine.session import get_spark


def norm_cell(v):
    """Normalize a cell to a (type-class, value) pair.

    Type-class tagging is the point: the driver's value hash is computed on
    typed cells, so Spark BIGINT 1863 vs DuckDB DOUBLE 1863.0 (or HUGEINT →
    decimal128) must FAIL here even though Python's ``==`` equates them.
    That blindness is how the two round-2 driver reds escaped the local gate
    (VERDICT r2 "What's wrong" #3).
    """
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT/DECIMAL exports as decimal128 — distinct from both
        # int64 and float64 in the driver's Arrow-typed hash.
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # PQ_EXACT=1 mimics the driver's exact value hash (no tolerance);
        # default keeps a 9-decimal tolerance for float-noise-only diffs.
        if os.environ.get("PQ_EXACT"):
            return ("float", v)
        return ("float", round(v, 9))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]
    spark = get_spark("parity-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            n_rows_only += 1
            continue
        try:
            # Fetch via Arrow, NOT fetchall: DuckDB's Python client returns
            # HUGEINT (the SUM(int) result type) as plain `int` through
            # fetchall, so the decimal type-class branch in norm_cell never
            # fired and the whole round-3 red class (HUGEINT → decimal128 vs
            # Spark BIGINT) passed locally while failing the driver's
            # Arrow-typed hash.  .arrow() preserves decimal128 as
            # decimal.Decimal — the driver's actual protocol.
            tbl = con.execute(oracles[name]).arrow()
            ocols = list(tbl.schema.names)
            orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orr)}")
            n_fail += 1
            continue
        if sr != orr:
            bad = sum(1 for a, b in zip(sr, orr) if a != b)
            print(f"FAIL {name}: {bad}/{len(sr)} rows differ")
            for a, b in list(zip(sr, orr))[:200]:
                if a != b:
                    print(f"  spark:  {a}\n  duckdb: {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
