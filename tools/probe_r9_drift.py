"""Round-9 drift adjudication (VERDICT r8 "What's wrong" 1): the
extension-tier same-run ratio moved 2.99 -> 4.3 between BENCH_full_r07
and BENCH_full_r08 with UNTOUCHED plans; the two biggest movers were
x_cosine_topk (238 -> 411 ms) and x_retention_cohort (290 -> 390 ms)
while their DuckDB denominators sped up ~18%.  Re-measure both with the
repo's trustworthy protocol — interleaved Spark/DuckDB pairs in one
fresh session (both sides sample the same machine state), medians —
so the answer is variance-vs-regression, not another single-session
sample.  Protocol identical to tools/probe_r7_drift.py (§4.4d), which
adjudicated the r6 drift the same way.

Also confirms (by import) that the benched x_cosine_topk entry is the
Arrow/BLAS variant (cosine_topk_arrow) — the r8 verdict asked.

Usage: python tools/probe_r9_drift.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import inspect
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    import __spark_entry__ as entrymod
    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for)

    spark = get_spark("pq-probe-drift9")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    tune_session_for(spark, sources_bytes([sf_dir]))

    src = inspect.getsource(entrymod._x_cosine_topk)
    print("x_cosine_topk uses cosine_topk_arrow:",
          "cosine_topk_arrow" in src, flush=True)

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "documents",
              "embeddings", "events"):
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def interleaved(label, make_spark_df, duck_sql, pairs=7):
        noop(make_spark_df())
        noop(make_spark_df())
        con.execute(duck_sql).fetchall()
        s_samples, d_samples = [], []
        for _ in range(pairs):
            t0 = time.time()
            noop(make_spark_df())
            s_samples.append(time.time() - t0)
            t0 = time.time()
            con.execute(duck_sql).fetchall()
            d_samples.append(time.time() - t0)
        s_med = statistics.median(s_samples)
        d_med = statistics.median(d_samples)
        print(f"{label}: spark {s_med*1000:.1f} ms  duck {d_med*1000:.1f} ms"
              f"  ratio {s_med/d_med:.2f}x"
              f"  (spark {[round(x*1000,1) for x in s_samples]},"
              f" duck {[round(x*1000,1) for x in d_samples]})",
              flush=True)

    for name in ("x_cosine_topk", "x_retention_cohort"):
        fn = entrymod.EXTENSIONS[name]
        osql = entrymod.EXTENSION_ORACLES[name]
        interleaved(name, lambda f=fn: f(spark, sf_dir), osql, pairs=7)


if __name__ == "__main__":
    main()
