"""Round-7 drift adjudication (VERDICT r6 item 3): q_filter_derive moved
93 -> 118 ms and x_dup_substrings 1.98 -> 4.26 s between BENCH_r05 and
BENCH_r06 with UNTOUCHED plans.  This probe re-measures both with the
repo's own trustworthy protocol — interleaved Spark/DuckDB runs (both
sides sample the same machine state), 9 pairs, medians — so the answer
is variance-vs-regression, not another single-session sample.

q_filter_derive runs on the COMPACTED layout (the layout the 2x bar is
judged on, bench.py queries_compacted).  x_dup_substrings runs the gate
row vs its oracle SQL at sf0.1.

Usage: python tools/probe_r7_drift.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    import __spark_entry__ as entrymod
    from prql_query_spark import compile_prql
    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for)

    spark = get_spark("pq-probe-drift")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    tune_session_for(spark, sources_bytes([sf_dir]))
    compile_kwargs = entrymod._compile_kwargs(sf_dir)

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def interleaved(label, make_spark_df, duck_sql, pairs, fetch=True):
        # warm both sides (codegen/JIT + duckdb cache)
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

    # --- q_filter_derive on the compacted layout, protocol-identical to
    # bench.py's queries_compacted section: same size-proportional
    # two-table compaction, same split tuning, steady-state warmup over
    # the full headline set, and the §2 handwritten DuckDB twin (the
    # denominator the 2x bar uses — NOT the compiled-DECIMAL oracle
    # twin, which rounds money per-row and runs ~7x slower). ---
    import shutil
    import tempfile

    from prql_query_spark.engine.session import tune_splits_for_layout
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.layout import compact_for_parallelism

    cdir = tempfile.mkdtemp(prefix="pq_compact_")
    cores = spark.sparkContext.defaultParallelism
    for t in ("lineitem", "orders"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        n = max(1, min(cores, os.path.getsize(src) // (1 << 19)))
        compact_for_parallelism(
            spark, src, os.path.join(cdir, f"{t}.parquet"), int(n))
        load_parquet(spark, os.path.join(cdir, f"{t}.parquet")) \
            .createOrReplaceTempView(t)
    tune_splits_for_layout(
        spark, [os.path.join(cdir, f"{t}.parquet")
                for t in ("lineitem", "orders")])
    headline = {
        "q_take": "from lineitem | take 5",
        "q_agg": entrymod.PRQL_QUERIES["q_agg_q1"],
        "q_join_agg": entrymod.PRQL_QUERIES["q_join_agg_q5"],
        "q_topk": entrymod.PRQL_QUERIES["q_topk_customers"],
        "q_filter_derive": entrymod.PRQL_QUERIES["q_filter_derive"],
    }
    for _ in range(2):  # steady-state: untimed pass over the headline set
        for prql in headline.values():
            noop(spark.sql(compile_prql(prql, "spark", **compile_kwargs)))
    sql = compile_prql(entrymod.PRQL_QUERIES["q_filter_derive"], "spark",
                       **compile_kwargs)
    duck_fd = """SELECT l_orderkey,
        l_extendedprice*(1-l_discount) AS disc_price
        FROM lineitem WHERE l_shipdate >= '1995-01-01' AND l_discount > 0.05
        ORDER BY disc_price DESC LIMIT 20"""
    interleaved("q_filter_derive[compacted]",
                lambda: spark.sql(sql), duck_fd, pairs=9)
    shutil.rmtree(cdir, ignore_errors=True)
    entrymod._reg(spark, sf_dir)  # restore original views

    # --- x_dup_substrings: gate row vs oracle twin ---
    fn = entrymod.EXTENSIONS["x_dup_substrings"]
    osql = entrymod.EXTENSION_ORACLES["x_dup_substrings"]
    interleaved("x_dup_substrings", lambda: fn(spark, sf_dir), osql,
                pairs=7)


if __name__ == "__main__":
    main()
