"""Head-to-head wall-clock: each oracle-checked query on Spark (warm
median, full execution) vs its DuckDB oracle on the same parquet at the
same scale factor.  This is the honest version of BASELINE.md §2 for the
extension tier — same data, same semantics, both engines warm.

Usage: python tools/bench_extensions.py [sf_dir] [name ...]
Prints one markdown table row per query plus a JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from prql_query_spark.engine.session import get_spark, sources_bytes, tune_session_for

DEFAULT_NAMES = [
    "q_agg_q1", "q_join_agg_q5",
    "x_dedup_exact", "x_token_count", "x_cosine_topk", "x_lang_id",
    "x_unigram_logprob", "x_retention_cohort", "x_sessionize",
    "x_anomaly_zscore", "x_histogram", "x_winsorize", "x_cube_agg",
    "x_constraint_audit", "x_weighted_sample", "x_fuzzy_match",
    "x_tfidf_top", "x_bigram_top", "x_pmi_top", "x_text_profile",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_NAMES

    spark = get_spark("bench-ext")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    tune_session_for(spark, sources_bytes([sf_dir]))

    def fresh_con():
        c = duckdb.connect()
        for t in entrymod.TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        return c

    # holder so run_capped can swap in a fresh connection: after
    # con.interrupt() the connection is WEDGED — every later execute
    # errors instantly, which nulled out the whole tail of the round-6
    # sweep after the first capped oracle (x_cosine_ivf)
    conbox = [fresh_con()]

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out = {}
    # steady-state protocol (round 3, same as bench.py): one untimed pass
    # over the whole set first, so early rows don't pay whole-JVM JIT
    # compilation that later rows get for free
    for name in names:
        if name in qs:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print("| query | spark (ms) | duckdb (ms) | ratio |")
    print("|---|---|---|---|")
    for name in names:
        if name not in qs or name not in oracles:
            continue
        fn, osql = qs[name], oracles[name]

        def s_exec():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        s_exec()
        s_times = []
        for _ in range(3):
            t0 = time.time()
            s_exec()
            s_times.append(time.time() - t0)
        s_ms = statistics.median(s_times) * 1000

        # DuckDB side under a wall-clock cap (PQ_DUCK_TIMEOUT_S, default
        # 120 s): some exact oracle twins are deliberately O(n^2)/recursive
        # formulations that take minutes-to-hours at sf0.1 — a sweep must
        # record "exceeds cap" and move on, not wedge (round-3 incident:
        # one oracle burned 50 CPU-minutes single-threaded).
        import threading

        cap = float(os.environ.get("PQ_DUCK_TIMEOUT_S", "120"))

        def run_capped() -> float | None:
            done: list[float] = []
            err: list[BaseException] = []
            con = conbox[0]

            def work():
                try:
                    t0 = time.time()
                    con.execute(osql).fetchall()
                    done.append(time.time() - t0)
                except BaseException as e:  # interrupt lands here
                    err.append(e)

            th = threading.Thread(target=work, daemon=True)
            th.start()
            th.join(cap)
            if th.is_alive():
                con.interrupt()
                th.join(30)
                # The worker may STILL hold the connection after the
                # grace join; duckdb can raise/crash on close-while-in-
                # use, which would abort the whole sweep instead of
                # nulling this one query.  Leak the wedged con instead.
                if not th.is_alive():
                    try:
                        con.close()
                    except Exception:
                        pass
                conbox[0] = fresh_con()  # interrupted con is unusable
                return None
            if err:
                try:
                    con.close()
                except Exception:
                    pass
                conbox[0] = fresh_con()
                return None
            return done[0]

        warm = run_capped()
        if warm is None:
            out[name] = {"spark_ms": round(s_ms, 1), "duckdb_ms": None,
                         "ratio": None}
            print(f"| {name} | {s_ms:.1f} | >cap ({cap:.0f}s) | — |",
                  flush=True)
            continue
        d_times = []
        for _ in range(3):
            d = run_capped()
            if d is None:
                break
            d_times.append(d)
        d_ms = statistics.median(d_times or [warm]) * 1000

        ratio = s_ms / d_ms if d_ms else float("inf")
        out[name] = {"spark_ms": round(s_ms, 1), "duckdb_ms": round(d_ms, 1),
                     "ratio": round(ratio, 2)}
        print(f"| {name} | {s_ms:.1f} | {d_ms:.1f} | {ratio:.2f}x |", flush=True)

    print(json.dumps({"metric": "ext_bench", "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
