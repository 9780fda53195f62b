"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set mirrors BASELINE.md §2 (the DuckDB-measured substitutes — the
reference publishes no numbers) plus the headline extension operators.
Timing = warm median of 3 runs of full execution (collect-to-count), cold
session startup reported separately as `startup_sec`.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    t0 = time.time()
    from pyspark.sql import functions as F  # noqa: F401

    import __spark_entry__ as entrymod
    from prql_query_spark import compile_prql
    from prql_query_spark.engine.session import get_spark

    spark = get_spark("pq-bench")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    from prql_query_spark.engine.session import sources_bytes, tune_session_for

    tune_session_for(spark, sources_bytes([sf_dir]))
    startup = time.time() - t0

    # BASELINE.md §2 shapes, verbatim semantics (q_take is the pure
    # unsorted LIMIT, exactly like the baseline's q_take).
    bench_prql = {
        "q_take": "from lineitem | take 5",
        "q_agg": entrymod.PRQL_QUERIES["q_agg_q1"],
        "q_join_agg": entrymod.PRQL_QUERIES["q_join_agg_q5"],
        "q_window": """
from orders
group [o_custkey] (
    sort [o_orderdate, o_orderkey]
    window expanding:true (
        derive [run_spend = round 2 (sum o_totalprice)]
    )
)
select [o_custkey, o_orderkey, o_orderdate, run_spend]
sort [o_custkey, o_orderdate]
take 10
""",
        "q_topk": entrymod.PRQL_QUERIES["q_topk_customers"],
        "q_filter_derive": entrymod.PRQL_QUERIES["q_filter_derive"],
    }
    extension_names = [
        "x_dedup_exact", "x_minhash_pairs", "x_token_count",
        "x_cosine_topk", "x_events_sessions", "x_retention_cohort",
        "x_unigram_logprob",
    ]

    results: dict[str, float] = {}

    def time_df(make_df, runs: int = 3) -> float:
        make_df().count()  # warm: codegen/JIT compile, file-footer caches
        samples = []
        for _ in range(runs):
            t = time.time()
            df = make_df()
            df.count()  # full execution without driver-side data transfer
            samples.append(time.time() - t)
        return round(statistics.median(samples), 4)

    def note(msg: str) -> None:
        print(msg, file=sys.stderr, flush=True)

    for name, prql in bench_prql.items():
        sql = compile_prql(prql, "spark")
        results[name] = time_df(lambda s=sql: spark.sql(s))
        note(f"bench {name}: {results[name]}s")

    all_queries = entrymod.queries()
    for name in extension_names:
        fn = all_queries[name]
        results[name] = time_df(lambda f=fn: f(spark, sf_dir))
        note(f"bench {name}: {results[name]}s")

    total = round(sum(results.values()), 4)
    print(json.dumps({
        "metric": "bench_total_warm_median",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "startup_sec": round(startup, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
