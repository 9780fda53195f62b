"""q_join_agg_q5's sf1 slope decomposition (round-8 VERDICT item 3):
SCALING.md measures its per-byte slope at ~9.3x DuckDB's at sf1 — the
one headline query whose deficit is slope, not floor.  The pinned plan
(PLANS.md: all-broadcast, fact never shuffles, one exchange) was
verified at sf0.1; this probe answers the open question for sf1:

  1. Does the 10x orders side (~15 MB > the 10 MB pinned broadcast
     threshold) still broadcast at sf1, or flip to shuffle joins?
     (dumps the formatted physical plan for PLANS.md)
  2. Interleaved A/B of the join strategy: the bench configuration
     as-is vs forced-SMJ (autoBroadcastJoinThreshold=-1) vs forced
     all-broadcast (threshold 256 MB) — is the plan choice the
     residual, or is it engine-constant decode+join compute?

Same-run DuckDB denominator measured alongside.

Usage: python tools/probe_joinagg_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "7"))


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"

    import duckdb

    import __spark_entry__ as entrymod
    from prql_query_spark import compile_prql
    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for)

    spark = get_spark("pq-probe-joinagg")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf1)
    tune_session_for(spark, sources_bytes([sf1]))
    sql = compile_prql(entrymod.PRQL_QUERIES["q_join_agg_q5"], "spark",
                       **entrymod._compile_kwargs(sf1))

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        p = os.path.join(sf1, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    dsql = compile_prql(entrymod.PRQL_QUERIES["q_join_agg_q5"], "duckdb")

    def ex():
        spark.sql(sql).write.format("noop").mode("overwrite").save()

    # plan dump under the bench configuration
    plan = spark.sql(sql)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    joins = sorted(set(re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)))
    n_exchanges = len(re.findall(r"\bExchange\b", plan))

    modes = {
        "bench_asis": None,            # whatever tune_session_for pinned
        "forced_smj": "-1",            # no broadcasts at all
        "forced_broadcast": str(256 * 1024 * 1024),
    }
    key = "spark.sql.autoBroadcastJoinThreshold"
    aqe_key = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    base = spark.conf.get(key)
    samples: dict[str, list[float]] = {m: [] for m in modes}
    samples["duckdb"] = []
    ex()  # warm
    for _ in range(RUNS):
        for m, thr in modes.items():
            eff = base if thr is None else thr
            spark.conf.set(key, eff)
            spark.conf.set(aqe_key, eff)
            t0 = time.time()
            ex()
            samples[m].append(time.time() - t0)
        t0 = time.time()
        con.execute(dsql).fetchall()
        samples["duckdb"].append(time.time() - t0)
    spark.conf.set(key, base)
    spark.conf.set(aqe_key, base)

    out = {
        "sf1_dir": sf1, "runs": RUNS,
        "plan_joins": joins, "plan_exchanges": n_exchanges,
        **{f"{m}_ms": round(statistics.median(v) * 1000, 1)
           for m, v in samples.items()},
    }
    print(json.dumps(out))
    print("---- formatted plan (bench configuration) ----")
    print(plan)


if __name__ == "__main__":
    main()
