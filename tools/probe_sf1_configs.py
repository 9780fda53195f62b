"""Round-12 sf1 config probes for q_join_agg_q5 (r11 verdict item 6).

Levers not yet tried at sf1, interleaved in ONE session (round-robin per
rep so drift hits every mode equally):

  * as-is            — the bench configuration (tune_session_for)
  * shj              — spark.sql.join.preferSortMergeJoin=false plus
                       AQE maxShuffledHashJoinLocalMapThreshold=64m
                       (guide §3.1: shuffled hash instead of sort-merge)
  * bloom_forced     — runtime Bloom filter thresholds opened wide
                       (guide §3.2).  Expected no-op: q_join_agg_q5 has
                       NO selective predicate on any build side (every
                       lineitem row joins), so there is nothing for a
                       semi-join filter to drop; the probe records
                       whether might_contain appears in the plan at all.

Usage: python tools/probe_sf1_configs.py [sf1_dir]
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

    import __spark_entry__ as entrymod
    from prql_query_spark import compile_prql
    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for)

    spark = get_spark("pq-probe-sf1cfg")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf1)
    tune_session_for(spark, sources_bytes([sf1]))
    sql = compile_prql(entrymod.PRQL_QUERIES["q_join_agg_q5"], "spark",
                       **entrymod._compile_kwargs(sf1))

    def ex():
        spark.sql(sql).write.format("noop").mode("overwrite").save()

    MODES = {
        "as_is": {},
        "shj": {
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
        },
        "bloom_forced": {
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
                "512m",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "1m",
        },
    }
    defaults = {}
    for conf in MODES.values():
        for k in conf:
            if k not in defaults:
                try:
                    defaults[k] = spark.conf.get(k)
                except Exception:
                    defaults[k] = None

    def set_mode(conf: dict) -> None:
        for k, v in defaults.items():
            if v is not None:
                spark.conf.set(k, v)
        for k, v in conf.items():
            spark.conf.set(k, v)

    # plan excerpts per mode (does bloom fire? which join?)
    plan_info = {}
    for m, conf in MODES.items():
        set_mode(conf)
        plan = spark.sql(sql)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        plan_info[m] = {
            "joins": sorted(set(re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan))),
            "bloom_might_contain": "might_contain" in plan,
        }
    set_mode({})

    samples: dict[str, list[float]] = {m: [] for m in MODES}
    ex(); ex()  # warm
    for _ in range(RUNS):
        for m, conf in MODES.items():
            set_mode(conf)
            t0 = time.time()
            ex()
            samples[m].append(time.time() - t0)
    set_mode({})

    out = {"sf1_dir": sf1, "runs": RUNS, "plan": plan_info,
           **{f"{m}_ms": round(statistics.median(v) * 1000, 1)
              for m, v in samples.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
