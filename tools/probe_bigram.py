"""Round-11 probe: x_bigram_backoff plan shape and wall under the probe
vs one-pass (single model tokenization via lazy checkpoint) regimes.

Usage: python tools/probe_bigram.py [sf_dir] [reps]

Prints the formatted plan's scan/exchange counts per regime and strictly
interleaved noop-sink walls (median over reps), per guide §1.2/§1.4.
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prql_query_spark.engine.session import get_spark  # noqa: E402


def counts(df):
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    return {
        "scan_parquet": len(re.findall(r"Scan parquet", plan)),
        "exchange": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchange": len(re.findall(r"ReusedExchange", plan)),
        "sort": len(re.findall(r"\bSort\b", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
    }


def executed_scans(df):
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "scan_parquet": len(re.findall(r"Scan parquet", plan)),
        "reused_exchange": len(re.findall(r"ReusedExchange", plan)),
        "reused_subquery": len(re.findall(r"ReusedSubquery", plan)),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()
    from prql_query_spark.operators.text import bigram_logprob

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    score = docs.filter(F.col("source").isin("src0", "src1"))
    model = docs.filter(~F.col("source").isin("src0", "src1"))

    import inspect

    kw = {}
    if "plan" in inspect.signature(bigram_logprob).parameters:
        variants = {
            "probe": lambda: bigram_logprob(score, model, plan="probe"),
            "onepass": lambda: bigram_logprob(score, model, plan="onepass"),
        }
    else:
        variants = {"probe": lambda: bigram_logprob(score, model, **kw)}

    for name, make in variants.items():
        df = make()
        print(name, "logical:", counts(df))
        spark.sparkContext.setJobDescription(f"probe_bigram:{name}:executed")
        print(name, "executed:", executed_scans(make()))

    walls = {k: [] for k in variants}
    for r in range(reps):
        for name, make in variants.items():
            df = make()
            spark.sparkContext.setJobDescription(f"probe_bigram:{name}:{r}")
            t = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t)
    for name, w in walls.items():
        print(f"{name}: median {statistics.median(w)*1000:.1f} ms "
              f"({['%.0f' % (x*1000) for x in w]})")


if __name__ == "__main__":
    main()
