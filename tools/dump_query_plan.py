"""Dump the normalized .explain("formatted") plan of named declared
queries() entries into plans/r11/<name>_<tag>.txt.

Usage: python tools/dump_query_plan.py <before|after> <name> [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from prql_query_spark.engine.session import get_spark, sources_bytes, tune_session_for


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump-query")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    tune_session_for(spark, sources_bytes([sf_dir]))
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("PQ_PLANS_DIR", "r12"))
    os.makedirs(dest, exist_ok=True)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jmode)
        plan = re.sub(r"#\d+L?", "#c", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
        plan = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", plan)
        plan = re.sub(r"file:[^\],\s]+", "file:<sf_dir>", plan)
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
