"""Plan audit over every queries() entry: counts of scans per source file,
Exchanges, Python eval nodes, joins by strategy, and red flags (cartesian,
duplicate scans of the same file, BroadcastNestedLoopJoin).

Writes a TSV to stdout:  name  n_scan  n_dup_scan  n_exchange  n_python
n_bnlj  n_cartesian  n_smj  n_window  notes

Usage: python tools/audit_plans.py [name_filter...]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from prql_query_spark.engine.session import get_spark, sources_bytes, tune_session_for


def main() -> None:
    only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    tune_session_for(spark, sources_bytes([sf_dir]))
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    qs = entrymod.queries()
    print("name\tscan\tdup_scan\texchange\tpython\tbnlj\tcartesian\tsmj\twindow\tnote")
    for name, fn in sorted(qs.items()):
        if only and not any(f in name for f in only):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(jmode)
        except Exception as e:
            print(f"{name}\t-\t-\t-\t-\t-\t-\t-\t-\tERROR {type(e).__name__}: {e}"
                  .replace("\n", " ")[:300])
            continue
        scans = re.findall(r"Location: InMemoryFileIndex \[([^\]]+)", plan)
        bases = [os.path.basename(s.split(",")[0]) for s in scans]
        dup = sum(c - 1 for c in
                  {b: bases.count(b) for b in set(bases)}.values() if c > 1)
        n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_py = len(re.findall(
            r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
            plan))
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_cart = plan.count("CartesianProduct")
        n_smj = len(re.findall(r"^\(\d+\) SortMergeJoin", plan, re.M))
        n_win = len(re.findall(r"^\(\d+\) Window", plan, re.M))
        print(f"{name}\t{len(bases)}\t{dup}\t{n_ex}\t{n_py}\t{n_bnlj}"
              f"\t{n_cart}\t{n_smj}\t{n_win}\t")
    spark.stop()


if __name__ == "__main__":
    main()
