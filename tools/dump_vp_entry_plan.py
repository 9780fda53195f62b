"""Dump the x_minhash_pairs queries() ENTRY plan (verified pairs) —
the estimate branch the round-12 E2 merge re-planned.
Usage: python tools/dump_vp_entry_plan.py [tag]"""
import os, sys, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from prql_query_spark.engine.session import get_spark

tag = sys.argv[1] if len(sys.argv) > 1 else "after"
spark = get_spark("dump-vp")
spark.sparkContext.setLogLevel("ERROR")
df = entrymod.queries()["x_minhash_pairs"](spark, "/root/testdata/sf0.1")
plan = df._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
plan = re.sub(r"#\d+", "#c", plan)
plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12", f"x_minhash_pairs_entry_{tag}.txt")
with open(out, "w") as fh:
    fh.write(plan)
print("wrote", out)
spark.stop()
