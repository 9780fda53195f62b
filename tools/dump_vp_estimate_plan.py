"""Dump the verified-pairs ESTIMATE branch plan (sig -> candidates ->
per-pair signature fold) — the subplan the round-12 E2 merge re-planned;
the full entry plan hides it behind the survivor checkpoint barrier.
Works on both the old (pairs + _fold_pair_side) and new
(_band_pair_estimates) code.  Usage: python tools/dump_vp_estimate_plan.py [tag]
"""
import os, sys, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from prql_query_spark.engine.session import get_spark
from prql_query_spark.engine.sources import load_parquet
from prql_query_spark.operators import dedup as D

tag = sys.argv[1] if len(sys.argv) > 1 else "after"
spark = get_spark("dump-vp-est")
spark.sparkContext.setLogLevel("ERROR")
docs = load_parquet(spark, "/root/testdata/sf0.1/documents.parquet")
sig = D.minhash_signatures(docs, "doc_id", "text", 64, 5)
if hasattr(D, "_band_pair_estimates"):
    est = D._band_pair_estimates(sig, 64, 16, 1000)
else:
    pairs = D._pairs_from_banded(D._banded_from_sig(sig, 64, 16), 1000)
    est = D._fold_pair_side(pairs, sig.withColumnRenamed("_sig", "_v"), "_v")
plan = est._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
plan = re.sub(r"#\d+", "#c", plan)
plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12", f"x_minhash_vp_estimate_{tag}.txt")
with open(out, "w") as fh:
    fh.write(plan)
print("wrote", out)
spark.stop()
