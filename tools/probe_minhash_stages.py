"""Per-stage decomposition of the x_minhash_pairs bench wall (r11 verdict
item 1: "nobody has yet shown WHERE the other second goes").

Times incremental sub-plans of minhash_lsh_pairs into the noop sink (warm
medians, same protocol as bench.py) and dumps per-stage executor metrics
from the UI REST API for one labelled full run.  Run:

    python tools/probe_minhash_stages.py [runs]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators import dedup as D

    spark = get_spark("probe-minhash-stages",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    docs.select("doc_id", "text").write.format("noop").mode("overwrite").save()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def med(make, label: str) -> float:
        noop(make())
        noop(make())
        samples = []
        for _ in range(runs):
            t = time.time()
            noop(make())
            samples.append(time.time() - t)
        v = round(statistics.median(samples) * 1000, 1)
        print(f"{label:42s} {v:8.1f} ms", flush=True)
        return v

    num_perm, bands, k = 64, 16, 5

    def sig_df():
        return D.minhash_signatures(docs, "doc_id", "text", num_perm, k)

    def banded_df():
        return D._banded_from_sig(sig_df(), num_perm, bands)

    def grouped_df():
        banded = banded_df()
        ids = F.slice(F.sort_array(F.collect_list("_id")), 1, 1000)
        return (banded.groupBy("_band", "_bucket").agg(ids.alias("_ids"))
                .filter(F.size("_ids") > 1))

    def exploded_df():
        g = grouped_df()
        pair_structs = F.flatten(
            F.transform(
                F.col("_ids"),
                lambda a, i: F.transform(
                    F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                    lambda b: F.struct(a.alias("a"), b.alias("b")),
                ),
            )
        )
        return g.select(F.explode(pair_structs).alias("_p"))

    def full_df():
        return D.minhash_lsh_pairs(docs, num_perm=num_perm, bands=bands, k=k)

    results = {}
    # driver-side construction cost alone (no job)
    t = time.time()
    for _ in range(10):
        full_df()
    results["construct_full_df_ms"] = round((time.time() - t) / 10 * 1000, 1)
    print(f"{'construct only (no job)':42s} "
          f"{results['construct_full_df_ms']:8.1f} ms", flush=True)
    t = time.time()
    for _ in range(10):
        D._spread(docs)
    results["spread_call_ms"] = round((time.time() - t) / 10 * 1000, 1)
    print(f"{'_spread(docs) call (driver only)':42s} "
          f"{results['spread_call_ms']:8.1f} ms", flush=True)

    results["a_scan_only"] = med(lambda: docs.select("doc_id", "text"),
                                 "a: scan only")
    results["b_spread"] = med(lambda: D._spread(docs.select("doc_id", "text")),
                              "b: scan + spread exchange")
    results["c_sig"] = med(sig_df, "c: + mapInPandas signature kernel")
    results["d_banded"] = med(banded_df, "d: + band posexplode")
    results["e_grouped"] = med(grouped_df, "e: + bucket collect_list (exch 2)")
    results["f_exploded"] = med(exploded_df, "f: + pair explode")
    results["g_full"] = med(full_df, "g: + (a,b) count agg (exch 3) = bench")

    # one labelled run for the stage-metrics dump
    spark.sparkContext.setJobDescription("probe: x_minhash_pairs full")
    noop(full_df())
    spark.sparkContext.setJobDescription(None)

    try:
        from urllib.request import urlopen
        base = "http://localhost:4040/api/v1/applications"
        apps = json.load(urlopen(base))
        app_id = apps[0]["id"]
        stages = json.load(urlopen(f"{base}/{app_id}/stages?status=complete"))
        rows = []
        for s in stages[:24]:
            rows.append({
                "stageId": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "executorRunTime_ms": s["executorRunTime"],
                "executorCpuTime_ms": round(s["executorCpuTime"] / 1e6, 1),
                "shuffleWrite_B": s.get("shuffleWriteBytes", 0),
                "shuffleRead_B": s.get("shuffleReadBytes", 0),
                "submit_to_complete_ms": None,
            })
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                t1 = datetime.strptime(s["completionTime"], fmt)
                rows[-1]["submit_to_complete_ms"] = round(
                    (t1 - t0).total_seconds() * 1000, 1)
            except Exception:
                pass
        results["recent_stages"] = rows
        print("\nrecent stages (newest first):")
        for r in rows:
            print(f"  stage {r['stageId']:>4} tasks={r['tasks']:>3} "
                  f"run={r['executorRunTime_ms']:>6} ms "
                  f"cpu={r['executorCpuTime_ms']:>8.1f} ms "
                  f"wall={r['submit_to_complete_ms']} ms  {r['name']}")
    except Exception as exc:
        print(f"stage REST dump failed: {exc}")

    print("\n" + json.dumps({k: v for k, v in results.items()
                             if k != "recent_stages"}))
    spark.stop()


if __name__ == "__main__":
    main()
