"""Decompose the warm per-query job floor (VERDICT r4 item 2 / r3 item 8).

The BENCH rounds show q_take (a warm `LIMIT 5`) at 52-166 ms while DuckDB
does the same in ~3 ms — a pure size-independent floor (SCALING.md fits
slope 0).  This tool names the terms instead of re-measuring around them:

  * driver phases, wall-clocked around the py4j calls:
      parse+analyze (spark.sql), optimize (qe.optimizedPlan),
      physical planning (qe.executedPlan)
  * JVM job anatomy, from the Spark event log (the ground truth the UI
    renders): submit->launch scheduler delay, task deserialize, task run,
    result serialization, job-end bookkeeping
  * python-side residue: exec wall minus JVM job wall = py4j round trips
    + write-command re-planning + commit protocol

Run:  python tools/profile_floor.py [sf_dir] [iters]
Writes a human table to stdout; update SCALING.md §"Job floor" from it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(xs):
    return round(statistics.median(xs), 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    evdir = tempfile.mkdtemp(prefix="pq_eventlog_")
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet

    spark = get_spark("pq-floor", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    load_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")) \
        .createOrReplaceTempView("lineitem")
    sql = "SELECT * FROM lineitem LIMIT 5"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for _ in range(3):  # warm codegen/JIT/footer caches
        noop(spark.sql(sql))

    phases = {"parse_analyze": [], "optimize": [], "plan": [],
              "exec_noop": [], "exec_collect": []}
    windows = []  # (start_ms, end_ms) of each noop exec
    for _ in range(iters):
        t0 = time.time()
        df = spark.sql(sql)                      # parse + analyze
        t1 = time.time()
        qe = df._jdf.queryExecution()
        qe.optimizedPlan()                       # optimizer
        t2 = time.time()
        qe.executedPlan()                        # physical planning
        t3 = time.time()
        noop(df)                                 # full execution
        t4 = time.time()
        spark.sql(sql).collect()                 # protocol A/B
        t5 = time.time()
        phases["parse_analyze"].append((t1 - t0) * 1000)
        phases["optimize"].append((t2 - t1) * 1000)
        phases["plan"].append((t3 - t2) * 1000)
        phases["exec_noop"].append((t4 - t3) * 1000)
        phases["exec_collect"].append((t5 - t4) * 1000)
        windows.append((t3 * 1000, t4 * 1000))

    spark.stop()  # flushes the event log

    # ---- event-log anatomy of the noop exec windows ----
    jobs: dict[int, dict] = {}
    tasks = []
    logf = [os.path.join(evdir, f) for f in os.listdir(evdir)
            if not f.startswith(".")][0]
    if os.path.isdir(logf):  # Spark 4 rolling event-log dir (eventlog_v2_*)
        parts = sorted(os.path.join(logf, f) for f in os.listdir(logf)
                       if "events" in f)
        lines = (ln for p in parts for ln in open(p))
    else:
        lines = open(logf)
    for line in lines:
        ev = json.loads(line)
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {"start": ev["Submission Time"]}
        elif k == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif k == "SparkListenerTaskEnd":
            ti = ev["Task Info"]
            tm = ev.get("Task Metrics") or {}
            tasks.append({
                "launch": ti["Launch Time"], "finish": ti["Finish Time"],
                "deser": tm.get("Executor Deserialize Time", 0),
                "run": tm.get("Executor Run Time", 0),
                "result_ser": tm.get("Result Serialization Time", 0),
                "gc": tm.get("JVM GC Time", 0),
            })

    anatomy = {"pre_job_py4j": [], "job_wall": [], "post_job_py4j": [],
               "sched_submit_to_launch": [], "task_deser": [],
               "task_run": [], "task_result_ser": [], "task_gc": [],
               "finish_to_jobend": [], "n_jobs": [], "n_tasks": []}
    for (w0, w1) in windows:
        js = [j for j in jobs.values()
              if j.get("start", 0) >= w0 - 2 and j.get("end", w1) <= w1 + 2]
        if not js:
            continue
        ts = [t for t in tasks if t["launch"] >= w0 - 2 and t["finish"] <= w1 + 2]
        j0 = min(j["start"] for j in js)
        j1 = max(j["end"] for j in js)
        anatomy["pre_job_py4j"].append(j0 - w0)
        anatomy["job_wall"].append(j1 - j0)
        anatomy["post_job_py4j"].append(w1 - j1)
        anatomy["n_jobs"].append(len(js))
        anatomy["n_tasks"].append(len(ts))
        if ts:
            first_launch = min(t["launch"] for t in ts)
            last_finish = max(t["finish"] for t in ts)
            anatomy["sched_submit_to_launch"].append(first_launch - j0)
            anatomy["task_deser"].append(sum(t["deser"] for t in ts))
            anatomy["task_run"].append(sum(t["run"] for t in ts))
            anatomy["task_result_ser"].append(
                sum(t["result_ser"] for t in ts))
            anatomy["task_gc"].append(sum(t["gc"] for t in ts))
            anatomy["finish_to_jobend"].append(j1 - last_finish)

    print(f"\n== driver phases (ms, median of {iters}) ==")
    for k, v in phases.items():
        print(f"  {k:22s} {med(v):8.1f}")
    print("\n== noop-exec anatomy from event log (ms, median) ==")
    for k, v in anatomy.items():
        if v:
            print(f"  {k:24s} {med(v):8.1f}")
    total = med(phases["exec_noop"])
    jw = med(anatomy["job_wall"]) if anatomy["job_wall"] else 0
    print(f"\n  exec_noop total {total} = pre_job "
          f"{med(anatomy['pre_job_py4j'])} + job {jw} + post_job "
          f"{med(anatomy['post_job_py4j'])}")
    print(f"  (event log: {logf})")


if __name__ == "__main__":
    main()
