"""DataSource-v2 parquet reader A/B (round-6 brief item 3).

SCALING.md's job-floor table attributes q_agg's residual 2.14x (vs the
2.0x bar) to a ~70-90 ms constant parquet scan-task init inside the
DataSource-V1 reader.  The one untried lever at Spark 4.1 is the V2
path (`spark.sql.sources.useV1SourceList=""` -> BatchScan instead of
FileScan), whose scan-task setup code is different.  This probe answers
whether the floor is reader-architecture (v2 same or worse -> the
residual is irreducible without forking a reader) or v1-specific (v2
faster -> adopt it).

Protocol (the repo's timing invariants): ONE Spark session, interleaved
A/B (mode alternates within each iteration so drift hits both sides),
warm medians of N=9, full execution into the noop sink, temp views
RE-REGISTERED after each conf flip (a view captures its relation — v1
FileScan vs v2 BatchScan — at creation time, so flipping the conf alone
silently re-times the old reader; verified by plan inspection below).
Run at both layouts: primary (driver single-row-group files) and
compacted (bench.py's size-proportional multi-file copy).

Usage: python tools/probe_v2_reader.py [sf_dir]  (default sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V1_DEFAULT = "avro,csv,json,kafka,orc,parquet,text"
RUNS = 9


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entrymod
    from prql_query_spark import compile_prql
    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for, tune_splits_for_layout)
    from prql_query_spark.engine.sources import load_parquet

    spark = get_spark("pq-probe-v2")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    tune_session_for(spark, sources_bytes([sf_dir]))
    kw = entrymod._compile_kwargs(sf_dir)

    queries = {
        "q_take": "from lineitem | take 5",
        "q_agg": entrymod.PRQL_QUERIES["q_agg_q1"],
        "q_filter_derive": entrymod.PRQL_QUERIES["q_filter_derive"],
    }
    sqls = {n: compile_prql(p, "spark", **kw) for n, p in queries.items()}

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    def set_mode(mode: str, table_dirs: dict[str, str]) -> None:
        spark.conf.set("spark.sql.sources.useV1SourceList",
                       V1_DEFAULT if mode == "v1" else "")
        for t, path in table_dirs.items():
            load_parquet(spark, path).createOrReplaceTempView(t)

    def plan_mentions(sql: str, token: str) -> bool:
        df = spark.sql(sql)
        jm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple")
        return token in df._jdf.queryExecution().explainString(jm)

    def ab(table_dirs: dict[str, str]) -> dict:
        # sanity: the two modes really produce different physical scans
        set_mode("v1", table_dirs)
        assert plan_mentions(sqls["q_agg"], "FileScan")
        set_mode("v2", table_dirs)
        assert plan_mentions(sqls["q_agg"], "BatchScan")
        out = {n: {"v1": [], "v2": []} for n in sqls}
        # warm both modes once before timing
        for mode in ("v1", "v2"):
            set_mode(mode, table_dirs)
            for sql in sqls.values():
                execute(spark.sql(sql))
        for _ in range(RUNS):
            for mode in ("v1", "v2"):
                set_mode(mode, table_dirs)
                for n, sql in sqls.items():
                    t0 = time.time()
                    execute(spark.sql(sql))
                    out[n][mode].append(time.time() - t0)
        return {
            n: {m: round(statistics.median(v), 4) for m, v in d.items()}
            for n, d in out.items()
        }

    primary_dirs = {
        t: os.path.join(sf_dir, f"{t}.parquet") for t in ("lineitem", "orders")
    }
    primary = ab(primary_dirs)

    # compacted layout: bench.py's exact recipe
    from prql_query_spark.operators.layout import compact_for_parallelism

    cdir = tempfile.mkdtemp(prefix="pq_v2probe_")
    cores = spark.sparkContext.defaultParallelism
    compacted_dirs = {}
    for t, src in primary_dirs.items():
        n = max(1, min(cores, os.path.getsize(src) // (1 << 19)))
        dst = os.path.join(cdir, f"{t}.parquet")
        compact_for_parallelism(spark, src, dst, int(n))
        compacted_dirs[t] = dst
    tune_splits_for_layout(spark, list(compacted_dirs.values()))
    compacted = ab(compacted_dirs)
    shutil.rmtree(cdir, ignore_errors=True)

    print(json.dumps({"sf_dir": sf_dir, "runs": RUNS,
                      "primary": primary, "compacted": compacted}))


if __name__ == "__main__":
    main()
