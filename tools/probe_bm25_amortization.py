"""BM25 index amortization split (round-6 brief item 6).

The x_bm25_index head-to-head row carried a footnote ("the build
amortizes over every query") instead of numbers.  This probe splits the
row into its three phases and computes the crossover:

  build_ms  — tokenize corpus, aggregate postings, write term-sorted
              parquet + 1-row stats (paid ONCE per corpus version)
  probe_ms  — answer one query from the persisted index (per query)
  direct_ms — bm25_topk straight off the corpus, no index (per query)
  duck_ms   — the identical-formula DuckDB twin (per query, same-run)

Index wins over direct Spark after  n > build / (direct - probe)
queries; vs the DuckDB oracle after n > build / (duck - probe) (only
meaningful while probe < duck).  Warm medians, one session, interleaved
probe/direct so drift hits both sides.

Usage: python tools/probe_bm25_amortization.py [sf_dir]
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

RUNS = 7
QUERY = "data quality and the best model"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    import __spark_entry__ as entrymod
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.operators.retrieval import (
        bm25_topk, bm25_topk_oracle_sql, build_bm25_index, probe_bm25_index)

    spark = get_spark("pq-probe-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    docs = entrymod._tbl(spark, sf_dir, "documents")

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    d = tempfile.mkdtemp(prefix="pq_bm25_amort_")
    p_dir, s_dir = os.path.join(d, "postings"), os.path.join(d, "stats")

    def build() -> None:
        postings, stats = build_bm25_index(docs)
        postings.sort("term").write.mode("overwrite").parquet(p_dir)
        stats.write.mode("overwrite").parquet(s_dir)

    # warm everything once (plan compilation, page cache)
    build()
    postings, stats = spark.read.parquet(p_dir), spark.read.parquet(s_dir)
    execute(probe_bm25_index(postings, stats, QUERY, k=20))
    execute(bm25_topk(docs, QUERY, k=20))

    builds, probes, directs = [], [], []
    for _ in range(RUNS):
        t0 = time.time()
        build()
        builds.append(time.time() - t0)
        postings = spark.read.parquet(p_dir)
        stats = spark.read.parquet(s_dir)
        t0 = time.time()
        execute(probe_bm25_index(postings, stats, QUERY, k=20))
        probes.append(time.time() - t0)
        t0 = time.time()
        execute(bm25_topk(docs, QUERY, k=20))
        directs.append(time.time() - t0)
    shutil.rmtree(d, ignore_errors=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    sql = bm25_topk_oracle_sql(QUERY, k=20)
    con.execute(sql).fetchall()  # warm
    ducks = []
    for _ in range(RUNS):
        t0 = time.time()
        con.execute(sql).fetchall()
        ducks.append(time.time() - t0)
    con.close()

    build_ms = round(statistics.median(builds) * 1000, 1)
    probe_ms = round(statistics.median(probes) * 1000, 1)
    direct_ms = round(statistics.median(directs) * 1000, 1)
    duck_ms = round(statistics.median(ducks) * 1000, 1)
    out = {
        "sf_dir": sf_dir, "runs": RUNS,
        "build_ms": build_ms, "probe_ms": probe_ms,
        "direct_ms": direct_ms, "duckdb_direct_ms": duck_ms,
        "crossover_vs_spark_direct": (
            round(build_ms / (direct_ms - probe_ms), 1)
            if direct_ms > probe_ms else None),
        "crossover_vs_duckdb": (
            round(build_ms / (duck_ms - probe_ms), 1)
            if duck_ms > probe_ms else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
