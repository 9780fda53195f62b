"""Row-level DML cost probe (round 11): what does deleting ~0.1% of a
table cost through each path, vs the pre-r11 alternative (a full
overwrite rewrite)?

Paths measured on a lineitem-sf0.1 table (600k rows, 8 data files):
  * iceberg merge-on-read:  delete_iceberg(predicate)   — scan + write
    a (file,pos) delete set; ZERO data files rewritten
  * iceberg rewrite:        write_iceberg(filtered, overwrite) — the
    only row-removal story before r11
  * delta copy-on-write:    delete_delta(predicate)     — rewrite ONLY
    files containing a match (here: all 8, keys are uniform — the
    match-localized case is probed with a range predicate too)
  * delta rewrite:          write_delta(filtered, overwrite)

Each timing is a fresh table build + one timed DML call (DML commits
mutate the table, so warm-median-over-identical-calls does not apply;
we report the median of 3 independent build+delete cycles, build
excluded).  Run AFTER any other Spark work exits (timing hygiene).

Usage: python tools/probe_dml.py [sf_dir]  -> one JSON line
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F  # noqa: F401

    from prql_query_spark.engine.deltalog import (
        delete_delta, merge_delta, read_delta_snapshot, write_delta,
    )
    from prql_query_spark.engine.iceberg import (
        delete_iceberg, merge_iceberg, read_iceberg, write_iceberg,
    )
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet

    scale = int(os.environ.get("PQ_DML_SCALE", "1"))

    spark = get_spark("pq-probe-dml")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")) \
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    src = base
    for i in range(1, scale):  # key-shifted copies: unique keys, k x rows
        src = src.unionByName(base.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)))
    src = src.repartition(8 * scale)
    src = src.localCheckpoint()  # build input once, off the parquet scan
    n_rows = src.count()

    # ~0.1% scattered across every file (uniform keys), and a
    # range predicate that localizes matches to a slice of files
    pred_scatter = "l_orderkey % 1024 = 7"
    upsert_src = src.filter("l_orderkey % 1024 = 9") \
        .withColumn("l_quantity", F.col("l_quantity") + 1)

    root = tempfile.mkdtemp(prefix="pq_dml_probe_")
    results: dict[str, float] = {}

    def timed(name, build, op, runs=3):
        samples, builds = [], []
        for i in range(runs):
            d = os.path.join(root, f"{name}_{i}")
            tb = time.time()
            build(d)
            builds.append(time.time() - tb)
            t = time.time()
            op(d)
            samples.append(time.time() - t)
        results[name] = round(statistics.median(samples) * 1000, 1)
        # the full-table write cost — the term a rewrite pays in
        # proportion to TABLE size while DML pays it only for the
        # matched slice; this is the crossover denominator
        results.setdefault(
            "full_table_write_" + name.split("_")[0],
            round(statistics.median(builds) * 1000, 1))
        print(f"probe {name}: {results[name]} ms", file=sys.stderr)

    def build_ice(d):
        write_iceberg(src, d)

    def build_dlt(d):
        write_delta(src, d)

    timed("iceberg_delete_mor", build_ice,
          lambda d: delete_iceberg(spark, d, pred_scatter))
    timed("iceberg_rewrite_overwrite", build_ice,
          lambda d: write_iceberg(
              read_iceberg(spark, d).filter(f"NOT ({pred_scatter})"),
              d, mode="overwrite"))
    timed("iceberg_merge_upsert", build_ice,
          lambda d: merge_iceberg(spark, d, upsert_src, on=["l_orderkey"]))
    timed("delta_delete_cow", build_dlt,
          lambda d: delete_delta(spark, d, pred_scatter))
    timed("delta_rewrite_overwrite", build_dlt,
          lambda d: write_delta(
              read_delta_snapshot(spark, d).filter(f"NOT ({pred_scatter})"),
              d, mode="overwrite"))
    timed("delta_merge_upsert", build_dlt,
          lambda d: merge_delta(spark, d, upsert_src, on=["l_orderkey"]))

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "dml_probe_ms", "rows": n_rows,
                      "pred": pred_scatter, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
