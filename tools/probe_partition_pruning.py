"""Measure what identity-partitioned Iceberg + manifest pruning buys:
the same single-month aggregate over sf0.1 lineitem (600k rows), read
three ways from the same partitioned table (partitioned by ship month,
~83 values):

  full      read_iceberg() then .filter(month) — every data file opened
  pruned    read_iceberg(where=month)          — manifest prunes first
  files     how many data files each plan actually scans

At sf0.1 the absolute walls are floor-dominated (SCALING.md); the
load-bearing number is the SCANNED FILE RATIO, which is scale-free: at
100 TB a 1/83 partition predicate reads ~1/83rd of the files, and the
manifest pass that decides so is KB-scale driver work.  Run AFTER any
bench (never concurrently with another Spark session).

Usage: python tools/probe_partition_pruning.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prql_query_spark.engine.iceberg import (  # noqa: E402
    _latest_metadata, _prune_data_files, _walk_manifests, read_iceberg,
    write_iceberg)
from prql_query_spark.engine.session import get_spark  # noqa: E402
from prql_query_spark.engine.sources import load_parquet  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()

    src = (
        load_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
                "l_shipdate")
        .withColumn("ship_month", F.trunc(F.col("l_shipdate"), "month")))
    d = tempfile.mkdtemp(prefix="pq_probe_part_") + "/lineitem"
    write_iceberg(src, d, partition_by=["ship_month"])

    meta = json.load(open(_latest_metadata(d)))
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    dfs, _dels, parts, _bounds = _walk_manifests(snap, d)
    pred = "ship_month = DATE'1997-03-01'"
    pruned_files = _prune_data_files(spark, meta, dfs, parts, pred)

    def agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
            F.sum("l_extendedprice").alias("p")).collect()[0]

    # warm both paths once, then alternate to share any drift
    full_res = agg(read_iceberg(spark, d).filter(pred))
    pruned_res = agg(read_iceberg(spark, d, where=pred))
    assert tuple(full_res) == tuple(pruned_res), (full_res, pruned_res)

    walls: dict[str, list[float]] = {"full": [], "pruned": []}
    for _ in range(reps):
        t = time.perf_counter()
        agg(read_iceberg(spark, d).filter(pred))
        walls["full"].append(time.perf_counter() - t)
        t = time.perf_counter()
        agg(read_iceberg(spark, d, where=pred))
        walls["pruned"].append(time.perf_counter() - t)

    out = {
        "sf_dir": sf_dir,
        "rows": full_res["n"],
        "data_files_total": len(dfs),
        "data_files_pruned_scan": len(pruned_files),
        "scan_fraction": round(len(pruned_files) / len(dfs), 4),
        "wall_full_ms": round(statistics.median(walls["full"]) * 1000, 1),
        "wall_pruned_ms": round(
            statistics.median(walls["pruned"]) * 1000, 1),
        "reps": reps,
    }
    print(json.dumps(out))

    # ---- second lever: min/max bounds after a sort_by compaction ------
    from prql_query_spark.engine.iceberg import (
        _prune_by_bounds, compact_iceberg)

    d2 = tempfile.mkdtemp(prefix="pq_probe_bounds_") + "/lineitem"
    # scatter on an unrelated key so every file spans the full keyspace
    write_iceberg(src.drop("ship_month").repartition(16, "l_partkey"), d2)

    def head(dpath):
        meta = json.load(open(_latest_metadata(dpath)))
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        return (meta,) + _walk_manifests(snap, dpath)

    pred2 = "l_orderkey >= 147000"  # top ~2% of the 0..149999 keyspace
    meta2, dfs2, _dl, _pt, bounds2 = head(d2)
    before = len(_prune_by_bounds(spark, meta2, dfs2, bounds2, pred2))
    compact_iceberg(spark, d2, target_files=16, sort_by=["l_orderkey"])
    meta3, dfs3, _dl3, _pt3, bounds3 = head(d2)
    after = len(_prune_by_bounds(spark, meta3, dfs3, bounds3, pred2))

    walls2: dict[str, list[float]] = {"full": [], "skipped": []}
    for _ in range(reps):
        t = time.perf_counter()
        agg(read_iceberg(spark, d2).filter(pred2))
        walls2["full"].append(time.perf_counter() - t)
        t = time.perf_counter()
        agg(read_iceberg(spark, d2, where=pred2))
        walls2["skipped"].append(time.perf_counter() - t)

    print(json.dumps({
        "lever": "bounds_after_sort_by_compaction",
        "files_kept_unclustered": f"{before}/{len(dfs2)}",
        "files_kept_clustered": f"{after}/{len(dfs3)}",
        "wall_full_ms": round(statistics.median(walls2["full"]) * 1000, 1),
        "wall_skipped_ms": round(
            statistics.median(walls2["skipped"]) * 1000, 1),
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
