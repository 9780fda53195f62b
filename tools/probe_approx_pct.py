"""Decompose q_approx_percentile's production-path ratio (round-8
VERDICT item 6, mirroring how q_agg's 2.15x was closed): the r7 split
measured `approx_percentile` ALONE (the GK sketch, the 100 TB path) at
744 ms vs DuckDB 122.7 ms at sf0.1 — 6.1x.  How much of the 744 ms is
the constant job floor, how much is sketch-update compute, and does the
per-byte SLOPE (the term a cluster divides) hold at sf1?

Protocol (profile_floor's subtraction + probe_sf1_extras' slope):
- control_ms: same scan, trivial aggregate (COUNT of the same column)
  — isolates scan+job floor from aggregate work.
- gk_ms:      approx_percentile(col, [0.5, 0.95], 10000) — default
  accuracy, the bench configuration.
- gk_lo_ms:   accuracy 1000 — the one measured improvement attempt the
  verdict asks for (GK update cost scales with the summary size).
- exactagg_ms: Spark PERCENTILE aggregate (context row).
Interleaved warm medians at sf0.1 AND sf1; DuckDB approx_quantile and
its own COUNT control measured same-run for the denominators.

Usage: python tools/probe_approx_pct.py [sf0.1_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "7"))


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"

    import duckdb

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet

    spark = get_spark("pq-probe-approx-pct")
    spark.sparkContext.setLogLevel("ERROR")

    def ex(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"runs": RUNS, "tiers": {}}
    for tier, d in (("sf0.1", sf01), ("sf1", sf1)):
        li = load_parquet(spark, os.path.join(d, "lineitem.parquet"))
        li.createOrReplaceTempView("li_pct_probe")
        nrows = li.count()
        con = duckdb.connect()
        glob = os.path.join(d, "lineitem.parquet")
        if os.path.isdir(glob):
            glob = os.path.join(glob, "*.parquet")
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{glob}')")

        variants = {
            "control": "SELECT COUNT(l_extendedprice) AS c "
                       "FROM li_pct_probe",
            "gk": "SELECT approx_percentile(l_extendedprice, "
                  "array(0.5D, 0.95D), 10000) AS p FROM li_pct_probe",
            "gk_lo": "SELECT approx_percentile(l_extendedprice, "
                     "array(0.5D, 0.95D), 1000) AS p FROM li_pct_probe",
            "exactagg": "SELECT percentile(l_extendedprice, "
                        "array(0.5D, 0.95D)) AS p FROM li_pct_probe",
        }
        duck = {
            "control": "SELECT COUNT(l_extendedprice) FROM lineitem",
            "gk": "SELECT approx_quantile(l_extendedprice, 0.5), "
                  "approx_quantile(l_extendedprice, 0.95) FROM lineitem",
        }
        for sql in variants.values():
            ex(spark.sql(sql))  # warm
        for sql in duck.values():
            con.execute(sql).fetchall()
        samples: dict[str, list[float]] = {k: [] for k in variants}
        dsamples: dict[str, list[float]] = {k: [] for k in duck}
        for _ in range(RUNS):
            for k, sql in variants.items():
                t0 = time.time()
                ex(spark.sql(sql))
                samples[k].append(time.time() - t0)
            for k, sql in duck.items():
                t0 = time.time()
                con.execute(sql).fetchall()
                dsamples[k].append(time.time() - t0)
        med = lambda v: round(statistics.median(v) * 1000, 1)  # noqa: E731
        out["tiers"][tier] = {
            "rows": nrows,
            **{f"spark_{k}_ms": med(v) for k, v in samples.items()},
            **{f"duckdb_{k}_ms": med(v) for k, v in dsamples.items()},
        }
        t = out["tiers"][tier]
        t["spark_sketch_work_ms"] = round(
            t["spark_gk_ms"] - t["spark_control_ms"], 1)
        t["duckdb_sketch_work_ms"] = round(
            t["duckdb_gk_ms"] - t["duckdb_control_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
