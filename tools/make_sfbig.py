"""Generate an sf1-scale copy of the driver fixtures by key-shifted
replication, so the SCALING sweep can MEASURE the projected crossovers
instead of extrapolating them.

The driver ships sf0.001/0.01/0.1 only (read-only).  This writes
.scratch/sf1/: lineitem/orders/documents replicated `factor`× with
shifted keys (foreign keys stay consistent — l_orderkey and o_orderkey
shift together; o_custkey references the unchanged sf0.1 customer dim,
exactly how a fact table outgrows its dimensions in a real warehouse),
laid out MULTI-FILE (32 parts) like any real table, so both engines get
a splittable scan.  Dimension tables are copied as-is.

Replication is the honest scale-up for TIMING (10× the bytes, 10× the
rows through every operator); it is NOT a statistical scale-up — dedup-
style queries see a 90% duplicate corpus.  The sweep reports wall time,
not result quality, so that is fine (and called out in SCALING.md).

Usage: python tools/make_sfbig.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
KEYED = {
    # table -> columns shifted by i * SHIFT per replica
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
}
SHIFT = 100_000_000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1")
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet

    spark = get_spark("make-sfbig")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "embeddings"):
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copy(src, dst)

    for t, keys in KEYED.items():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"{t}: exists, skipping", file=sys.stderr)
            continue
        base = load_parquet(spark, os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for i in range(factor):
            rep = base
            for kcol in keys:
                rep = rep.withColumn(kcol, F.col(kcol) + F.lit(i * SHIFT))
            parts.append(rep)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(dst)
        n = load_parquet(spark, dst).count()
        print(f"{t}: {n} rows -> {dst}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
