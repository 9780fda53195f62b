"""Per-piece decomposition of x_minhash_pairs (r11 verdict item 1).

The bench query is minhash_lsh_pairs: scan -> _spread -> Arrow signature
kernel -> banding posexplode -> (band,bucket) collect_list agg ->
pair explode -> (a,b) count agg.  Kernel proven ~0.22 s single-thread;
wall flat at ~1.27 s for three rounds.  This probe times PREFIXES of the
plan into the noop sink (guide §1.4), interleaved, so the increments
attribute the wall to pieces.

Usage: python tools/probe_minhash_pairs.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from pyspark.sql import functions as F

    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for)
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators import dedup as D

    spark = get_spark("probe-minhash-pairs")
    spark.sparkContext.setLogLevel("ERROR")
    tune_session_for(spark, sources_bytes([sf_dir]))

    docs_path = os.path.join(sf_dir, "documents.parquet")

    def docs():
        return load_parquet(spark, docs_path)

    def p0_scan_spread():
        return D._spread(docs().select("doc_id", "text"))

    def p1_signatures():
        return D.minhash_signatures(docs(), "doc_id", "text", 64, 5)

    def p2_banded():
        return D._banded_from_sig(p1_signatures(), 64, 16)

    def p3_buckets():
        banded = p2_banded()
        ids = F.slice(F.sort_array(F.collect_list("_id")), 1, 1000)
        return (banded.groupBy("_band", "_bucket").agg(ids.alias("_ids"))
                .filter(F.size("_ids") > 1))

    def p4_full():
        return D.minhash_lsh_pairs(docs(), num_perm=64, bands=16, k=5)

    pieces = [
        ("p0_scan_spread", p0_scan_spread),
        ("p1_signatures", p1_signatures),
        ("p2_banded", p2_banded),
        ("p3_buckets", p3_buckets),
        ("p4_full", p4_full),
    ]

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    for name, mk in pieces:
        execute(mk())
    samples: dict[str, list[float]] = {n: [] for n, _ in pieces}
    for r in range(reps):
        for name, mk in pieces:
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t = time.time()
            execute(mk())
            samples[name].append(time.time() - t)
    spark.sparkContext.setJobDescription(None)
    print(f"load: {open('/proc/loadavg').read().strip()}")
    prev = 0.0
    for name, _ in pieces:
        med = statistics.median(samples[name])
        print(f"{name}: {med*1000:.1f} ms  (+{(med-prev)*1000:.1f})  "
              f"all={[round(s*1000) for s in samples[name]]}")
        prev = med
    spark.stop()


if __name__ == "__main__":
    main()
