"""Round-12 zstd shuffle-codec A/B (r11 verdict item 9) on the 10x
replica, where shuffles exceed KB-scale.

spark.io.compression.codec is captured at SparkEnv creation, so the A/B
alternates SESSIONS (lz4, zstd, lz4, zstd, ...) instead of in-session
modes; each session reports its empty-job calibration floor so drift is
visible.  Queries: the two most shuffle-byte-heavy documents ops at 10x
(x_dedup_exact shuffles the whole corpus through one window exchange;
minhash_lsh_pairs moves the banded + pair tables).

Usage: python tools/probe_zstd.py [sf1_dir] [sessions_per_codec]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "5"))


def one_session(codec: str, sf1: str) -> dict:
    from prql_query_spark.engine.session import (
        get_spark, sources_bytes, tune_session_for)
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.dedup import dedup_exact, minhash_lsh_pairs

    spark = get_spark(f"pq-zstd-{codec}",
                      extra_conf={"spark.io.compression.codec": codec})
    spark.sparkContext.setLogLevel("ERROR")
    tune_session_for(spark, sources_bytes([sf1]))
    docs = load_parquet(spark, os.path.join(sf1, "documents.parquet"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def med(make):
        noop(make()); noop(make())
        s = []
        for _ in range(RUNS):
            t = time.time(); noop(make()); s.append(time.time() - t)
        return round(statistics.median(s) * 1000, 1)

    floor = med(lambda: spark.range(1000))
    res = {
        "codec": codec,
        "floor_ms": floor,
        "dedup_exact_ms": med(
            lambda: dedup_exact(docs, ["text"], "doc_id")),
        "minhash_pairs_ms": med(
            lambda: minhash_lsh_pairs(docs, num_perm=64, bands=16, k=5)),
    }
    spark.stop()
    return res


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if os.environ.get("PQ_ZSTD_CHILD"):
        print(json.dumps(one_session(os.environ["PQ_ZSTD_CHILD"], sf1)))
        return
    import subprocess
    rows = []
    order = ["lz4", "zstd"] * per
    for codec in order:
        env = dict(os.environ, PQ_ZSTD_CHILD=codec)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf1],
            env=env, capture_output=True, text=True, check=True)
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(rows[-1], flush=True)
    agg: dict = {}
    for codec in ("lz4", "zstd"):
        rs = [r for r in rows if r["codec"] == codec]
        for k in ("floor_ms", "dedup_exact_ms", "minhash_pairs_ms"):
            agg[f"{codec}_{k}"] = round(
                statistics.median([r[k] for r in rs]), 1)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
