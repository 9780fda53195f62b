"""Per-microbatch cost of the streaming monitoring-AUC maintainer
(stream_auc_histograms): the docstring claims FLAT per-batch cost (one
bucket-assign + tiny aggregate over the batch's own rows, earlier
batches never re-read) and a sidecar that grows by <= len(cuts)+1 rows
per batch.  This measures both from the StreamingQuery progress events
over 5 equal batches of a deterministic hash-derived score stream,
plus the serve-time cost (auc_from_histograms over the sidecar — never
touches the scores) against the one-pass roc_auc_bucketed and the
exact rank-window roc_auc on the accumulated rows.

Usage: python tools/probe_stream_auc.py [--rows N] [--buckets B]
       (defaults 6_000_000 rows -> 5 batches of 1.2M, 100 cuts)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_BATCHES = 5


def _batch_durations(q) -> list[tuple[int, int]]:
    out = []
    for p in q.recentProgress:
        if p is None:
            continue
        d = p if isinstance(p, dict) else json.loads(p.json)
        if d.get("numInputRows", 0) > 0:
            out.append((int(d["batchId"]),
                        int(d["durationMs"]["triggerExecution"])))
    return sorted(out)


def main():
    n_rows, buckets = 6_000_000, 100
    for i, a in enumerate(sys.argv):
        if a == "--rows":
            n_rows = int(sys.argv[i + 1])
        if a == "--buckets":
            buckets = int(sys.argv[i + 1])

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.operators.analytics import (
        auc_from_histograms, roc_auc, roc_auc_bucketed)
    from prql_query_spark.streaming.ingest import stream_auc_histograms

    spark = get_spark("pq-probe-streamauc")
    spark.sparkContext.setLogLevel("ERROR")

    cuts = [i / buckets for i in range(1, buckets)]

    root = tempfile.mkdtemp(prefix="pq_probe_streamauc_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    per = n_rows // N_BATCHES
    # N_BATCHES files with pinned increasing mtimes (batch order)
    for b in range(N_BATCHES):
        stage = os.path.join(root, f"stage{b}")
        part = (
            spark.range(b * per, (b + 1) * per).repartition(8)
            .select(
                (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000))
                 / 1_000_000.0).alias("_u1"),
                (F.pmod(F.xxhash64(F.col("id") + 7_777_777),
                        F.lit(1_000_000)) / 1_000_000.0).alias("_u2"))
            .select(
                (F.col("_u2") < 0.3).alias("y"),
                F.least(
                    F.lit(1.0),
                    F.col("_u1")
                    + F.when(F.col("_u2") < 0.3, 0.25).otherwise(0.0)
                ).alias("score"))
        )
        part.coalesce(4).write.mode("overwrite").parquet(stage)
        dst = os.path.join(src, f"b{b}")
        shutil.move(stage, dst)
        ts = 1_000_000_000 + b
        for f in os.listdir(dst):
            os.utime(os.path.join(dst, f), (ts, ts))
        os.utime(dst, (ts, ts))

    hist = os.path.join(root, "hist")
    q = stream_auc_histograms(
        spark, src + "/*", hist, checkpoint=os.path.join(root, "ck"),
        cuts=cuts, max_files_per_trigger=4, queryName="pq_probe_sauc")
    try:
        q.processAllAvailable()
        if q.exception() is not None:
            raise q.exception()
        batches = _batch_durations(q)
    finally:
        q.stop()

    sidecar = spark.read.parquet(hist)
    sidecar_rows = sidecar.count()

    t0 = time.time()
    served = auc_from_histograms(sidecar).first()
    serve_ms = round((time.time() - t0) * 1000, 1)

    all_rows = spark.read.parquet(src + "/*")
    t0 = time.time()
    one_pass = roc_auc_bucketed(all_rows, "score", "y", cuts=cuts).first()
    onepass_ms = round((time.time() - t0) * 1000, 1)
    t0 = time.time()
    exact = roc_auc(all_rows, "score", "y").first()
    exact_ms = round((time.time() - t0) * 1000, 1)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "n_rows": n_rows, "buckets": buckets, "n_batches": N_BATCHES,
        "batch_trigger_ms": [ms for _, ms in batches],
        "sidecar_rows": sidecar_rows,
        "serve_ms": serve_ms,
        "served_auc": served["auc"],
        "one_pass_ms": onepass_ms,
        "one_pass_auc": one_pass["auc"],
        "stream_equals_one_pass": served.asDict() == one_pass.asDict(),
        "exact_ms": exact_ms, "exact_auc": exact["auc"],
        "abs_diff_vs_exact": round(abs(served["auc"] - exact["auc"]), 6),
        "err_bound": served["err_bound"],
        "bound_holds": abs(served["auc"] - exact["auc"])
        <= served["err_bound"] + 1e-9,
    }))


if __name__ == "__main__":
    main()
