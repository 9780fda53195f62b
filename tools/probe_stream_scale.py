"""Scale posture of the two streaming index maintainers at sf1
(50k-doc replica, tools/make_sfbig.py): per-microbatch wall time over 5
equal batches, read from the StreamingQuery progress events.

The contrast this measures is the one their docstrings claim:

- `stream_bm25_index` is PURE APPEND (postings carry no df, stats are
  mergeable moments) — per-batch cost should stay FLAT as the index
  grows.
- `stream_dedup_growing` re-indexes the accepted-so-far corpus every
  batch (bounded by accepted volume, not ingest volume — the documented
  harness-scale shape; at warehouse scale you persist the MinHash index
  incrementally instead) — per-batch cost should GROW with the accepted
  set, and on the 90%-duplicate sf1 replica the accepted set stays
  near one replica's size, so the growth should flatten after batch 0.
- `stream_dedup_indexed` (round 8) IS that warehouse-scale shape: the
  accepted set's MinHash index and exact-hash set persist as append-only
  sidecars, so per-batch signature work is batch-sized and the growth
  term drops to columnar index/text scans — per-batch cost should sit
  FLAT(TER) below the growing variant's, with identical survivors.

Usage: python tools/probe_stream_scale.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

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


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1")

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.streaming.ingest import (
        stream_bm25_index, stream_dedup_growing)

    spark = get_spark("pq-probe-stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, os.path.join(sf1, "documents.parquet")) \
        .select("doc_id", "text")
    n_docs = docs.count()

    from prql_query_spark.streaming.ingest import (
        split_mtime_ordered_batches)

    root = tempfile.mkdtemp(prefix="pq_stream_scale_")
    src = os.path.join(root, "src")
    split_mtime_ordered_batches(docs, src, N_BATCHES)

    out: dict = {"sf1_dir": sf1, "n_docs": n_docs, "n_batches": N_BATCHES}

    q = stream_bm25_index(
        spark, src, os.path.join(root, "bm25_idx"),
        checkpoint=os.path.join(root, "ck_bm25"),
        queryName="probe_bm25_scale", max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        out["bm25_batch_ms"] = _batch_durations(q)
    finally:
        q.stop()

    q = stream_dedup_growing(
        spark, src, os.path.join(root, "dedup_out"),
        checkpoint=os.path.join(root, "ck_dedup"),
        threshold=0.8, queryName="probe_dedup_scale",
        max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        out["dedup_batch_ms"] = _batch_durations(q)
    finally:
        q.stop()
    out["dedup_survivors"] = spark.read.parquet(
        os.path.join(root, "dedup_out")).count()

    from prql_query_spark.streaming.ingest import stream_dedup_indexed

    q = stream_dedup_indexed(
        spark, src, os.path.join(root, "dedup_idx_out"),
        index_dir=os.path.join(root, "dedup_idx"),
        checkpoint=os.path.join(root, "ck_dedup_idx"),
        threshold=0.8, queryName="probe_dedup_idx_scale",
        max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        out["dedup_indexed_batch_ms"] = _batch_durations(q)
    finally:
        q.stop()
    out["dedup_indexed_survivors"] = spark.read.parquet(
        os.path.join(root, "dedup_idx_out")).count()

    # Second regime: a LOW-DUPLICATE stream (texts made unique by
    # suffixing the doc id), where the accepted set grows ~linearly
    # with ingest.  This is the regime the persisted index exists for:
    # the growing variant re-runs the MinHash kernel over ALL accepted
    # text each batch (work ∝ total ingested), the indexed variant's
    # kernel work stays batch-sized.  The 90%-dup replica above cannot
    # show this — its accepted set plateaus at ~10% of one batch's
    # volume, so both variants are dominated by the shared in-batch
    # self-dedup.
    # hash-derived token soup per doc (~300 chars, like the fixture's
    # docs): a plain suffix is NOT enough — the sf1 replicas stay at
    # shingle-Jaccard >= 0.8 and still collapse (measured: 4769
    # survivors of 50k)
    uniq = docs.select(
        "doc_id",
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(15)),
            lambda i: F.abs(
                F.xxhash64(F.col("doc_id") * 1000 + i)).cast("string"),
        )).alias("text"))
    src_u = os.path.join(root, "src_u")
    split_mtime_ordered_batches(uniq, src_u, N_BATCHES)

    q = stream_dedup_growing(
        spark, src_u, os.path.join(root, "u_grow_out"),
        checkpoint=os.path.join(root, "ck_u_grow"),
        threshold=0.8, queryName="probe_u_grow",
        max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        out["uniq_growing_batch_ms"] = _batch_durations(q)
    finally:
        q.stop()
    out["uniq_growing_survivors"] = spark.read.parquet(
        os.path.join(root, "u_grow_out")).count()

    q = stream_dedup_indexed(
        spark, src_u, os.path.join(root, "u_idx_out"),
        index_dir=os.path.join(root, "u_idx"),
        checkpoint=os.path.join(root, "ck_u_idx"),
        threshold=0.8, queryName="probe_u_idx",
        max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        out["uniq_indexed_batch_ms"] = _batch_durations(q)
    finally:
        q.stop()
    out["uniq_indexed_survivors"] = spark.read.parquet(
        os.path.join(root, "u_idx_out")).count()

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
