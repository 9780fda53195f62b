"""Per-microbatch cost of the streaming frequent-terms maintainer
(stream_heavy_hitter_summaries) on the Zipfian scratch corpus: the
docstring claims FLAT per-batch cost (one MG pass over the batch's own
tokens, earlier batches never re-read) — this measures it from the
StreamingQuery progress events over 5 equal batches, plus the
query-time cost of the serving verify pass (one candidate-filtered
aggregate over the accumulated corpus) and its exactness against the
inline heavy_hitters row.

Usage: python tools/probe_stream_hh.py [--docs N]
       (default 500_000 zipf docs -> 5 batches of 100k)
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
PHI = (1, 100)


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
    docs_n = 500_000
    for i, a in enumerate(sys.argv):
        if a == "--docs":
            docs_n = int(sys.argv[i + 1])

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.operators.analytics import (
        heavy_hitters, heavy_hitters_verify)
    from prql_query_spark.streaming.ingest import (
        split_mtime_ordered_batches, stream_heavy_hitter_summaries)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_bm25_dfcap import _zipf_docs

    spark = get_spark()
    docs = _zipf_docs(spark, docs_n)
    root = tempfile.mkdtemp(prefix="pq_probe_streamhh_")
    try:
        src = os.path.join(root, "src")
        split_mtime_ordered_batches(docs, src, N_BATCHES)
        sums = os.path.join(root, "sums")
        q = stream_heavy_hitter_summaries(
            spark, src, sums, checkpoint=os.path.join(root, "ck"),
            phi_num=PHI[0], phi_den=PHI[1], max_files_per_trigger=1,
            queryName="pq_probe_stream_hh")
        try:
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
            batches = _batch_durations(q)
        finally:
            q.stop()

        items = docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("_item")) \
            .filter(F.col("_item").isNotNull())
        summary = spark.read.parquet(sums)
        t0 = time.perf_counter()
        got = {(r["_item"], r["cnt"])
               for r in heavy_hitters_verify(
                   items, summary, *PHI).collect()}
        verify_ms = round((time.perf_counter() - t0) * 1000, 1)
        want = {(r["term"], r["cnt"])
                for r in heavy_hitters(
                    items.withColumnRenamed("_item", "term"),
                    "term", *PHI).collect()}
        assert got == want, "streamed+verify != inline heavy_hitters"
        print(json.dumps({
            "docs": docs_n, "n_batches": N_BATCHES,
            "per_batch_ms": [ms for _, ms in batches],
            "summary_rows": summary.count(),
            "serving_verify_ms": verify_ms,
            "n_heavy": len(got),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
