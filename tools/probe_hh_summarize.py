"""Repeat-call cost of the persisted MG summary API (r10, r9 verdict
"Next round 4"): the r9 cache-leak fix made heavy_hitters' honest
fresh-call cost visible (~8.6 s at zipf 50k-vocab/30M-token scale —
every call re-pays the corpus Misra-Gries pass).  heavy_hitters_summarize
persists the compacted summary once; heavy_hitters_serve then answers
any coarser phi at VERIFY-ONLY cost (one broadcast-filtered exact
recount; the MG mapInPandas pass never re-runs).

Measures, interleaved warm medians on the same zipf corpus
probe_heavy_hitters.py uses:

  fresh_ms      — heavy_hitters() per call (pays MG + verify)
  summarize_ms  — one-time heavy_hitters_summarize() (pays MG + write)
  serve_ms      — heavy_hitters_serve() per call (verify only)
  naive_ms      — GROUP BY + HAVING reference (full-vocab exchange)

Output identity (serve == fresh == naive) is asserted every run.

Usage: python tools/probe_hh_summarize.py [--docs N]
       (default 500_000; PQ_PROBE_RUNS=5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "5"))


def _time(fn):
    t0 = time.perf_counter()
    fn()
    return (time.perf_counter() - t0) * 1000


def main():
    docs_n = 500_000
    for i, a in enumerate(sys.argv):
        if a == "--docs":
            docs_n = int(sys.argv[i + 1])
    from prql_query_spark.engine.session import get_spark

    spark = get_spark()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_bm25_dfcap import _zipf_docs
    from probe_heavy_hitters import _naive

    from prql_query_spark.operators.analytics import (
        heavy_hitters, heavy_hitters_serve, heavy_hitters_summarize)

    items = _zipf_docs(spark, docs_n).select(
        F.explode(F.split(F.col("text"), " ")).alias("term"))
    num, den = 1, 100
    side = os.path.join(tempfile.mkdtemp(prefix="pq_hh_mg_"), "mg")

    t_summ = _time(lambda: heavy_hitters_summarize(
        items, "term", capacity=den, path=side))
    key = lambda df: {(r["term"], r["cnt"], r["n_total"])  # noqa: E731
                      for r in df.collect()}
    want = key(heavy_hitters(items, "term", num, den))
    assert key(heavy_hitters_serve(items, "term", side, num, den)) == want
    nv = key(_naive(items, num, den).select(
        "term", "cnt", "n_total"))
    assert nv == want, "naive twin disagrees"

    t_fresh, t_serve, t_naive = [], [], []
    for _ in range(RUNS):
        t_fresh.append(_time(lambda: heavy_hitters(
            items, "term", num, den).count()))
        t_serve.append(_time(lambda: heavy_hitters_serve(
            items, "term", side, num, den).count()))
        t_naive.append(_time(lambda: _naive(items, num, den).count()))

    out = {
        "docs": docs_n, "runs": RUNS, "phi": f"{num}/{den}",
        "summarize_once_ms": round(t_summ, 1),
        "fresh_ms": round(statistics.median(t_fresh), 1),
        "serve_ms": round(statistics.median(t_serve), 1),
        "naive_ms": round(statistics.median(t_naive), 1),
        "n_heavy": len(want),
        "sidecar_rows": spark.read.parquet(side).count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
