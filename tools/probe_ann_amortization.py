"""Persisted ANN (IVF-PQ) index amortization split — the dense twin of
tools/probe_bm25_amortization.py.

  build_ms  — encode the corpus (cell + PQ codes + norm) and write the
              cell-sorted parquet (paid ONCE per corpus version)
  probe_ms  — answer a 5-query batch from the persisted index with the
              literal probed-cell prefilter (per batch)
  direct_ms — cosine_topk_ivfpq with in-plan encoding, no persisted
              index (per batch)
  exact_ms  — brute-force cosine_topk (the correctness ceiling)

Crossover: the index wins over direct after
n > build / (direct - probe) query batches.  Warm interleaved medians.

Usage: python tools/probe_ann_amortization.py [sf_dir]
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

from pyspark.sql import functions as F

RUNS = 7


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.similarity import (
        cosine_topk, cosine_topk_ivfpq, ivfpq_index,
        pq_codebooks_from_anchors, probed_cells)

    spark = get_spark("pq-probe-ann")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
    anchors = [r.embedding for r in
               emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()]
    codebooks = pq_codebooks_from_anchors(anchors, m=8)
    queries = emb.filter(F.col("vec_id") < 5)

    def ex(df):
        df.write.format("noop").mode("overwrite").save()

    d = tempfile.mkdtemp(prefix="pq_ann_amort_")
    idir = os.path.join(d, "index.parquet")

    def build():
        ivfpq_index(emb, anchors, codebooks).sort("_cell") \
            .write.mode("overwrite").parquet(idir)

    def probe():
        cells = probed_cells(queries, anchors, n_probe=4)
        pruned = spark.read.parquet(idir).filter(F.col("_cell").isin(cells))
        ex(cosine_topk_ivfpq(emb, queries, k=10, n_probe=4,
                             centroids=anchors, codebooks=codebooks,
                             index=pruned))

    def direct():
        ex(cosine_topk_ivfpq(emb, queries, k=10, n_probe=4,
                             centroids=anchors, codebooks=codebooks))

    def exact():
        ex(cosine_topk(emb, queries, k=10))

    build()
    for f in (probe, direct, exact):
        f()  # warm
    samples = {"build": [], "probe": [], "direct": [], "exact": []}
    for _ in range(RUNS):
        t0 = time.time(); build(); samples["build"].append(time.time() - t0)
        t0 = time.time(); probe(); samples["probe"].append(time.time() - t0)
        t0 = time.time(); direct(); samples["direct"].append(time.time() - t0)
        t0 = time.time(); exact(); samples["exact"].append(time.time() - t0)
    shutil.rmtree(d, ignore_errors=True)

    ms = {n: round(statistics.median(v) * 1000, 1) for n, v in samples.items()}
    out = {"sf_dir": sf_dir, "runs": RUNS, **{f"{n}_ms": v for n, v in ms.items()}}
    if ms["direct"] > ms["probe"]:
        out["crossover_vs_direct"] = round(
            ms["build"] / (ms["direct"] - ms["probe"]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
