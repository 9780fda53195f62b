"""Composed serving crossover (round-6 VERDICT item 4): head-to-head
`hybrid_topk_indexed` (both branches from PERSISTED indexes) vs
`hybrid_topk` (direct recompute) at the 10x probe corpus — 50k documents
x 20k 64-float vectors (`.scratch/sf1`, tools/make_sfbig.py), the scale
where IVF already beats brute force 2.2x (BASELINE.md §4.7 note).

Mirrors the per-family amortization probes (probe_bm25_amortization.py /
probe_ann_amortization.py) but for the COMPOSED stack:

  build_ms  — BM25 postings (term-sorted) + stats + IVF-PQ cell-sorted
              index, written to parquet (paid ONCE per corpus version)
  probe_ms  — one hybrid query answered entirely from the two persisted
              indexes (term-IN + cell-IN pruned scans, zero corpus scan)
  direct_ms — the same hybrid query via hybrid_topk: full corpus
              tokenize + brute-force cosine per query

Crossover: the composed indexed path wins after
n > build / (direct - probe) queries.  Warm interleaved medians.

Usage: python tools/probe_hybrid_composed.py [sf_dir]
       python tools/probe_hybrid_composed.py --factor N
         (key-shifted N x replica of sf0.1 docs+embeddings under
          .scratch/hyb{N}/ — locate the crossover in CORPUS SIZE: the
          probe's candidate sets grow with the matching posting lists /
          probed cells only, the direct path with the whole corpus)
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

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "7"))
# Override to probe query-dependence: the default gate query carries
# stopword-grade terms ("and", "the") whose posting lists are
# corpus-sized, so the BM25-probe side of the stack scales with the
# corpus for it — a content-terms-only query isolates the index's
# intended df-bounded regime (BASELINE.md §4.4e).
QUERY = os.environ.get("PQ_PROBE_QUERY", "data quality and the best model")
# When set (a fraction, e.g. "0.5"), ALSO measure the df-capped serving
# probe (round 8): stopword-grade terms are dropped before the posting
# scan via the term_stats sidecar, the fix for the losing regime above.
DFCAP = os.environ.get("PQ_PROBE_DFCAP")
K, DEPTH, N_PROBE = 15, 25, 4


def _replica(spark, factor: int) -> str:
    """Key-shifted factor-x replica of sf0.1 documents+embeddings (the
    make_sfbig recipe; honest for TIMING, 90%+ duplicate corpus)."""
    from prql_query_spark.engine.sources import load_parquet

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, ".scratch", f"hyb{factor}")
    for t, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = load_parquet(
            spark, os.path.join("/root/testdata/sf0.1", f"{t}.parquet"))
        parts = [base.withColumn(key, F.col(key) + F.lit(i * 100_000_000))
                 for i in range(factor)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.retrieval import (
        build_bm25_index, hybrid_topk, hybrid_topk_indexed,
        term_stats_from_postings)
    from prql_query_spark.operators.similarity import (
        ivfpq_index, pq_codebooks_from_anchors)

    spark = get_spark("pq-probe-hybrid")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 2 and sys.argv[1] == "--factor":
        sf_dir = _replica(spark, int(sys.argv[2]))
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    emb_name = "embeddings10.parquet" if os.path.exists(
        os.path.join(sf_dir, "embeddings10.parquet")) else "embeddings.parquet"
    emb = load_parquet(spark, os.path.join(sf_dir, emb_name))
    n_docs, n_vecs = docs.count(), emb.count()
    anchors = [r.embedding for r in
               emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()]
    codebooks = pq_codebooks_from_anchors(anchors, m=8)

    def ex(df):
        df.write.format("noop").mode("overwrite").save()

    d = tempfile.mkdtemp(prefix="pq_hyb_amort_")
    pdir = os.path.join(d, "postings.parquet")
    sdir = os.path.join(d, "stats.parquet")
    tdir = os.path.join(d, "term_stats.parquet")
    adir = os.path.join(d, "ann.parquet")

    def build():
        postings, stats = build_bm25_index(docs)
        postings.sort("term").write.mode("overwrite").parquet(pdir)
        stats.write.mode("overwrite").parquet(sdir)
        term_stats_from_postings(spark.read.parquet(pdir)).sort("term") \
            .write.mode("overwrite").parquet(tdir)
        ivfpq_index(emb, anchors, codebooks).sort("_cell") \
            .write.mode("overwrite").parquet(adir)

    def probe():
        ex(hybrid_topk_indexed(
            spark.read.parquet(pdir), spark.read.parquet(sdir),
            spark.read.parquet(adir), emb, anchors, codebooks,
            QUERY, query_vec_id=7, k=K, depth=DEPTH, n_probe=N_PROBE))

    def probe_dfcap():
        ex(hybrid_topk_indexed(
            spark.read.parquet(pdir), spark.read.parquet(sdir),
            spark.read.parquet(adir), emb, anchors, codebooks,
            QUERY, query_vec_id=7, k=K, depth=DEPTH, n_probe=N_PROBE,
            term_stats=spark.read.parquet(tdir),
            df_cap_frac=float(DFCAP)))

    def direct():
        ex(hybrid_topk(docs, emb, QUERY, query_vec_id=7, k=K, depth=DEPTH))

    build()
    probe()
    direct()  # warm
    samples = {"build": [], "probe": [], "direct": []}
    if DFCAP:
        probe_dfcap()
        samples["probe_dfcap"] = []
    for _ in range(RUNS):
        t0 = time.time(); build(); samples["build"].append(time.time() - t0)
        t0 = time.time(); probe(); samples["probe"].append(time.time() - t0)
        if DFCAP:
            t0 = time.time(); probe_dfcap()
            samples["probe_dfcap"].append(time.time() - t0)
        t0 = time.time(); direct(); samples["direct"].append(time.time() - t0)
    shutil.rmtree(d, ignore_errors=True)

    ms = {n: round(statistics.median(v) * 1000, 1) for n, v in samples.items()}
    out = {"sf_dir": sf_dir, "n_docs": n_docs, "n_vecs": n_vecs,
           "runs": RUNS, **{f"{n}_ms": v for n, v in ms.items()}}
    if DFCAP:
        out["df_cap_frac"] = float(DFCAP)
    if ms["direct"] > ms["probe"]:
        out["crossover_queries"] = round(
            ms["build"] / (ms["direct"] - ms["probe"]), 1)
    if DFCAP and ms["direct"] > ms["probe_dfcap"]:
        out["crossover_queries_dfcap"] = round(
            ms["build"] / (ms["direct"] - ms["probe_dfcap"]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
