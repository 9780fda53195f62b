"""df-capped BM25 probing on a ZIPFIAN vocabulary (round-8 VERDICT
items 1+8): the gate fixture's 31-token vocabulary (30 terms at ~78%
df, one at 5%) cannot exhibit the low-df regime a serving index exists
for, so this probe generates a dedicated retrieval fixture with a
realistic long-tail df spectrum and measures the three probe paths on
query shapes spanning it:

  direct_ms   — bm25_topk over the raw corpus (tokenize per query)
  uncapped_ms — probe_bm25_index over the persisted term-sorted index
  dfcap_ms    — probe_bm25_index_dfcap (drop terms with df > frac*N
                via the term_stats sidecar BEFORE the posting scan)

Fixture (`.scratch/zipf{N}/documents.parquet`, FIXTURES.md "Zipfian
retrieval fixture"): N docs x 60 tokens, token of slot i in doc d =
't<rank>' with rank = floor(exp(u * ln(V))), u = pmod(xxhash64(d*1000
+ i), 1e6)/1e6, V = 50_000 — log-uniform ranks, i.e. P(rank r) ~
1/(r ln V), the classic Zipf s=1 shape.  Fully deterministic (hash-
derived, no RNG state), generated once and reused.  Expected df:
rank 1 ~ 100%, rank 10 ~ 40%, rank 100 ~ 5%, rank 1000 ~ 0.5% of docs.

The EXISTING gate fixtures are untouched (green hashes stay
byte-stable); the Zipf corpus exists only under .scratch for
measurement, while correctness of the capping rule itself is gated on
the real fixture by x_bm25_dfcap.

Usage: python tools/probe_bm25_dfcap.py [--docs N] [--frac F]
       (defaults: 500_000 docs, frac 0.10, PQ_PROBE_RUNS=5 interleaved
       warm medians)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "5"))
VOCAB = 50_000
DOC_LEN = 60

# query shapes spanning the df spectrum: all-stopword (the §4.4e losing
# regime), stopword+content (the everyday multi-term query), pure
# content (the regime the index always served well)
QUERIES = {
    "all_stopword": "t1 t2",
    "stop_plus_content": "t1 t2 t150",
    "mixed": "t8 t150 t2000",
    "content_only": "t150 t2000",
}


def _zipf_docs(spark, n_docs: int):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, ".scratch", f"zipf{n_docs}",
                       "documents.parquet")
    if not os.path.exists(out):
        lnv = math.log(VOCAB)
        tok = lambda i: F.concat(  # noqa: E731
            F.lit("t"),
            F.floor(F.exp(
                (F.pmod(F.xxhash64(F.col("doc_id") * 1000 + i),
                        F.lit(1_000_000)) / 1_000_000.0) * lnv
            )).cast("int").cast("string"))
        (
            spark.range(n_docs).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", F.transform(
                    F.sequence(F.lit(1), F.lit(DOC_LEN)), tok,
                )).alias("text"))
            .repartition(32)
            .write.mode("overwrite").parquet(out)
        )
    return spark.read.parquet(out)


def main() -> None:
    n_docs = 500_000
    frac = 0.10
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--docs":
            n_docs = int(args.pop(0))
        elif a == "--frac":
            frac = float(args.pop(0))

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.operators.retrieval import (
        bm25_topk, build_bm25_index, dfcap_surviving_terms,
        probe_bm25_index, probe_bm25_index_dfcap,
        term_stats_from_postings)

    spark = get_spark("pq-probe-dfcap")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _zipf_docs(spark, n_docs)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = os.path.join(root, ".scratch", f"zipf{n_docs}_idx")
    pdir = os.path.join(idx, "postings.parquet")
    sdir = os.path.join(idx, "stats.parquet")
    tdir = os.path.join(idx, "term_stats.parquet")
    if not os.path.exists(tdir):
        postings, stats = build_bm25_index(docs)
        postings.sort("term").write.mode("overwrite").parquet(pdir)
        stats.write.mode("overwrite").parquet(sdir)
        term_stats_from_postings(spark.read.parquet(pdir)).sort("term") \
            .write.mode("overwrite").parquet(tdir)
    postings = spark.read.parquet(pdir)
    stats = spark.read.parquet(sdir)
    ts = spark.read.parquet(tdir)

    def ex(df):
        df.write.format("noop").mode("overwrite").save()

    n = stats.first()["n"]
    out = {"n_docs": n, "vocab": VOCAB, "doc_len": DOC_LEN,
           "df_cap_frac": frac, "runs": RUNS, "queries": {}}
    for name, q in QUERIES.items():
        terms = sorted(set(q.split()))
        dfs = {r["term"]: r["df"] for r in
               ts.filter(F.col("term").isin(terms)).groupBy("term")
               .agg(F.sum("df_partial").alias("df")).collect()}
        surv = dfcap_surviving_terms(ts, stats, terms, frac)
        # warm
        ex(probe_bm25_index(postings, stats, q, k=15))
        ex(probe_bm25_index_dfcap(postings, stats, ts, q, k=15,
                                  df_cap_frac=frac))
        ex(bm25_topk(docs, q, k=15))
        samples = {"uncapped": [], "dfcap": [], "dfcap_nocache": [],
                   "direct": []}
        for _ in range(RUNS):
            t0 = time.time()
            ex(probe_bm25_index(postings, stats, q, k=15))
            samples["uncapped"].append(time.time() - t0)
            t0 = time.time()
            ex(probe_bm25_index_dfcap(postings, stats, ts, q, k=15,
                                      df_cap_frac=frac))
            samples["dfcap"].append(time.time() - t0)
            t0 = time.time()
            ex(probe_bm25_index_dfcap(postings, stats, ts, q, k=15,
                                      df_cap_frac=frac,
                                      use_stats_cache=False))
            samples["dfcap_nocache"].append(time.time() - t0)
            t0 = time.time()
            ex(bm25_topk(docs, q, k=15))
            samples["direct"].append(time.time() - t0)
        out["queries"][name] = {
            "query": q,
            "df_pct": {t: round(100.0 * dfs.get(t, 0) / n, 2)
                       for t in terms},
            "surviving": surv,
            **{f"{k}_ms": round(statistics.median(v) * 1000, 1)
               for k, v in samples.items()},
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
