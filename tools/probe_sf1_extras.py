"""Reproducible sf1 probes beyond the headline sweep: heavy dedup tier
and the ANN serving tiers at 10× data.

These back the BASELINE.md round-5 notes with a rerunnable script:

* dedup: minhash_dedup_cc alone vs the curate ordering (exact md5 dedup
  first, fuzzy second) on the 50k-doc / 90%-duplicate sf1 corpus — the
  worst case for LSH (every bucket is full of TRUE duplicates, so the
  estimate gate can drop nothing) and the measured reason the pipeline
  runs exact-before-fuzzy.
* ANN: exact cosine top-k vs IVF on a 20k-vector replication — checks
  the "candidates sublinear" claim holds when the corpus grows 10×.

Requires .scratch/sf1 (tools/make_sfbig.py) and builds a 10× embeddings
replica on first run.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.path.join(root, ".scratch", "sf1")
    if not os.path.isdir(sf1):
        sys.exit("run tools/make_sfbig.py first")

    from prql_query_spark.engine.session import (
        get_spark, tune_splits_for_layout,
    )
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.dedup import (
        dedup_keep_best, minhash_dedup_cc,
    )
    from prql_query_spark.operators.similarity import cosine_topk, cosine_topk_ivf

    spark = get_spark("probe-sf1-extras")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- embeddings 10x replica (vec_id shifted, vectors unchanged) ----
    emb_path = os.path.join(sf1, "embeddings10.parquet")
    if not os.path.exists(emb_path):
        base = load_parquet(
            spark, os.path.join("/root/testdata/sf0.1", "embeddings.parquet"))
        parts = [base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 100_000))
                 for i in range(10)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(16).write.parquet(emb_path)

    docs = load_parquet(spark, os.path.join(sf1, "documents.parquet"))
    tune_splits_for_layout(spark, [os.path.join(sf1, "documents.parquet"),
                                   emb_path])

    # --- dedup ordering ------------------------------------------------
    def fuzzy_only():
        return minhash_dedup_cc(docs, threshold=0.8).count()

    def exact_first():
        exact = dedup_keep_best(
            docs.withColumn("_h", F.md5(F.col("text"))),
            ["_h"], "n_chars", "doc_id",
        ).drop("_h").cache()
        exact.count()
        n = minhash_dedup_cc(exact, threshold=0.8).count()
        exact.unpersist()
        return n

    for label, fn in (("fuzzy_only", fuzzy_only), ("exact_first", exact_first)):
        fn()  # warm
        t = time.time()
        n = fn()
        out[f"dedup_{label}_sec"] = round(time.time() - t, 2)
        out[f"dedup_{label}_survivors"] = n

    # --- winnowing substring dedup at sf1 ------------------------------
    # claim under test: fp groupBy, never doc×doc — a 90%-duplicate
    # corpus makes every fingerprint group ~10 deep, the adversarial
    # shape for the grouping
    from prql_query_spark.operators.dedup import winnowed_fingerprints

    def run_winnow():
        fps = winnowed_fingerprints(docs)
        return (fps.groupBy("fp").count().filter(F.col("count") > 1)
                .count())

    try:
        run_winnow()
        t = time.time()
        n = run_winnow()
        out["winnow_sec"] = round(time.time() - t, 2)
        out["winnow_shared_fps"] = n
    except Exception as exc:
        out["winnow_err"] = f"{type(exc).__name__}: {exc}"[:200]

    # --- ANN at 20k vectors --------------------------------------------
    emb = load_parquet(spark, emb_path)
    queries = emb.filter(F.col("vec_id") % 100 == 0) \
        .select("vec_id", "embedding")
    nq = queries.count()
    out["ann_corpus"] = emb.count()
    out["ann_queries"] = nq

    # production IVF shape: cells trained ONCE offline, reused per batch —
    # train outside the timed region and pass centroids=
    from prql_query_spark.operators.similarity import _ivf_centers
    centers = _ivf_centers(emb, "embedding", 16, 1.0, None)

    def run_exact():
        return cosine_topk(emb, queries, k=10).count()

    def run_ivf():
        return cosine_topk_ivf(emb, queries, k=10, centroids=centers).count()

    for label, fn in (("exact", run_exact), ("ivf", run_ivf)):
        try:
            fn()
            t = time.time()
            n = fn()
            out[f"ann_{label}_sec"] = round(time.time() - t, 2)
            out[f"ann_{label}_rows"] = n
        except Exception as exc:  # signature drift — record, don't die
            out[f"ann_{label}_err"] = f"{type(exc).__name__}: {exc}"[:200]

    # --- retrieval at 50k docs ------------------------------------------
    # claim under test: BM25's shuffles are candidate-set-sized — the
    # replicated corpus has 10x the docs AND 10x the per-term hits, the
    # shape where a vocabulary-sized plan would blow up.  The DuckDB twin
    # runs the SAME formula (oracle generator) for the per-byte anchor.
    from prql_query_spark.operators.retrieval import (
        bm25_topk, bm25_topk_oracle_sql,
    )

    BM25_Q = "data quality and the best model"

    def run_bm25():
        return bm25_topk(docs, BM25_Q, k=20).count()

    try:
        run_bm25()
        t = time.time()
        out["bm25_hits"] = run_bm25()
        out["bm25_sec"] = round(time.time() - t, 2)
    except Exception as exc:
        out["bm25_err"] = f"{type(exc).__name__}: {exc}"[:200]

    try:
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf1, 'documents.parquet')}/*.parquet')")
        sql = bm25_topk_oracle_sql(BM25_Q, k=20)
        # warm median of 3 — a single post-warm pass read 1.45 s in one
        # session and 0.28 s in the next (page-cache state after Spark's
        # churn), which briefly put a wrong conclusion in BASELINE.md
        con.execute(sql).fetchall()
        samples = []
        for _ in range(3):
            t = time.time()
            con.execute(sql).fetchall()
            samples.append(time.time() - t)
        samples.sort()
        out["bm25_duckdb_sec"] = round(samples[1], 2)
        con.close()
    except Exception as exc:
        out["bm25_duckdb_err"] = f"{type(exc).__name__}: {exc}"[:200]

    # --- batch amortization: N queries in ONE plan vs N single plans.
    # claim under test: the corpus tokenize dominates, so a 6-query batch
    # should cost ~one corpus pass, not ~6x a single query.
    from prql_query_spark.operators.retrieval import bm25_topk_batch

    batch_qs = [
        ("b0", BM25_Q), ("b1", "fast clean training data"),
        ("b2", "terrible broken slow results"), ("b3", "the new model wins"),
        ("b4", "clean data fast results"), ("b5", "best quality training"),
    ]
    try:
        qdf = spark.createDataFrame(
            batch_qs, "query_id string, query_text string")

        def run_batch():
            return bm25_topk_batch(docs, qdf, k=20).count()

        run_batch()
        t = time.time()
        out["bm25_batch6_rows"] = run_batch()
        out["bm25_batch6_sec"] = round(time.time() - t, 2)

        def run_serial():
            return sum(bm25_topk(docs, q, k=20).count() for _, q in batch_qs)

        run_serial()
        t = time.time()
        out["bm25_serial6_rows"] = run_serial()
        out["bm25_serial6_sec"] = round(time.time() - t, 2)
    except Exception as exc:
        out["bm25_batch_err"] = f"{type(exc).__name__}: {exc}"[:200]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
