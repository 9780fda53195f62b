"""BM25 formulation shoot-out + floor decomposition (BASELINE.md §4.4c).

Reproduces the round-6 evidence that the shipped BM25 plan
(tokenize -> explode -> literal semi-filter -> tf groupBy -> df window)
is the fastest known formulation, and that the remaining gap to the
DuckDB twin is scan/stage floor, not per-byte slope:

  current     — operators/retrieval.bm25_topk as shipped
  arrfilter   — full pipeline with the array filtered BEFORE the
                explode (WSCG fuses the explode+filter loop either way,
                so the difference is row-construction for non-matching
                tokens)
  flat        — per-term `size(filter(toks, =t))` columns; no explode,
                no candidate-set shuffles, df folded into the stats agg
  structagg   — single-pass struct-of-counters F.aggregate; zero
                candidate-set exchanges
  plain_scan  — count + avg(length(text)): the no-tokenize scan floor
  duck_stats  — DuckDB's full tokenize+stats pass, same corpus

Usage: python tools/probe_bm25_formulations.py [sf_dir]
(default .scratch/sf1 — build with tools/make_sfbig.py; the floor story
is clearest at the 50k-doc corpus)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

QUERY = "data quality and the best model"
K1, B = 1.2, 0.75
RUNS = 7


def _eq(term):
    # F.filter lambdas with two params receive (element, INDEX) — capture
    # the term via closure so the lambda stays single-parameter
    return lambda x: x == F.lit(term)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, ".scratch", "sf1")
    if not os.path.isdir(sf_dir):
        sys.exit("build fixtures first: tools/make_sfbig.py")

    import duckdb

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.retrieval import bm25_topk
    from prql_query_spark.operators.text import ASCII_WS

    spark = get_spark("pq-bm25-forms")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    terms = sorted({t for t in QUERY.lower().split() if t})
    m = len(terms)

    def ex(df):
        df.write.format("noop").mode("overwrite").save()

    toks = F.split(F.trim(F.lower(F.col("text"))), ASCII_WS)

    def current():
        ex(bm25_topk(docs, QUERY, k=20))

    def arrfilter():
        from pyspark.sql import Window

        base = docs.select(F.col("doc_id"), toks.alias("_toks"))
        stats = base.agg(F.count(F.lit(1)).alias("_n"),
                         F.avg(F.size("_toks")).alias("_avgdl"))
        hits = base.select(
            "doc_id", F.size("_toks").alias("_dl"),
            F.explode(F.filter(
                "_toks", lambda x: x.isin(terms))).alias("_t"))
        tf = hits.groupBy("doc_id", "_t").agg(
            F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl"))
        scored = (
            tf.withColumn("_df",
                          F.count(F.lit(1)).over(Window.partitionBy("_t")))
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "_s",
                F.log(1.0 + (F.col("_n") - F.col("_df") + 0.5)
                      / (F.col("_df") + 0.5))
                * F.col("_tf") * (K1 + 1.0)
                / (F.col("_tf")
                   + K1 * (1.0 - B + B * F.col("_dl") / F.col("_avgdl")))))
        ex(scored.groupBy("doc_id")
           .agg(F.round(F.sum("_s"), 6).alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id")).limit(20))

    def _flat_base():
        tfs = [F.size(F.filter("_toks", _eq(t))).alias(f"_tf{i}")
               for i, t in enumerate(terms)]
        return (docs.select(F.col("doc_id"), toks.alias("_toks"))
                .select("doc_id", F.size("_toks").alias("_dl"), *tfs))

    def _score_from(flatdf):
        aggs = [F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")]
        aggs += [F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
                 for i in range(m)]
        stats = flatdf.agg(*aggs)
        score, hit = None, None
        for i in range(m):
            tf = F.col(f"_tf{i}")
            idf = F.log(1.0 + (F.col("_n") - F.col(f"_df{i}") + 0.5)
                        / (F.col(f"_df{i}") + 0.5))
            c = idf * tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * F.col("_dl") / F.col("_avgdl")))
            h = (tf > 0).cast("int")
            score = c if score is None else score + c
            hit = h if hit is None else hit + h
        return (flatdf.crossJoin(F.broadcast(stats)).filter(hit > 0)
                .select("doc_id", F.round(score, 6).alias("score"))
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(20))

    def flat():
        ex(_score_from(_flat_base()))

    def structagg():
        zero = F.struct(*[F.lit(0).alias(f"c{i}") for i in range(m)])

        def step(acc, x):
            return F.struct(*[
                (acc[f"c{i}"] + (x == F.lit(t)).cast("int")).alias(f"c{i}")
                for i, t in enumerate(terms)])

        base = (docs.select(F.col("doc_id"), toks.alias("_toks"))
                .select("doc_id", F.size("_toks").alias("_dl"),
                        F.aggregate("_toks", zero, step).alias("_tf")))
        flatdf = base.select(
            "doc_id", "_dl",
            *[F.col(f"_tf.c{i}").alias(f"_tf{i}") for i in range(m)])
        ex(_score_from(flatdf))

    def plain_scan():
        ex(docs.agg(F.count(F.lit(1)), F.avg(F.length("text"))))

    variants = {"current": current, "arrfilter": arrfilter, "flat": flat,
                "structagg": structagg, "plain_scan": plain_scan}
    for f in variants.values():
        f()  # warm
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(RUNS):  # interleaved so drift hits every variant
        for n, f in variants.items():
            t0 = time.time()
            f()
            samples[n].append(time.time() - t0)
    out = {n: round(statistics.median(v) * 1000, 1)
           for n, v in samples.items()}

    con = duckdb.connect()
    p = os.path.join(sf_dir, "documents.parquet")
    pat = p + ("/*.parquet" if os.path.isdir(p) else "")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")
    sql = ("SELECT COUNT(*), AVG(len(regexp_split_to_array("
           "trim(lower(text)), '\\s+'))) FROM documents")
    con.execute(sql).fetchall()
    ds = []
    for _ in range(RUNS):
        t0 = time.time()
        con.execute(sql).fetchall()
        ds.append(time.time() - t0)
    con.close()
    out["duck_stats"] = round(statistics.median(ds) * 1000, 1)
    print(json.dumps({"sf_dir": sf_dir, "runs": RUNS, "ms": out}))


if __name__ == "__main__":
    main()
