"""Round-11 probe: x_nb_classifier old (two-pass train + restore-join
score) vs new (one-pass train via derived totals + explode_outer score)
formulations.

Usage: python tools/probe_nb.py [sf_dir] [reps]

Strictly interleaved noop-sink walls (median over reps), guide §1.2/§1.4.
Each rep rebuilds the pipeline from scratch so the new variant's lazy
localCheckpoint cannot carry materialized partitions across reps.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prql_query_spark.engine.session import get_spark  # noqa: E402
from prql_query_spark.operators.classify import (  # noqa: E402
    hashed_token_buckets, score_nb_classifier, train_nb_classifier)


def train_old(df, label_col, text_col="text", dim=256, seed=7, alpha=1.0):
    spark = df.sparkSession
    ex = df.select(
        F.col(label_col).cast("boolean").alias("_y"),
        F.explode(hashed_token_buckets(F.col(text_col), dim, seed)).alias("bucket"),
    )
    counts = ex.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = ex.agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("t_pos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("t_neg"),
    )
    grid = spark.range(dim).select(F.col("id").cast("bigint").alias("bucket"))
    full = (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
            F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
        )
        .crossJoin(F.broadcast(totals))
    )
    w = (
        F.log((F.col("c_pos") + alpha) / (F.col("t_pos") + alpha * dim))
        - F.log((F.col("c_neg") + alpha) / (F.col("t_neg") + alpha * dim))
    )
    return full.select("bucket", w.alias("w"))


def score_old(df, model, id_col="doc_id", text_col="text", dim=256, seed=7):
    ex = df.select(
        F.col(id_col),
        F.explode(hashed_token_buckets(F.col(text_col), dim, seed)).alias("bucket"),
    )
    scored = (
        ex.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w").alias("_s"))
    )
    out = df.select(id_col).join(scored, id_col, "left")
    s6 = F.round(F.coalesce("_s", F.lit(0.0)).cast("decimal(38,12)"), 6).cast("double")
    return out.select(id_col, s6.alias("score"), (s6 > 0).alias("pred"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(sf_dir, "documents.parquet")

    def build_old():
        docs = spark.read.parquet(path)
        labeled = docs.withColumn("_y", F.col("text").contains("spark"))
        return score_old(docs, train_old(labeled, "_y"))

    def build_new():
        docs = spark.read.parquet(path)
        labeled = docs.withColumn("_y", F.col("text").contains("spark"))
        return score_nb_classifier(docs, train_nb_classifier(labeled, "_y"))

    variants = {"old": build_old, "new": build_new}
    walls = {k: [] for k in variants}
    # warm both once
    for k, b in variants.items():
        b().write.format("noop").mode("overwrite").save()
    for i in range(reps):
        for k, b in variants.items():
            spark.sparkContext.setJobDescription(f"probe_nb {k} rep{i}")
            t0 = time.monotonic()
            b().write.format("noop").mode("overwrite").save()
            walls[k].append(time.monotonic() - t0)
    for k, ws in walls.items():
        print(f"{k}: median {statistics.median(ws)*1000:.1f} ms "
              f"all {[round(w*1000) for w in ws]}")


if __name__ == "__main__":
    main()
