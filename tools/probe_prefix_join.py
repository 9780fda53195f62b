"""jaccard_join_prefix scale posture: candidate volume the prefix
filter admits vs the all-pairs space, and wall time vs the two existing
ways to get near-dup pairs at the same threshold:

  prefix_ms   — jaccard_join_prefix (EXACT, deterministic recall)
  minhash_ms  — minhash_verified_pairs (probabilistic recall; its
                banding can miss near-threshold pairs — the thing the
                prefix join exists to rule out)
  duckdb_ms   — the single-node all-pairs twin, run on a SUBSET capped
                at --brute docs (all-pairs is quadratic; the full-corpus
                brute force is exactly the plan that cannot exist at
                scale, so it is measured small and reported as-is, not
                extrapolated)

Also asserts containment: every verified minhash pair must be in the
prefix join's output (exact ⊇ probabilistic), and on the brute subset
the prefix join equals brute force exactly.

Usage: python tools/probe_prefix_join.py [--sf DIR] [--brute N]
         [--limit N] [--no-brute]
       (defaults: /root/testdata/sf0.1, brute subset 1500 docs;
       --sf may point at the .scratch zipf corpus for the long-tail-df
       regime; PQ_PROBE_RUNS=3 interleaved warm medians)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

RUNS = int(os.environ.get("PQ_PROBE_RUNS", "3"))
T_NUM = int(os.environ.get("PQ_PROBE_TNUM", "3"))
T_DEN = int(os.environ.get("PQ_PROBE_TDEN", "5"))
K = 5


def _med(fn):
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    return round(statistics.median(ts), 1)


def main():
    sf_dir, brute_n, limit = "/root/testdata/sf0.1", 1500, None
    no_brute = "--no-brute" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
        if a == "--brute":
            brute_n = int(sys.argv[i + 1])
        if a == "--limit":
            limit = int(sys.argv[i + 1])

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators.dedup import (
        _prefix_candidates, jaccard_join_prefix, minhash_verified_pairs)

    spark = get_spark()
    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    if limit:
        docs = docs.filter(F.col("doc_id") < limit)
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "runs": RUNS,
                 "threshold": f"{T_NUM}/{T_DEN}"}

    cand, _ = _prefix_candidates(docs, T_NUM, T_DEN, "doc_id", "text", K)
    out["candidate_pairs"] = cand.count()
    out["allpairs_space"] = n_docs * (n_docs - 1) // 2
    out["candidate_fraction"] = round(
        out["candidate_pairs"] / out["allpairs_space"], 6)

    prefix_pairs = {(r["a"], r["b"])
                    for r in jaccard_join_prefix(docs, T_NUM, T_DEN).collect()}
    mh_pairs = {(min(r["a"], r["b"]), max(r["a"], r["b"]))
                for r in minhash_verified_pairs(
                    docs, threshold=T_NUM / T_DEN).collect()}
    assert mh_pairs <= prefix_pairs, "exact join missed a verified LSH pair"
    out["pairs_exact"] = len(prefix_pairs)
    out["pairs_minhash"] = len(mh_pairs)

    out["prefix_ms"] = _med(
        lambda: jaccard_join_prefix(docs, T_NUM, T_DEN).count())
    out["minhash_ms"] = _med(
        lambda: minhash_verified_pairs(docs, threshold=T_NUM / T_DEN).count())

    if no_brute:
        print(json.dumps(out))
        return

    # brute-force twin on a capped subset, DuckDB and Spark side by side
    sub = docs.filter(F.col("doc_id") < brute_n)
    sub_n = sub.count()
    out["brute_subset_docs"] = sub_n
    out["prefix_subset_ms"] = _med(
        lambda: jaccard_join_prefix(sub, T_NUM, T_DEN).count())
    sub.select("doc_id", "text").toPandas().to_parquet("/tmp/pq_brute.parquet")
    con = duckdb.connect()
    brute_sql = f"""
WITH s AS (
    SELECT doc_id, list_distinct(list_transform([substr(lt, x, 5)
               for x in range(1, greatest(len(lt) - 4, 1) + 1)],
               g -> hash(g))) AS ts
    FROM (SELECT doc_id, lower(text) AS lt FROM '/tmp/pq_brute.parquet')
), sized AS (SELECT doc_id, ts, len(ts) AS n FROM s)
SELECT a.doc_id AS a, b.doc_id AS b
FROM sized a JOIN sized b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.ts, b.ts)) * {T_DEN}
      >= {T_NUM} * (a.n + b.n - len(list_intersect(a.ts, b.ts)))
"""
    out["duckdb_brute_subset_ms"] = _med(
        lambda: con.sql(brute_sql).fetchall())
    brute_pairs = {(a, b) for a, b in con.sql(brute_sql).fetchall()}
    sub_pairs = {(r["a"], r["b"])
                 for r in jaccard_join_prefix(sub, T_NUM, T_DEN).collect()}
    assert sub_pairs == brute_pairs, "prefix join != brute force on subset"
    out["subset_pairs"] = len(brute_pairs)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
