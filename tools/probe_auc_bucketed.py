"""roc_auc_bucketed vs the exact rank window at monitoring scale (r8
verdict item 3's "Done" measurement): a deterministic 6M-row score
table (hash-derived scores ~ U[0,1] with a label-dependent shift, the
classic binormal-ish monitoring shape), exact AUC (ungrouped rank
window = ONE global sort through one task) vs the bucketed histogram
AUC (one GK aggregate + narrow bucket-assign + 100-bucket aggregate —
fully parallel), plus |auc_exact - auc_bucketed| against the
self-reported err_bound.

Usage: python tools/probe_auc_bucketed.py [n_rows] [buckets]
       (defaults 6_000_000 rows, 100 buckets; PQ_PROBE_RUNS=5
       interleaved warm medians)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    runs = int(os.environ.get("PQ_PROBE_RUNS", "5"))

    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.operators.analytics import roc_auc, roc_auc_bucketed

    spark = get_spark("pq-probe-aucb")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic: u1, u2 from xxhash64; label = u2 < 0.3 (30% pos);
    # score = u1 shifted +0.25 for positives, clamped — AUC ~ 0.75 band
    scores = (
        spark.range(n_rows).repartition(32)
        .select(
            (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000))
             / 1_000_000.0).alias("_u1"),
            (F.pmod(F.xxhash64(F.col("id") + 7_777_777),
                    F.lit(1_000_000)) / 1_000_000.0).alias("_u2"))
        .select(
            (F.col("_u2") < 0.3).alias("y"),
            F.least(
                F.lit(1.0),
                F.col("_u1")
                + F.when(F.col("_u2") < 0.3, 0.25).otherwise(0.0)
            ).alias("score"))
        .localCheckpoint()
    )

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    exact_row = roc_auc(scores, "score", "y").first()
    buck_row = roc_auc_bucketed(scores, "score", "y",
                                buckets=buckets).first()

    def med(fn):
        fn()
        ts = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            ts.append((time.time() - t0) * 1000)
        return round(statistics.median(ts), 1)

    samples = {"exact": [], "bucketed": []}
    noop(roc_auc(scores, "score", "y"))
    noop(roc_auc_bucketed(scores, "score", "y", buckets=buckets))
    for _ in range(runs):
        t0 = time.time()
        noop(roc_auc(scores, "score", "y"))
        samples["exact"].append((time.time() - t0) * 1000)
        t0 = time.time()
        noop(roc_auc_bucketed(scores, "score", "y", buckets=buckets))
        samples["bucketed"].append((time.time() - t0) * 1000)

    print(json.dumps({
        "n_rows": n_rows, "buckets": buckets, "runs": runs,
        "auc_exact": exact_row["auc"],
        "auc_bucketed": buck_row["auc"],
        "abs_diff": round(abs(exact_row["auc"] - buck_row["auc"]), 6),
        "err_bound": buck_row["err_bound"],
        "bound_holds": abs(exact_row["auc"] - buck_row["auc"])
        <= buck_row["err_bound"] + 1e-9,
        "exact_ms": round(statistics.median(samples["exact"]), 1),
        "bucketed_ms": round(statistics.median(samples["bucketed"]), 1),
        "exact_samples": [round(x, 1) for x in samples["exact"]],
        "bucketed_samples": [round(x, 1) for x in samples["bucketed"]],
    }))


if __name__ == "__main__":
    main()
