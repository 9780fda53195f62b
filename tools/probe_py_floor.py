"""Where does the mapInPandas stage wall go?  Probe the Python-stage
floor as a function of partition count: identity over the documents
table and the real minhash kernel at several _spread targets."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators import dedup as D

    spark = get_spark("probe-py-floor")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    docs = docs.select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def med(make, label, runs=7):
        noop(make())
        noop(make())
        samples = []
        for _ in range(runs):
            t = time.time()
            noop(make())
            samples.append(time.time() - t)
        v = round(statistics.median(samples) * 1000, 1)
        print(f"{label:46s} {v:8.1f} ms", flush=True)
        return v

    def identity(n):
        d = docs.repartition(n)
        return d.mapInPandas(lambda it: it, d.schema)

    for n in (1, 2, 4, 8, 16, 32):
        med(lambda n=n: identity(n), f"identity mapInPandas, {n} parts")

    a_consts, b_consts = D._minhash_perm_constants(64)

    def sig_at(n):
        import pandas as pd
        from pyspark.sql import types as T
        out_schema = T.StructType([
            T.StructField("_id", docs.schema["doc_id"].dataType),
            T.StructField("_sig", T.ArrayType(T.LongType())),
        ])

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sigs = D._minhash_kernel(
                    pdf["text"].tolist(), a_consts, b_consts, 5)
                yield pd.DataFrame({"_id": pdf["doc_id"], "_sig": list(sigs)})
        return docs.repartition(n).mapInPandas(gen, out_schema)

    for n in (1, 2, 4, 8, 16, 32):
        med(lambda n=n: sig_at(n), f"minhash kernel, {n} parts")

    # plain JVM stage for comparison: same repartition, no Python
    for n in (1, 32):
        med(lambda n=n: docs.repartition(n).selectExpr(
            "doc_id", "length(text) l"), f"JVM length(), {n} parts")
    spark.stop()


if __name__ == "__main__":
    main()
