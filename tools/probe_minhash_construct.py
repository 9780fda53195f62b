"""Decompose the driver-side DataFrame-construction cost of
minhash_lsh_pairs (probe_minhash_stages measured ~464 ms per call, ~half
the bench wall).  No jobs run; this times pure plan building."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from prql_query_spark.engine.session import get_spark
    from prql_query_spark.engine.sources import load_parquet
    from prql_query_spark.operators import dedup as D

    spark = get_spark("probe-minhash-construct")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))

    def t(label, fn, n=10):
        fn()  # warm
        t0 = time.time()
        for _ in range(n):
            fn()
        ms = (time.time() - t0) / n * 1000
        print(f"{label:50s} {ms:8.1f} ms", flush=True)
        return ms

    num_perm, bands, k = 64, 16, 5

    t("load_parquet", lambda: load_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")))
    t("docs.select", lambda: docs.select("doc_id", "text"))
    t("_spread(docs.select)", lambda: D._spread(docs.select("doc_id", "text")))
    t("minhash_signatures", lambda: D.minhash_signatures(
        docs, "doc_id", "text", num_perm, k))
    sig = D.minhash_signatures(docs, "doc_id", "text", num_perm, k)
    t("_banded_from_sig", lambda: D._banded_from_sig(sig, num_perm, bands))
    banded = D._banded_from_sig(sig, num_perm, bands)
    t("_pairs_from_banded", lambda: D._pairs_from_banded(banded, 1000))
    t("full minhash_lsh_pairs", lambda: D.minhash_lsh_pairs(
        docs, num_perm=num_perm, bands=bands, k=k))
    # inside minhash_signatures: which piece?
    t("_minhash_perm_constants", lambda: D._minhash_perm_constants(num_perm))

    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T
    out_schema = T.StructType([
        T.StructField("_id", docs.schema["doc_id"].dataType),
        T.StructField("_sig", T.ArrayType(T.LongType())),
    ])
    a_consts, b_consts = D._minhash_perm_constants(num_perm)

    def gen(batches):
        import numpy as np  # noqa: F401
        for pdf in batches:
            yield pdf

    narrow = D._spread(docs.select("doc_id", "text"))
    t("narrow.mapInPandas(gen)", lambda: narrow.mapInPandas(gen, out_schema))
    spark.stop()


if __name__ == "__main__":
    main()
