"""End-to-end corpus curation: the whole training-data pipeline as one
call, with the per-stage accounting a data team actually reviews.

Every stage is one of the individually value-checked operators (each has
its own DuckDB-oracled queries() entry); this module is the composition
— gate -> exact dedup -> near dedup -> decontaminate -> scrub — plus a
manifest of (stage, docs_in, docs_out, dropped) so a mix change is
explainable row by row.  Intermediates are cached once and unpersisted:
per-stage counts are actions, and at 100 TB you would checkpoint
between stages regardless (the manifest IS the reason to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str = "n_chars",
    minhash_threshold: float = 0.8,
    gopher_overrides: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated DataFrame with `clean_text`, manifest DataFrame).

    Stages: (1) Gopher rule gate with per-rule accounting;
    (2) exact content dedup keeping the highest-``quality_col`` copy;
    (3) MinHash near-dedup, connected-component representatives;
    (4) n-gram decontamination against ``benchmark`` (skipped when None);
    (5) PII scrub into `clean_text`.
    """
    import time

    from prql_query_spark.operators.dedup import (
        dedup_keep_best, minhash_dedup_cc,
    )
    from prql_query_spark.operators.text import (
        contamination, gopher_audit, scrub_pii,
    )

    spark = docs.sparkSession
    # (stage, docs_in, docs_out, wall seconds).  The wall time of a stage
    # is the time to MATERIALIZE its cache (the count action) — each stage
    # reads its parent's cache, never the source, so the seconds column is
    # a true per-stage decomposition of the pipeline, not overlapping
    # rescans.  The source is read exactly once (the ingest scan, folded
    # into gopher_gate's time along with its own pass).
    stages: list[tuple[str, int, int, float]] = []

    t0 = time.time()
    # _spread: a single-file CLI-scale ingest arrives as ONE partition and
    # would serialize the gate's per-row rules (and the cache it feeds)
    # onto one core — measured gopher_gate stage wall 1.4 -> 0.74 s at
    # sf0.1.  At warehouse scale the scan already has many partitions and
    # this is a no-op (same contract as the dedup kernels' _spread).
    from pyspark.sql import Observation

    from prql_query_spark.operators.dedup import _spread

    # Round-12 (guide §1.2/§8): the ingest count rides the gate stage's
    # materializing action as an Observation instead of paying its own
    # job — the ONE separate count job in the pipeline (every other
    # stage's count IS the action that materializes that stage's cache
    # for the next stage, so there is nothing to fold there; verified by
    # job-count instrumentation, see OPTIMIZATION_r12.md).  The ingest
    # scan cost is unchanged — it now happens inside the gate action, so
    # the gate stage wall still includes it, as before.
    obs_in = Observation()
    cur = (_spread(docs)
           .observe(obs_in, F.count(F.lit(1)).alias("n"))
           .cache())

    t = time.time()
    gated = gopher_audit(cur, text_col, **(gopher_overrides or {})) \
        .filter(F.col("keep")) \
        .select(*docs.columns).cache()
    n1 = gated.count()
    n0 = obs_in.get["n"]
    stages.append(("gopher_gate", n0, n1, time.time() - t0))

    t = time.time()
    exact = dedup_keep_best(
        gated.withColumn("_h", F.md5(F.col(text_col))),
        ["_h"], quality_col, id_col,
    ).drop("_h").cache()
    n2 = exact.count()
    stages.append(("exact_dedup_keep_best", n1, n2, time.time() - t))

    t = time.time()
    # stage 2 already collapsed exact dups, so skip minhash_dedup_cc's
    # own dup probe (collapse gate can never trigger on this input)
    near = minhash_dedup_cc(
        exact, id_col=id_col, text_col=text_col,
        threshold=minhash_threshold, collapse_min_dup_frac=1.1,
    ).cache()
    n3 = near.count()
    stages.append(("minhash_dedup_cc", n2, n3, time.time() - t))

    if benchmark is not None:
        t = time.time()
        hits = contamination(near, benchmark, id_col=id_col,
                             text_col=text_col)
        clean = near.join(
            hits.filter(F.col("n_hits") > 0).select(id_col),
            id_col, "left_anti").cache()
        n4 = clean.count()
        stages.append(("decontaminate", n3, n4, time.time() - t))
    else:
        clean = near

    out = clean.withColumn("clean_text", scrub_pii(F.col(text_col)))

    manifest = spark.createDataFrame(
        [(i, s, i_n, o_n, i_n - o_n, round(sec, 3))
         for i, (s, i_n, o_n, sec) in enumerate(stages)],
        "stage_idx int, stage string, docs_in long, docs_out long, "
        "dropped long, seconds double",
    )
    # `clean`'s cache is deliberately left live: it backs the returned
    # lazy `out` (everything below it is unpersisted here, so dropping
    # it too would force the caller's first action to replay the whole
    # pipeline from the source).  Callers that materialize `out` and
    # want the storage back call `out.unpersist()` / clear the session.
    for df in (cur, gated, exact, near):
        df.unpersist()
    return out, manifest
