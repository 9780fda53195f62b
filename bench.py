"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set mirrors BASELINE.md §2 (the DuckDB-measured substitutes — the
reference publishes no numbers) plus the headline extension operators.
Timing = warm median of 5 runs of full execution into the noop sink
(`df.write.format("noop")` executes every projection — `count()` lets
Catalyst prune unused columns and under-measures projection-heavy
queries, the round-1 measurement bug).  Cold session startup is reported
separately as `startup_sec`.
"""

from __future__ import annotations

import json
import os

import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    t0 = time.time()
    from pyspark.sql import functions as F  # noqa: F401

    import __spark_entry__ as entrymod
    from prql_query_spark import compile_prql
    from prql_query_spark.engine.session import get_spark

    spark = get_spark("pq-bench")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._reg(spark, sf_dir)
    from prql_query_spark.engine.session import sources_bytes, tune_session_for

    tune_session_for(spark, sources_bytes([sf_dir]))
    # catalog schemas enable the compiler's eager-aggregation rewrite —
    # the same schema-aware path _prql_runner (the driver gate) compiles
    compile_kwargs = entrymod._compile_kwargs(sf_dir)
    startup = time.time() - t0

    # BASELINE.md §2 shapes, verbatim semantics (q_take is the pure
    # unsorted LIMIT, exactly like the baseline's q_take).
    bench_prql = {
        "q_take": "from lineitem | take 5",
        "q_agg": entrymod.PRQL_QUERIES["q_agg_q1"],
        "q_join_agg": entrymod.PRQL_QUERIES["q_join_agg_q5"],
        "q_window": """
from orders
group [o_custkey] (
    sort [o_orderdate, o_orderkey]
    window expanding:true (
        derive [run_spend = round 2 (sum o_totalprice)]
    )
)
select [o_custkey, o_orderkey, o_orderdate, run_spend]
sort [o_custkey, o_orderdate]
take 10
""",
        "q_topk": entrymod.PRQL_QUERIES["q_topk_customers"],
        "q_filter_derive": entrymod.PRQL_QUERIES["q_filter_derive"],
    }
    extension_names = [
        "x_dedup_exact", "x_minhash_pairs", "x_token_count",
        "x_cosine_topk", "x_events_sessions", "x_retention_cohort",
        "x_unigram_logprob",
    ]
    # Multi-second end-to-end pipelines (added round 3): timed and reported
    # under `queries_heavy` with their own total so the headline `value`
    # stays comparable across rounds — folding a 7 s dedup pipeline into
    # the same total as six sub-second queries would read as a regression
    # when it is new coverage.  (DuckDB head-to-head for these:
    # BASELINE.md §4.3 — the all-pairs oracle twin times out at 10 min.)
    heavy_names = ["x_minhash_dedup_cc", "x_embed_neardup_lsh",
                   "x_dup_substrings", "x_curate_pipeline"]

    # x_minhash_pairs here measures the LSH CANDIDATE op (signatures ->
    # bands -> bucket pairs), the same computation BENCH_r01 recorded —
    # the driver-facing queries() entry since r2 additionally runs exact
    # verification, which is a different (larger) computation.
    def _minhash_candidates(spark, sf_dir):
        from prql_query_spark.engine.sources import load_parquet
        from prql_query_spark.operators.dedup import minhash_lsh_pairs

        docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        return minhash_lsh_pairs(docs, num_perm=64, bands=16, k=5)

    # x_embed_neardup_lsh: the SCALE path of embedding near-dup — random-
    # hyperplane LSH bucketing with verification restricted to buckets.
    # (The queries() entry runs exact=True all-pairs because that is the
    # value-checkable oracle configuration; benching that would measure
    # the oracle twin, not the production plan.)  Operating point:
    # threshold 0.4 / 4-bit / 8-table — measured recall 0.76 of the 920
    # exact pairs with 814k of 2M candidates.  That retention is the
    # honest number for LOW-threshold similarity: the 0.4-pairs sit on
    # cluster boundaries, and the measured IVF sweep (see
    # embedding_neardup_ivf's docstring) needs 1.45M+ candidates for
    # recall >= 0.97 — geometric pruning only pays above ~0.7 cosine,
    # and the fixture's similarity mass tops out at 0.60.
    def _embed_neardup_lsh(spark, sf_dir):
        from prql_query_spark.engine.sources import load_parquet
        from prql_query_spark.operators.similarity import embedding_neardup

        emb = load_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        return embedding_neardup(emb, threshold=0.4, exact=False)

    # x_curate_pipeline: the composed end-to-end curation showcase
    # (gate -> exact dedup -> minhash cc dedup -> decontaminate -> PII
    # scrub) — wall time INCLUDES the per-stage manifest counts, which
    # is how the pipeline is actually run.
    def _curate_pipeline(spark, sf_dir):
        from prql_query_spark.engine.sources import load_parquet
        from prql_query_spark.pipelines import curate_corpus

        docs = load_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        bench_docs = docs.filter(F.col("doc_id") % 13 == 0) \
            .select("doc_id", "text")
        out, _manifest = curate_corpus(
            docs, benchmark=bench_docs,
            gopher_overrides={"max_dup_frac": 1.0, "min_words": 20},
        )
        return out.select("doc_id", "clean_text")

    bench_overrides = {
        "x_minhash_pairs": _minhash_candidates,
        "x_embed_neardup_lsh": _embed_neardup_lsh,
        "x_curate_pipeline": _curate_pipeline,
    }

    results: dict[str, float] = {}

    def execute(df) -> None:
        # noop sink: full execution of every column, zero driver transfer
        df.write.format("noop").mode("overwrite").save()

    def time_df(make_df, runs: int = 5) -> float:
        execute(make_df())  # warm: codegen/JIT compile, file-footer caches
        execute(make_df())
        samples = []
        for _ in range(runs):
            t = time.time()
            execute(make_df())
            samples.append(time.time() - t)
        return round(statistics.median(samples), 4)

    def note(msg: str) -> None:
        print(msg, file=sys.stderr, flush=True)

    # Steady-state protocol (round 3): an untimed warmup pass over the
    # HEADLINE set before timing it.  Per-query warmup alone leaves the
    # first-timed queries paying JVM JIT compilation that later queries get
    # for free — measured at sf0.1: q_take 161 ms when timed first vs
    # ~75 ms in a JIT-warm session, pure measurement-order artifact.  The
    # DuckDB baseline protocol is warm too; steady state is also what a
    # long-running cluster actually runs at.  The heavy extension ops warm
    # and run AFTER the headline timing — running the multi-second dedup
    # pipelines first measurably inflated headline medians via GC/broadcast
    # pressure (q_join_agg 0.46 -> 0.54 s between otherwise-identical
    # runs).  Warmup time is reported separately as warmup_sec.
    all_queries = entrymod.queries()
    t_w = time.time()
    for _ in range(2):
        for name, prql in bench_prql.items():
            execute(spark.sql(compile_prql(prql, "spark", **compile_kwargs)))
    warmup = time.time() - t_w

    for name, prql in bench_prql.items():
        sql = compile_prql(prql, "spark", **compile_kwargs)
        results[name] = time_df(lambda s=sql: spark.sql(s))
        note(f"bench {name}: {results[name]}s")

    # In-run calibration probes (round 11, VERDICT r10 item 4): two
    # plan-free floors measured inside the same session, so headline
    # drift across rounds decomposes machine-readably — if these moved
    # by a comparable factor, the drift is environment/floor-level; if
    # they held while query walls moved, it is plan-level.  Probe (a)
    # is the empty-job floor (no scan, no shuffle, no Python — the
    # profile_floor no-scan control: scheduler + py4j + commit
    # protocol); probe (b) adds one bare mapInPandas identity stage
    # (the Arrow/Python-worker session floor the ext tier pays).
    def _probe(make_df, runs: int = 9) -> float:
        execute(make_df())
        execute(make_df())
        samples = []
        for _ in range(runs):
            t = time.time()
            execute(make_df())
            samples.append(time.time() - t)
        return round(statistics.median(samples) * 1000, 1)

    def _py_identity():
        df = spark.range(1000)
        return df.mapInPandas(lambda it: it, df.schema)

    calibration = {
        "floor_empty_job_ms": _probe(lambda: spark.range(1000)),
        "floor_py_identity_ms": _probe(_py_identity),
    }
    note(f"calibration probes: {calibration}")

    for name in extension_names:
        fn = bench_overrides[name] if name in bench_overrides else all_queries[name]
        results[name] = time_df(lambda f=fn: f(spark, sf_dir))
        note(f"bench {name}: {results[name]}s")

    # Same-run DuckDB baseline (round 3).  BASELINE.md §2 was measured on
    # 2026-08-13 hardware; driver VMs drift 20-40% run to run (verified by
    # re-running the untouched r2 tree on r3 hardware: 4.41 s recorded vs
    # 5.45 s replayed, identical code).  Re-measuring the §2 DuckDB queries
    # (FIXTURES.md §3 SQL, warm median of 5, full fetch — the §2 protocol)
    # inside the same bench run pins numerator and denominator to the same
    # machine at the same minute, so the ratio is drift-free.
    duck: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        for t in ("lineitem", "orders", "customer", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')")
        duck_sql = {
            "q_take": "SELECT * FROM lineitem LIMIT 5",
            "q_agg": """SELECT l_returnflag, l_linestatus, sum(l_quantity) sq,
                sum(l_extendedprice) se, avg(l_discount) ad, count(*) c
                FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
            "q_join_agg": """SELECT n_name, sum(l_extendedprice*(1-l_discount)) rev
                FROM lineitem JOIN orders ON l_orderkey=o_orderkey
                JOIN customer ON o_custkey=c_custkey
                JOIN nation ON c_nationkey=n_nationkey
                GROUP BY 1 ORDER BY rev DESC""",
            "q_window": """SELECT o_custkey, o_orderdate,
                sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) rt
                FROM orders ORDER BY o_custkey, o_orderdate LIMIT 10""",
            "q_topk": """SELECT c_name, sum(o_totalprice) s FROM orders
                JOIN customer ON o_custkey=c_custkey
                GROUP BY 1 ORDER BY s DESC LIMIT 10""",
            "q_filter_derive": """SELECT l_orderkey,
                l_extendedprice*(1-l_discount) AS disc_price
                FROM lineitem WHERE l_shipdate >= '1995-01-01' AND l_discount > 0.05
                ORDER BY disc_price DESC LIMIT 20""",
        }
        for name, q in duck_sql.items():
            con.execute(q).fetchall()
            con.execute(q).fetchall()
            samples = []
            for _ in range(5):
                t = time.time()
                con.execute(q).fetchall()
                samples.append(time.time() - t)
            duck[name] = round(statistics.median(samples), 4)
        con.close()
        note(f"duckdb same-run baseline: {duck}")
    except Exception as exc:  # baseline section must never fail the bench
        note(f"duckdb baseline section skipped: {exc}")

    heavy: dict[str, float] = {}
    for name in heavy_names:
        fn = bench_overrides[name] if name in bench_overrides else all_queries[name]
        heavy[name] = time_df(lambda f=fn: f(spark, sf_dir), runs=3)
        note(f"bench {name} [heavy]: {heavy[name]}s")

    # Secondary section: the same headline queries on a compacted layout
    # (operators/layout.compact_for_parallelism — the warehouse compaction
    # job every real deployment runs).  The driver's testdata parquet is
    # single-row-group, so every scan above is ONE task regardless of core
    # count; this measures what the engine does the moment the layout has
    # >1 independent scan unit, i.e. on any real table.  Compaction cost is
    # reported as compact_sec and NOT folded into per-query numbers; the
    # primary `queries`/`value` fields above stay protocol-identical to
    # BENCH_r02 (original driver files).
    compacted: dict[str, float] = {}
    compact_sec = None
    try:
        import shutil
        import tempfile

        from prql_query_spark.engine.sources import load_parquet
        from prql_query_spark.engine.session import tune_splits_for_layout
        from prql_query_spark.operators.layout import compact_for_parallelism

        cdir = tempfile.mkdtemp(prefix="pq_compact_")
        t_c = time.time()
        cores = spark.sparkContext.defaultParallelism
        big = ["lineitem", "orders"]
        for t in big:
            # size-proportional file count: one ~512 KB unit per file, cap
            # at core count — 32 tiny files for a 3 MB table measured WORSE
            # than the single-file original (q_window 0.21 -> 0.35 s, task
            # scheduling dominating), while ~512 KB files win everywhere
            src = os.path.join(sf_dir, f"{t}.parquet")
            n = max(1, min(cores, os.path.getsize(src) // (1 << 19)))
            compact_for_parallelism(
                spark, src, os.path.join(cdir, f"{t}.parquet"), int(n))
        compact_sec = round(time.time() - t_c, 2)
        for t in big:
            load_parquet(spark, os.path.join(cdir, f"{t}.parquet")) \
                .createOrReplaceTempView(t)
        tune_splits_for_layout(
            spark, [os.path.join(cdir, f"{t}.parquet") for t in big])
        for name, prql in bench_prql.items():
            execute(spark.sql(compile_prql(prql, "spark", **compile_kwargs)))  # re-warm plans
        for name, prql in bench_prql.items():
            sql = compile_prql(prql, "spark", **compile_kwargs)
            compacted[name] = time_df(lambda s=sql: spark.sql(s))
            note(f"bench {name} [compacted]: {compacted[name]}s")
        shutil.rmtree(cdir, ignore_errors=True)
    except Exception as exc:  # secondary section must never fail the bench
        note(f"compacted-layout section skipped: {exc}")

    # Same-run DuckDB denominators for the EXTENSION and HEAVY tiers —
    # run AFTER all Spark timing so the multi-minute all-core DuckDB
    # twins (recursive CTE, all-pairs joins) cannot pollute the Spark
    # medians via page-cache/GC pressure
    # (round 5, VERDICT r4 item 3): these previously compared against the
    # 2026-08-13 BASELINE.md snapshot, which round 4 proved drifts ±40%
    # machine to machine (DuckDB alone ran 1.68× faster on the r4 VM).
    # Denominator = the query's own oracle_sql() twin, warm median, full
    # fetch, on this machine in this run.  Ratios only sum names whose
    # Spark-timed computation IS the oracle's computation; bench overrides
    # that time a different (scale-path) plan are reported but excluded,
    # with the reason in `samerun_excluded`.
    duck_ext: dict[str, float] = {}
    duck_heavy: dict[str, float] = {}
    samerun_excluded: dict[str, str] = {}
    try:
        import threading

        import duckdb

        oracles = entrymod.oracle_sql()
        con = duckdb.connect()
        for t in entrymod.TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{p}')")

        def duck_time(q: str, runs: int, timeout_s: float):
            """Warm-median DuckDB timing with an interrupt watchdog: the
            heavy tier's oracle twins include an all-pairs recursive CTE
            that runs >10 min at sf0.1 — the watchdog turns that into a
            recorded timeout instead of a hung bench."""
            def one() -> float | None:
                timer = threading.Timer(timeout_s, con.interrupt)
                timer.start()
                try:
                    t = time.time()
                    con.execute(q).fetchall()
                    return time.time() - t
                except duckdb.Error:
                    return None
                finally:
                    timer.cancel()
            if one() is None:  # warm pass doubles as the timeout probe
                return None
            samples = [one() for _ in range(runs)]
            if any(s is None for s in samples):
                return None
            return round(statistics.median(samples), 4)

        ext_overridden = {
            "x_minhash_pairs": "bench times the LSH candidate plan; the "
                               "oracle adds exact verification",
        }
        for name in extension_names:
            if name in ext_overridden:
                samerun_excluded[name] = ext_overridden[name]
                continue
            v = duck_time(oracles[name], runs=5, timeout_s=120)
            if v is None:
                duck_ext[name] = -1.0
                samerun_excluded[name] = "oracle timeout >120s"
            else:
                duck_ext[name] = v
            note(f"duckdb same-run {name}: {duck_ext.get(name)}s")

        heavy_twin_notes = {
            "x_minhash_dedup_cc": "oracle = all-pairs + recursive-CTE "
                                  "connected components (only SQL form)",
            "x_embed_neardup_lsh": "bench times the sublinear LSH plan; "
                                   "the oracle twin is exact all-pairs",
            "x_curate_pipeline": "no single-SQL twin: pipeline embeds a "
                                 "minhash-cc stage (see x_minhash_dedup_cc)",
        }
        for name in heavy_names:
            if name == "x_curate_pipeline":
                samerun_excluded[name] = heavy_twin_notes[name]
                continue
            twin = {
                "x_minhash_dedup_cc": "x_minhash_dedup_cc",
                "x_embed_neardup_lsh": "x_embed_neardup",
                "x_dup_substrings": "x_dup_substrings",
            }[name]
            v = duck_time(oracles[twin], runs=3, timeout_s=120)
            if v is None:
                duck_heavy[name] = -1.0
                samerun_excluded[name] = (
                    heavy_twin_notes.get(name, "") + " — timeout >120s")
            else:
                duck_heavy[name] = v
                if name in heavy_twin_notes:
                    samerun_excluded[name] = (
                        heavy_twin_notes[name] + " — reported, not summed")
            note(f"duckdb same-run {name} [heavy]: {duck_heavy.get(name)}s")
        con.close()
    except Exception as exc:  # baseline section must never fail the bench
        note(f"duckdb tier baseline section skipped: {exc}")


    # Scale-regime section (round 12, r11 verdict item 8): the driver's
    # sf0.1 parquet is single-row-group, so every primary-section scan is
    # ONE task regardless of core count and the 8-vs-32-core sweep reads
    # ~1.0x on floor-bound queries.  When $SPARK_GRAFT_SCALING_DIR points
    # at a replica built by tools/make_sfbig.py (10x rows, 32-file
    # splittable layout), this times a small query set there so
    # core-scaling and shuffle-regime behavior are measurable.  Purely
    # additive and env-gated: without the env var NOTHING here runs and
    # every primary-section number above is produced by byte-identical
    # code.  Reported in the full artifact only (the printed line stays
    # under the driver's stdout tail).
    scaling10x: dict[str, float] = {}
    scal_dir = os.environ.get("SPARK_GRAFT_SCALING_DIR")
    if scal_dir and os.path.isdir(scal_dir):
        try:
            from prql_query_spark.engine.session import tune_splits_for_layout
            from prql_query_spark.engine.sources import load_parquet

            scal_tables = ["lineitem", "orders", "customer", "nation",
                           "documents"]
            for t in scal_tables:
                load_parquet(spark, os.path.join(scal_dir, f"{t}.parquet")) \
                    .createOrReplaceTempView(t)
            tune_splits_for_layout(
                spark, [os.path.join(scal_dir, f"{t}.parquet")
                        for t in scal_tables])
            tune_session_for(spark, sources_bytes([scal_dir]))
            scal_prql = {k: bench_prql[k]
                         for k in ("q_agg", "q_join_agg", "q_window")}
            for name, prql in scal_prql.items():
                sql = compile_prql(prql, "spark", **compile_kwargs)
                execute(spark.sql(sql))  # warm the 10x plans
            for name, prql in scal_prql.items():
                sql = compile_prql(prql, "spark", **compile_kwargs)
                scaling10x[name] = time_df(lambda s=sql: spark.sql(s), runs=3)
                note(f"bench {name} [scaling10x]: {scaling10x[name]}s")
            scal_ext = {
                "x_token_count": all_queries["x_token_count"],
                "x_dedup_exact": all_queries["x_dedup_exact"],
                "x_minhash_pairs": bench_overrides["x_minhash_pairs"],
            }
            for name, fn in scal_ext.items():
                scaling10x[name] = time_df(
                    lambda f=fn: f(spark, scal_dir), runs=3)
                note(f"bench {name} [scaling10x]: {scaling10x[name]}s")
            # restore the primary views in case of future sections
            entrymod._reg(spark, sf_dir)
            tune_session_for(spark, sources_bytes([sf_dir]))
        except Exception as exc:  # scaling section must never fail the bench
            note(f"scaling10x section skipped: {exc}")

    total = round(sum(results.values()), 4)
    out = {
        "metric": "bench_total_warm_median",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "startup_sec": round(startup, 2),
        "warmup_sec": round(warmup, 2),
        "calibration": calibration,
    }
    if duck:
        out["queries_duckdb_samerun"] = duck
        out["value_duckdb_samerun"] = round(sum(duck.values()), 4)
        spark6 = round(sum(results[k] for k in duck), 4)
        out["headline6_spark"] = spark6
        out["headline6_ratio"] = round(spark6 / sum(duck.values()), 2)
        if compacted:
            comp6 = round(sum(compacted[k] for k in duck if k in compacted), 4)
            out["headline6_ratio_compacted"] = round(
                comp6 / sum(duck.values()), 2)
    # Keys useful to a human but not to the driver's parser go to the
    # full artifact only, keeping the printed line well under the
    # driver's 2000-char stdout tail (round-11 verdict items 1-2).
    artifact_only: dict = {}
    if duck_ext:
        out["queries_duckdb_samerun_ext"] = duck_ext
        matched = [k for k, v in duck_ext.items()
                   if v > 0 and k not in samerun_excluded]
        if matched:
            out["ratio_samerun_ext"] = round(
                sum(results[k] for k in matched)
                / sum(duck_ext[k] for k in matched), 2)
            artifact_only["ratio_samerun_ext_names"] = matched
    if duck_heavy:
        out["queries_duckdb_samerun_heavy"] = duck_heavy
        matched = [k for k, v in duck_heavy.items()
                   if v > 0 and k not in samerun_excluded]
        if matched:
            out["ratio_samerun_heavy"] = round(
                sum(heavy[k] for k in matched)
                / sum(duck_heavy[k] for k in matched), 2)
            artifact_only["ratio_samerun_heavy_names"] = matched
    if heavy:
        out["queries_heavy"] = heavy
        out["value_heavy"] = round(sum(heavy.values()), 4)
    if compacted:
        out["queries_compacted"] = compacted
        out["value_compacted"] = round(sum(compacted.values()), 4)
        out["compact_sec"] = compact_sec
    # round-6 closure of the q_agg 2.14x question (VERDICT r5 item 3):
    # the one untried lever was the DataSource-v2 parquet reader, whose
    # scan-task setup differs from the profiled v1 path.  Measured
    # (tools/probe_v2_reader.py, interleaved 9-run medians, BOTH
    # layouts): v2 is same-or-slower everywhere — q_agg 254.7 -> 261.8 ms
    # primary / 174.5 -> 176.9 ms compacted; q_take and q_filter_derive
    # agree.  Together with the profile_floor decomposition (SCALING.md
    # "Job floor decomposition": ~70-90 ms constant scan-task init,
    # no-scan control 28 ms, cost flat across projected bytes), the
    # residual above the 2.0x bar is reader-architecture at Spark 4.1,
    # not plan — and the slope comparison (q_agg within 1.25x of DuckDB
    # per-byte, q_filter_derive cheaper) shows the engine work itself is
    # at or below the oracle's.
    # Artifact-only (NOT printed): the prose notes below pushed the
    # printed line to ~2.3 KB, past the driver's 2000-char stdout tail,
    # which truncated BENCH_r10.json into `parsed: null` and emptied the
    # round-11 PERF table (round-11 verdict items 1-2).  The printed
    # line now stays well under 1500 chars; the notes and the full
    # samerun_excluded reasons live only in the full artifact.
    if scaling10x:
        artifact_only["queries_scaling10x"] = scaling10x
        artifact_only["value_scaling10x"] = round(sum(scaling10x.values()), 4)
        artifact_only["scaling10x_dir"] = scal_dir
    full = dict(out)
    full.update(artifact_only)
    if samerun_excluded:
        full["samerun_excluded"] = samerun_excluded
    full["q_agg_floor_note"] = (
        "v2-reader A/B (tools/probe_v2_reader.py, 9-run interleaved "
        "medians, sf0.1): q_agg v1 254.7ms / v2 261.8ms primary, "
        "v1 174.5ms / v2 176.9ms compacted — v2 same-or-slower at both "
        "layouts; residual over the 2.0x bar is the measured constant "
        "scan-task-init floor (SCALING.md job-floor table), "
        "reader-architecture, not plan")
    # Round 7 moved BASELINE.md §2 to the same-run denominators above
    # (the 08-13 snapshot was 1.7-2.8x slower than this hardware runs
    # DuckDB), which tightens every headline ratio.  The floor reading
    # applies to MOST of the headline set: bare warm noop jobs on this
    # build cost 52/143/166 ms at 0/1/2 shuffles (SCALING.md
    # decomposition: ~17 ms Catalyst + ~31 ms driver/py4j + ~70-90 ms
    # constant scan-task init per scan stage), so every sub-200 ms
    # compacted number is floor-bound.  The ONE exception the sf1 sweep
    # measures is q_join_agg_q5: its per-byte slope is ~9x DuckDB's at
    # sf1 (SCALING.md sf1 table — single-node JVM decode + join compute,
    # not plan: the pinned plan is all-broadcast/one-exchange and the
    # round-8 broadcast-vs-SMJ A/B confirmed the plan choice is not the
    # residual), so its deficit is slope, divided by a cluster's
    # executor count rather than amortized away.  The other headline
    # slopes are at or below the oracle's at sf1.
    full["headline_floor_note"] = (
        "same-run denominators (BASELINE.md §2, round 7): compacted "
        "headline queries sit at their shuffle-count job floor "
        "(52/143/166 ms at 0/1/2 shuffles, SCALING.md); ratios at sf0.1 "
        "measure the constant floor over a 3 MB table, the sf1 slopes "
        "measure the engine — at or below DuckDB's on every headline "
        "query EXCEPT q_join_agg_q5, whose sf1 slope is ~9x "
        "(engine-constant, plan verified broadcast-optimal; "
        "BASELINE.md §4.4g)")
    print(json.dumps(out))
    # The driver keeps only the tail of stdout, which truncated the
    # primary section out of BENCH_r07.json (round-7 verdict item 4):
    # persist the FULL result as a repo artifact every run.  The name is
    # keyed on $SPARK_GRAFT_ROUND when set; otherwise it goes to the
    # non-versioned BENCH_full_latest.json so that ad-hoc and driver
    # re-runs can never clobber a committed BENCH_full_r{N}.json
    # (round-11 verdict item 2 — the old max(BENCH_r*)+1 key overwrote
    # the committed round artifact on every casual run).  The round-
    # closing rep is copied to BENCH_full_r{N}.json explicitly.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd is not None:
            name = f"BENCH_full_r{int(rnd):02d}.json"
        else:
            name = "BENCH_full_latest.json"
        with open(os.path.join(here, name), "w") as fh:
            json.dump(full, fh, indent=1)
    except (OSError, ValueError) as e:  # never fail the bench over artifact IO
        print(f"bench: could not write BENCH_full artifact: {e}",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
