"""Event-analytics operators: cohort retention, windowed anomaly scoring,
equi-width histograms.

The reference exposes these shapes only through raw SQL (its operator
surface is PRQL -> SQL passthrough, reference src/main.rs:75-77); here they
are first-class DataFrame operators with deterministic semantics so the
DuckDB oracle can value-check every row.

Scale posture:

* cohort_retention — two shuffles total: one hash partition on user_id
  (distinct day + min-over-user fused in a single Window stage), one on the
  (cohort, offset) agg.  No self-join of the activity table against the
  cohort table (the textbook formulation), which at 100 TB would shuffle
  the fact table twice and skew on big cohorts.
* anomaly_zscore — daily pre-aggregation FIRST (shrinks the fact table to
  |types| x |days| rows), then the trailing-window stats run on the tiny
  aggregate; the window shuffle moves kilobytes regardless of input size.
* histogram — single partial-agg shuffle; bucket index is computed with
  arithmetic (no UDF), so the scan-side combine reduces each partition to
  at most `bins + 2` rows before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prql_query_spark.engine.session import barrier


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "day",
) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity period
    (cohort), counted on each later period offset.

    Returns (cohort, offset, n_users) where `offset` counts `unit` periods
    since the cohort period (offset 0 row = cohort size).

    Round-11 re-plan: one collect_set aggregation per user replaces the
    previous distinct -> per-user window -> aggregate chain — two
    exchanges instead of three, and no sort (the window exec sorted every
    partition).  collect_set partially aggregates map-side, so the one
    user-keyed shuffle ships each (user, period) pair at most once per map
    task — the same bytes the old distinct shuffled, one pass earlier.
    Per-user state is bounded by the calendar (distinct active periods),
    so the set cannot grow with corpus size.

    Null handling (intentional): ``collect_set`` drops null periods, so
    events with a null ``ts_col`` never contribute an offset row and a
    user whose events are ALL null-ts is absent from the triangle
    entirely (no null-cohort bucket).  This matches the declared oracle;
    callers who need the null bucket should filter/fill timestamps
    upstream.
    """
    day = F.date_trunc(unit, F.col(ts_col)).cast("date")
    per_user = (
        events.select(F.col(user_col).alias("_u"), day.alias("_d"))
        .groupBy("_u")
        .agg(F.collect_set("_d").alias("_ds"))
    )
    exploded = per_user.select(
        F.array_min("_ds").alias("_cohort"), F.explode("_ds").alias("_d")
    )
    return (
        exploded.groupBy(
            F.col("_cohort").alias("cohort"),
            F.datediff(F.col("_d"), F.col("_cohort")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def anomaly_zscore(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    trailing: int = 7,
    threshold: float = 2.0,
) -> DataFrame:
    """Flag (key, day) buckets whose daily total deviates > `threshold`
    sigma from the mean of the trailing `trailing` OBSERVED days (a ROWS
    frame over the key's daily buckets — gap days don't count toward the
    window, so for sparse keys the baseline can span more than `trailing`
    calendar days).  Current day EXCLUDED from the baseline, so a spike
    cannot mask itself.

    Rows with fewer than 2 trailing observations have undefined stddev and
    are never flagged (NULL z, filtered out) — identical in both engines.
    """
    daily = (
        events.groupBy(
            F.col(key_col).alias("k"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"),
        )
        .agg(F.sum(value_col).alias("total"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(-trailing, -1)
    )
    scored = daily.select(
        F.col("k").alias(key_col),
        F.col("d").alias("day"),
        F.round("total", 4).alias("total"),
        F.round(
            (F.col("total") - F.avg("total").over(w))
            / F.stddev_samp("total").over(w),
            4,
        ).alias("zscore"),
    )
    return scored.filter(F.abs(F.col("zscore")) > threshold)


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Equi-width histogram with explicit [lo, hi) range: (bucket,
    bucket_lo, n).  Out-of-range values clamp into the edge buckets
    (bucket 0 / bins-1) so the counts always total |df| — the shape a
    distribution monitor wants.  Arithmetic bucket index, no UDF: the
    partial aggregation reduces every scan partition to <= bins rows
    before the single exchange.
    """
    if bins <= 0 or hi <= lo:
        raise ValueError(f"histogram needs bins > 0 and hi > lo, got "
                         f"bins={bins}, lo={lo}, hi={hi}")
    width = (hi - lo) / bins
    idx = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(clamped.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("bucket_lo"),
            "n",
        )
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-key session sequence number to every event: a new
    session starts when the gap since the previous event exceeds
    `gap_minutes`.  The cumulative-sum-of-boundaries formulation — one
    hash shuffle on the key, two window passes over the same sort order
    (Catalyst reuses the partitioning and sort between them).

    Batch twin of the `applyInPandasWithState` streaming sessionizer and
    the `session_window` aggregate; this variant keeps EVERY event row
    with its session id, which the other two shapes cannot return.
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(epoch).over(w)
    boundary = F.when(
        prev.isNull() | ((epoch - prev) > gap_minutes * 60), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def rolling_distinct(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    days: int = 7,
) -> DataFrame:
    """Exact rolling N-day distinct users per day (the DAU/WAU family).

    Spark windows cannot run COUNT(DISTINCT) over a frame, so this
    pre-shrinks to per-day user sets (two shuffles on day-sized data) and
    unions the sets across a RANGE frame in day units — gap days are
    handled by the range frame, not assumed contiguous.  The final window
    is a single ordered pass over |days| rows (kilobytes at any corpus
    size).  At 100 TB the per-day sets themselves get large: use
    `rolling_distinct_approx` (same plan shape, constant-size HLL
    sketches instead of user-id sets).
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = events.select(day.alias("_d"), F.col(user_col).alias("_u")).distinct()
    sets_per_day = daily.groupBy("_d").agg(F.collect_set("_u").alias("_s"))
    dayn = F.datediff(F.col("_d"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.orderBy(dayn)
        .rangeBetween(-(days - 1), Window.currentRow)
    )
    return sets_per_day.select(
        F.col("_d").alias("day"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("_s").over(w)))
        ).alias(f"n_users_{days}d"),
    )


def rolling_distinct_approx(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """The 100 TB path of `rolling_distinct`: per-day HLL sketches
    (Datasketches `hll_sketch_agg`, ~2.5 KB at lg_k=12 regardless of
    cardinality) unioned across the same RANGE frame, then estimated.
    Identical plan shape — per-day pre-aggregation, one day-ordered window
    — but state per day is a constant-size sketch instead of a user-id
    set, so a 10-billion-user day costs the same kilobytes as a small one.
    Standard error ~1.04/sqrt(2^lg_k) ≈ 1.6% at the default.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    per_day = (
        events.select(day.alias("_d"), F.col(user_col).alias("_u"))
        .groupBy("_d")
        .agg(F.expr(f"hll_sketch_agg(_u, {lg_k})").alias("_sk"))
    )
    dayn = F.datediff(F.col("_d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(dayn).rangeBetween(-(days - 1), Window.currentRow)
    return per_day.select(
        F.col("_d").alias("day"),
        F.expr("hll_union_agg(_sk)").over(w).alias("_uni"),
    ).select(
        F.col("day"),
        F.expr("hll_sketch_estimate(_uni)").cast("long").alias(f"n_users_{days}d"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric column
    over shared fixed bins — the standard distribution-drift monitor
    (PSI < 0.1 stable, > 0.25 drifted).

    Laplace smoothing ((n_i + 1) / (N + bins)) keeps empty bins finite and
    the formula identical in the DuckDB oracle.  Each side is one
    histogram aggregation (map-side combine to <= bins rows); the final
    join moves 2*bins rows.
    """
    ha = histogram(df_a, value_col, lo, hi, bins).select(
        "bucket", F.col("n").alias("na"))
    hb = histogram(df_b, value_col, lo, hi, bins).select(
        "bucket", F.col("n").alias("nb"))
    base = df_a.sparkSession.range(bins).select(F.col("id").cast("int").alias("bucket"))
    j = (
        base.join(ha, "bucket", "left").join(hb, "bucket", "left")
        .fillna(0, ["na", "nb"])
    )
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    p = (F.col("na") + 1) / (F.col("ta") + F.lit(bins))
    q = (F.col("nb") + 1) / (F.col("tb") + F.lit(bins))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(((p - q) * F.log(p / q)).alias("_term"))
        .agg(F.round(F.sum("_term"), 6).alias("psi"))
    )


def transition_matrix(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    (prev_state, state, n, p) with p normalized per prev_state — the
    behavioral-analytics staple (funnel discovery, next-action models).

    One shuffle for the per-key ordering (lag), one for the pair counts;
    the normalizing total rides a window over the tiny count table.
    p is computed as round(n*1e4/total)/1e4: exact integer arithmetic into
    the round, so both engines agree even on exact .5 boundaries.
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_state"),
                 F.col(state_col).alias("state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("prev_state"))
    return pairs.select(
        "prev_state", "state", "n",
        (F.round(F.col("n") * 10000.0 / total) / 10000).alias("p"),
    )


def ewma_last(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Final EWMA per key (exponential smoothing, EWMA_1 = v_1), computed
    in closed form instead of a sequential fold:

        EWMA_n = (1-a)^(n-1) v_1 + a * sum_{i>=2} (1-a)^(n-i) v_i

    so it is ONE window pass (row numbers) + one aggregation — no
    iterative state, no UDF, and weights use (1-a)^(n-i) with n from a
    partition count, so nothing overflows at any series length.
    Returns (key, n, ewma).
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    wp = Window.partitionBy(key)
    t = events.select(
        F.col(key),
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n"),
    )
    decay = F.pow(F.lit(1.0 - alpha), F.col("_n") - F.col("_rn"))
    term = F.when(
        F.col("_rn") == 1, F.col("_v") * decay
    ).otherwise(F.lit(alpha) * F.col("_v") * decay)
    return (
        t.groupBy(key)
        .agg(F.max("_n").alias("n"), F.round(F.sum(term), 4).alias("ewma"))
    )


def equidepth_histogram(
    df: DataFrame, value_col: str, buckets: int = 10,
    max_exact_rows: int = 2_000_000,
) -> DataFrame:
    """Equi-depth (quantile) histogram: `buckets` groups of ~equal row
    count with their value ranges — the summary that stays informative on
    skewed distributions where equi-width collapses into one bar.

    The exact path is ntile over a global sort — single-task at the sort,
    which does not scale — so it is gated behind `max_exact_rows`: above
    the cutoff this delegates to `equidepth_histogram_approx` (same output
    contract, GK-sketch cuts, no global sort anywhere).  Picking the path
    needs a cardinality probe, which is necessarily an action — but it
    short-circuits: LIMIT max_exact_rows+1 stops the scan as soon as the
    cutoff is provably exceeded, so at 100 TB the gate reads ~2M rows of
    one column, not the corpus.  On fixtures you get exact quantile edges
    the DuckDB oracle can mirror with ntile.
    """
    nn = df.filter(F.col(value_col).isNotNull())
    over_cutoff = nn.select(value_col).limit(max_exact_rows + 1).count()
    if over_cutoff > max_exact_rows:
        return equidepth_histogram_approx(df, value_col, buckets)
    w = Window.orderBy(F.col(value_col).asc())
    t = nn.select(
        F.col(value_col).alias("_v"), F.ntile(buckets).over(w).alias("bucket")
    )
    return (
        t.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.min("_v"), 4).alias("lo"),
             F.round(F.max("_v"), 4).alias("hi"))
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    fractions: list[float],
    by: list[str] | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Exact continuous-interpolated percentiles per group via ONE
    sorted window pass — the bounded-memory plan for exact quantiles.

    Spark's built-in ``PERCENTILE`` aggregate buffers EVERY value of a
    group in an in-heap OpenHashMap before sorting it on the driver-side
    merge: memory grows with group size (the thing that breaks on a
    100 TB group) and it measured 2.25 s on sf0.1 lineitem vs 52 ms for
    DuckDB's quantile_cont.  This plan instead sorts within the group
    partition (Tungsten external sort — SPILLS instead of growing the
    heap), numbers rows, and interpolates the two straddling rows per
    fraction with a conditional aggregation:

        pos = (n - 1) * p          (0-indexed, quantile_cont's formula)
        v   = v_lo + (pos - floor(pos)) * (v_hi - v_lo)

    The window partition equals the groupBy key, so the aggregation
    reuses the window's partitioning — one real exchange in the plan.
    Same float64 operands and operation order as DuckDB's quantile_cont,
    so results hash-match the oracle exactly (gate row
    x_exact_quantiles).

    Measured at sf0.1 (600k rows, 3 groups, 9-run interleaved medians):
    1182 ms vs 1694 ms for the PERCENTILE aggregate — 1.4x, modest here
    because 3 groups give the window sort only 3 tasks.  The real
    argument is MEMORY class, not the fixture constant: both plans
    serialize per group, but the window's per-group work is a Tungsten
    external sort that SPILLS, while the PERCENTILE aggregate
    accumulates an in-heap value buffer that cannot — on a 100 TB group
    one degrades to disk, the other OOMs.  (For few-huge-group exact
    quantiles at extreme scale the right tool is the GK sketch
    (`approx_percentile`) or distributed selection; this operator is the
    exact middle ground.)

    NULL values are excluded from the computation but the GROUP is
    kept: a group whose values are all NULL yields a NULL percentile —
    exactly DuckDB quantile_cont's semantics (round-8 ADVICE fix;
    previously the pre-filter dropped all-NULL groups entirely).  The
    mechanism costs nothing: rows sort with NULLS LAST, `_n` counts
    only non-NULL values (so non-NULL rows own ranks 0.._n-1 and NULL
    rows own the trailing ranks no fraction can address), and an
    all-NULL group interpolates NULL operands into a NULL result —
    same single exchange, no join-back.  ``round_digits`` applies the
    repo's DECIMAL round convention for gate comparisons.
    """
    keys = list(by or [])
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(F.col(value_col).asc_nulls_last())
    ranked = df.select(
        *keys,
        F.col(value_col).cast("double").alias("_v"),
        (F.row_number().over(w) - 1).alias("_rn"),
        F.count(F.col(value_col)).over(
            (Window.partitionBy(*keys) if keys
             else Window.partitionBy())).alias("_n"),
    )
    aggs = []
    for p in fractions:
        pos = (F.col("_n") - 1) * F.lit(float(p))
        lo, hi = F.floor(pos), F.ceil(pos)
        v_lo = F.max(F.when(F.col("_rn") == lo, F.col("_v")))
        v_hi = F.max(F.when(F.col("_rn") == hi, F.col("_v")))
        expr = v_lo + (F.max(F.when(F.col("_rn") == lo, pos - lo))
                       ) * (v_hi - v_lo)
        name = "p" + f"{float(p) * 100:g}".replace(".", "_")
        if round_digits is not None:
            expr = F.round(expr.cast("decimal(38,12)"),
                           round_digits).cast("double")
        aggs.append(expr.alias(name))
    out = ranked.groupBy(*keys).agg(*aggs) if keys else ranked.agg(*aggs)
    return out.orderBy(*keys) if keys else out


def equidepth_histogram_approx(
    df: DataFrame, value_col: str, buckets: int = 10, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB path of `equidepth_histogram`: ntile needs a GLOBAL sort
    through one task, which does not scale; this computes approx quantile
    cuts in one aggregate (Greenwald-Khanna, error ≤ 1/accuracy of rank),
    broadcasts the ≤buckets cut points back as a literal array, and bucket-
    assigns with a narrow projection — no global sort anywhere.  Same
    output contract (bucket, n, lo, hi); bucket populations are equal to
    within the sketch's rank error.
    """
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("_v")
    )
    fracs = [i / buckets for i in range(1, buckets)]
    cuts = v.agg(
        F.percentile_approx("_v", fracs, accuracy).alias("c")
    ).collect()[0]["c"]
    # one HOF expression, not a buckets-deep WHEN chain (codegen method
    # limits — see score_histogram; identical values)
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    bucket = F.lit(1) + F.size(
        F.filter(arr, lambda c: F.col("_v") > c))
    return (
        v.select("_v", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.min("_v"), 4).alias("lo"),
             F.round(F.max("_v"), 4).alias("hi"))
    )


def distinct_sketch_build(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12,
) -> DataFrame:
    """(keys..., sketch): per-key HLL distinct-count sketches (Apache
    DataSketches via Spark's hll_sketch_agg) — the MERGEABLE building
    block for incremental distinct maintenance at warehouse scale.

    The 100 TB pattern: build one sketch row per (partition key, day) as
    data lands, persist the tiny sketch table, and answer "distinct users
    over any key/date slice" by unioning sketches
    (distinct_sketch_merge) — no rescan of the raw data, ever.  A sketch
    is ~2^lg_k bytes regardless of input size; lg_k=12 gives ~2% relative
    error.  Exact COUNT(DISTINCT) over the raw data stays the
    value-checkable twin (see tests)."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("sketch"))


def distinct_sketch_merge(
    sketches: DataFrame, keys: list[str],
) -> DataFrame:
    """(keys..., approx_distinct): union previously-built sketch rows
    down to the requested key grain and estimate.  Union is lossless in
    sketch space (union of HLLs = HLL of the union), so estimates from
    merged partial sketches EQUAL the estimate a single pass would give
    — pinned by the split-vs-whole test."""
    agg = F.expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
    if keys:
        return sketches.groupBy(*keys).agg(agg.alias("approx_distinct"))
    return sketches.agg(agg.alias("approx_distinct"))


def seasonal_decompose(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    trend_window: int = 7,
) -> DataFrame:
    """Classical additive decomposition of an event stream on the
    hour-of-week cycle: hourly totals split into seasonal (mean of the
    series at that hour-of-week), trend (centered ``trend_window``-bucket
    rolling mean of the deseasonalized series), and residual — the
    decomposition that turns "traffic dropped" into "dropped vs the
    usual Tuesday 3pm", which is what capacity alerts key on.

    Returns (bucket, total, seasonal, trend, residual), residual =
    total - seasonal - trend.  Two shuffles total: the hourly pre-
    aggregation, then ONE window partition-less pass reused by both the
    seasonal join-back (broadcast — 168 rows) and the rolling trend.
    Money-exact: totals aggregate in DECIMAL before any double math."""
    hourly = (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(
            (F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
            .cast("long").alias("_cents")
        )
        .withColumn("total", (F.col("_cents") / 100.0))
    )
    how = (F.dayofweek("bucket") - 1) * 24 + F.hour("bucket")
    seasonal = (
        hourly.groupBy(how.alias("_how"))
        .agg(
            F.round(
                (F.sum("_cents") / F.count(F.lit(1))).cast("double") / 100.0, 4
            ).alias("seasonal")
        )
    )
    joined = hourly.withColumn("_how", how).join(
        F.broadcast(seasonal), "_how"
    ).withColumn("_deseason", F.col("total") - F.col("seasonal"))
    half = trend_window // 2
    w = Window.orderBy("bucket").rowsBetween(-half, half)
    return (
        joined
        .withColumn("trend", F.round(F.avg("_deseason").over(w), 4))
        .select(
            "bucket",
            F.round("total", 2).alias("total"),
            "seasonal",
            "trend",
            F.round(
                F.col("total") - F.col("seasonal") - F.col("trend"), 4
            ).alias("residual"),
        )
        .orderBy("bucket")
    )


def topk_sketch_build(
    df: DataFrame,
    item_col: str,
    keys: list[str] | None = None,
    max_items: int = 1024,
) -> DataFrame:
    """Mergeable frequent-items sketches (Datasketches ItemsSketch via
    `approx_top_k_accumulate`): persist one tiny binary row per key
    group, and any later slice answers "top items + counts" WITHOUT
    rescanning raw data — the frequent-items companion to
    `distinct_sketch_build`.  ``max_items`` bounds sketch size (and sets
    the accuracy envelope); build is one map-side-combined aggregate."""
    agg = F.expr(f"approx_top_k_accumulate({item_col}, {max_items})") \
        .alias("sketch")
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def topk_sketch_merge(
    sketches: DataFrame,
    k: int = 10,
    keys: list[str] | None = None,
) -> DataFrame:
    """Combine persisted frequent-items sketches (optionally re-grouped
    on a coarser key) and estimate the top-k: `(item, count)` structs,
    heaviest first.  Merging is associative, so daily sketches roll up
    to months/years at sketch cost, never raw-scan cost."""
    est = F.expr(
        f"approx_top_k_estimate(approx_top_k_combine(sketch), {k})"
    ).alias("top_items")
    if keys:
        return sketches.groupBy(*keys).agg(est)
    return sketches.agg(est)


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    phi_num: int = 1,
    phi_den: int = 100,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT phi-heavy hitters: every item whose count exceeds
    ``phi_num/phi_den`` of the total, with its exact count — the exact
    complement to `topk_sketch_build` (which estimates).

    Two passes, never a full-vocabulary shuffle:

    1. *Candidates* — a per-partition Misra-Gries summary with
       ``capacity`` counters (`mapInPandas`, vectorized `value_counts`
       merge; overflow subtracts the (capacity+1)-th largest counter
       from all and drops the non-positive — the mergeable-summaries
       rule, so per-partition undercount <= n_p/(capacity+1)).  Each
       partition emits <= capacity candidate rows plus one row-count
       sentinel; the exchange is bounded by capacity x partitions,
       independent of vocabulary size.

       Recall proof (why the output is exact, not approximate): take
       capacity >= phi_den/phi_num.  If an item's GLOBAL count exceeds
       phi*N, then on at least one partition its count exceeds
       phi*n_p >= n_p/(capacity+1) (pigeonhole over the partition
       decomposition), so its counter there survives and the item is in
       the candidate union.  No false negatives; false positives are
       removed by pass 2.

    2. *Verify* — exact counts for candidates only: a broadcast
       semi-join (candidate set <= capacity x partitions rows) filters
       the item stream before one map-side-combined aggregate, so the
       shuffle carries only candidate keys.  The phi threshold is
       integer cross-multiplied (``cnt * phi_den > phi_num * N``) — no
       float boundary, so a DuckDB HAVING twin matches exactly.

    NULL items are excluded from both the candidates and the total N
    (document the same WHERE in any SQL twin).  Output:
    ``(item_col, cnt, n_total)``, unordered.

    At 100 TB: pass 1 is a narrow map whose only exchange is the
    <= capacity x partitions summary (the distinct/total aggregates run
    over that bounded set, and the candidate set re-enters pass 2 as a
    broadcast); pass 2's aggregate shuffles only candidate keys.
    Contrast with the naive GROUP BY + HAVING, whose exchange carries
    the full vocabulary.  Measured on the 50k-vocab Zipfian scratch
    fixture in tools/probe_heavy_hitters.py.
    """
    import math

    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be positive")
    k = capacity if capacity is not None else math.ceil(phi_den / phi_num)
    if k < phi_den / phi_num:
        raise ValueError(
            f"capacity={k} < 1/phi={phi_den}/{phi_num}: the Misra-Gries "
            "recall guarantee needs capacity >= phi_den/phi_num — a "
            "smaller summary could drop a true heavy hitter")

    items = df.select(F.col(item_col).cast("string").alias("_item")) \
        .filter(F.col("_item").isNotNull())
    # Materialize the per-partition summaries ONCE executor-side
    # (localCheckpoint, NOT cache: RDD-level blocks are ContextCleaner-
    # GC'd when the reference drops at return, unlike plan-keyed
    # CacheManager entries — the r8 leak), because BOTH downstream
    # consumers (compaction's candidates+sentinel branches) would
    # otherwise re-run the corpus MG pass (measured 3.2 -> 15.3 s at
    # 30M tokens when this materialization was briefly dropped).
    summary = mg_candidate_summary(items, k).transform(barrier)
    # Fold the capacity x partitions rows down to ONE <= capacity+1-row
    # summary DISTRIBUTED (compact_mg_summaries — the mergeable-
    # summaries decrement preserves the recall contract, verify
    # recounts exactly, so output is identical; pytest pins the serving
    # equality), then materialize that TINY summary on the driver:
    # verify references it twice, and at 16k cluster partitions the
    # uncompacted summary would be millions of rows where this is
    # <= capacity + 1.
    summary = compact_mg_summaries(summary, k)
    local = summary.collect()
    summary = df.sparkSession.createDataFrame(local, summary.schema)
    return heavy_hitters_verify(items, summary, phi_num, phi_den) \
        .withColumnRenamed("_item", item_col)


def mg_candidate_summary(items: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of a non-null `_item` stream:
    <= ``capacity`` candidate rows per partition plus one row-count
    sentinel (``_item`` NULL, ``_w`` = partition rows).  The building
    block `heavy_hitters` runs inline and the streaming maintainer
    (streaming/ingest.stream_heavy_hitter_summaries) persists per batch
    — summaries are UNION-mergeable for candidate purposes: an item
    heavy over any union of slices is heavy in at least one slice
    (pigeonhole), so the union of slice candidates recalls it."""
    import pandas as pd
    from pyspark.sql import types as T

    summary_schema = T.StructType([
        T.StructField("_item", T.StringType()),
        T.StructField("_w", T.LongType()),
    ])

    def mg(batches):
        counters = pd.Series(dtype="int64")
        n_rows = 0
        for pdf in batches:
            vc = pdf["_item"].value_counts()
            n_rows += int(vc.sum())
            counters = counters.add(vc, fill_value=0)
            if len(counters) > capacity:
                kth = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters[counters > kth] - kth
        out = {"_item": [None], "_w": [n_rows]}
        if len(counters):
            out["_item"] = list(counters.index) + out["_item"]
            out["_w"] = [int(w) for w in counters.values] + out["_w"]
        yield pd.DataFrame(out)

    return items.mapInPandas(mg, summary_schema)


def heavy_hitters_by(
    df: DataFrame,
    by: list[str],
    item_col: str,
    phi_num: int = 1,
    phi_den: int = 100,
    capacity: int | None = None,
) -> DataFrame:
    """Per-group exact phi-heavy hitters ("trending terms per source"):
    for every ``by`` group, every item whose in-group count exceeds
    ``phi_num/phi_den`` of that GROUP's total, with exact counts.

    Same two-pass shape as `heavy_hitters`, applied per group: the
    Misra-Gries recall proof holds group-wise (an item phi-heavy in
    group g is phi-heavy in g's slice of at least one partition, so it
    survives that slice's per-group summary), and the verify aggregate
    recounts candidates exactly.  Per-partition kernel state is
    ``capacity`` counters per group present in the partition — bounded
    by groups x capacity, the operator's stated memory envelope.  The
    candidate exchange is groups x capacity x partitions rows,
    compacted group-wise to <= groups x (capacity + 1); the verify
    exchange carries candidate keys only.

    High-cardinality ``by`` scales OUT, not up (r10): the group-wise
    compaction repartitions on the ``by`` keys so each task folds only
    its own groups (the MG decrement is per-group independent — same
    pigeonhole recall proof), the fold kernel decrements incrementally
    per arrow batch so per-group state never exceeds ``capacity``
    counters, and the compacted summary stays DISTRIBUTED (one
    localCheckpoint; NO driver collect anywhere in the plan) — no
    single task ever receives all groups (plan-pinned).
    """
    import math

    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be positive")
    k = capacity if capacity is not None else math.ceil(phi_den / phi_num)
    if k < phi_den / phi_num:
        raise ValueError(
            f"capacity={k} < 1/phi={phi_den}/{phi_num}: the Misra-Gries "
            "recall guarantee needs capacity >= phi_den/phi_num")

    items = df.select(
        *by, F.col(item_col).cast("string").alias("_item")) \
        .filter(F.col("_item").isNotNull())
    # Materialize the per-partition summaries once (localCheckpoint —
    # RDD blocks, GC'd at return; see heavy_hitters), then compact PER
    # GROUP (compact_mg_summaries_by — fold repartitioned on the group
    # keys, no single task receives all groups), and materialize the
    # tiny compacted summary ONCE, distributed: both downstream branches
    # (totals, candidates) read the RDD blocks; no driver collect
    # anywhere, so high-cardinality `by` never builds a groups-sized
    # local list
    summary = mg_candidate_summary_by(items, by, k).transform(barrier)
    summary = compact_mg_summaries_by(summary, by, k).transform(barrier)
    return heavy_hitters_verify_by(items, summary, by, phi_num, phi_den) \
        .withColumnRenamed("_item", item_col)


def mg_candidate_summary_by(
    items: DataFrame, by: list[str], capacity: int
) -> DataFrame:
    """Per-partition GROUP-WISE Misra-Gries summaries of a non-null
    `_item` stream carrying group key columns — the grouped twin of
    `mg_candidate_summary`: <= ``capacity`` candidate rows per group per
    partition plus one per-group row-count sentinel (``_item`` NULL,
    ``_w`` = the group's rows in the partition).  Kernel state is
    ``capacity`` counters per group PRESENT IN THE PARTITION.  Same
    union-mergeability as the flat summary, applied per group."""
    import pandas as pd
    from pyspark.sql import types as T

    by = list(by)
    k = capacity
    summary_schema = T.StructType(
        [items.schema[c] for c in by]
        + [T.StructField("_item", T.StringType()),
           T.StructField("_w", T.LongType())])

    def mg(batches):
        counters: dict = {}   # group key tuple -> pd.Series
        totals: dict = {}     # group key tuple -> rows
        for pdf in batches:
            for keys, sub in pdf.groupby(by, sort=False, dropna=False):
                kt = keys if isinstance(keys, tuple) else (keys,)
                vc = sub["_item"].value_counts()
                totals[kt] = totals.get(kt, 0) + int(vc.sum())
                s = counters.get(kt, pd.Series(dtype="int64")) \
                    .add(vc, fill_value=0)
                if len(s) > k:
                    kth = s.nlargest(k + 1).iloc[-1]
                    s = s[s > kth] - kth
                counters[kt] = s
        rows = []
        for kt, s in counters.items():
            rows += [kt + (it, int(w)) for it, w in s.items()]
        rows += [kt + (None, n) for kt, n in totals.items()]
        cols = list(zip(*rows)) if rows else [[] for _ in range(len(by) + 2)]
        yield pd.DataFrame(
            {c: list(v) for c, v in zip(by + ["_item", "_w"], cols)})

    return items.mapInPandas(mg, summary_schema)


def heavy_hitters_verify_by(
    items: DataFrame,
    summary: DataFrame,
    by: list[str],
    phi_num: int,
    phi_den: int,
) -> DataFrame:
    """The exact-verify half of `heavy_hitters_by` — grouped twin of
    `heavy_hitters_verify`: given any group-wise candidate summary whose
    per-group candidate sets are SUPERSETS of the true per-group
    phi-heavy items (and whose per-group sentinels sum to the group
    totals), produce the exact per-group phi-heavy sets with exact
    counts.  Output columns: (by..., _item, cnt, n_total).

    Group-key joins are null-SAFE (r10): a NULL group key is a real
    group — SQL GROUP BY semantics, and what the MG kernel summarizes
    (dropna=False) — so plain equi-joins would silently drop that
    group's results."""
    by = list(by)
    totals = summary.filter(F.col("_item").isNull()) \
        .groupBy(*by).agg(F.sum("_w").alias("n_total"))
    cands = summary.filter(F.col("_item").isNotNull()) \
        .select(*by, "_item").distinct()
    i, c = items.alias("i"), cands.alias("c")
    cond = [F.col(f"i.{b}").eqNullSafe(F.col(f"c.{b}")) for b in by] \
        + [F.col("i._item") == F.col("c._item")]  # _item non-null by contract
    exact = (
        i.join(c, cond)
        .select(*[F.col(f"i.{b}").alias(b) for b in by],
                F.col("i._item").alias("_item"))
        .groupBy(*by, "_item").agg(F.count(F.lit(1)).alias("cnt"))
    )
    e, t = exact.alias("e"), totals.alias("t")
    cond2 = [F.col(f"e.{b}").eqNullSafe(F.col(f"t.{b}")) for b in by]
    return (
        e.join(t, cond2)
        .filter(F.col("cnt") * phi_den > phi_num * F.col("n_total"))
        .select(*[F.col(f"e.{b}").alias(b) for b in by],
                "_item", "cnt", "n_total")
    )


def compact_mg_summaries(summary: DataFrame, capacity: int) -> DataFrame:
    """Merge a pile of per-slice Misra-Gries summaries into ONE summary
    with the same ``capacity`` guarantee — the compaction pass that
    bounds the streaming maintainer's sidecar: after B batches the raw
    sidecar holds B x (capacity x partitions + sentinels) rows; this
    folds them back to <= capacity candidates + 1 sentinel.

    Correctness (mergeable summaries, Agarwal et al. 2012): summing
    counters item-wise then subtracting the (capacity+1)-th largest and
    dropping non-positives yields an MG summary OF THE UNION with
    undercount <= N_total/(capacity+1), so every item with global count
    > N/(capacity+1) still has a positive counter — the same recall
    contract `heavy_hitters_verify` needs.  Serving output is therefore
    IDENTICAL before and after compaction (pinned by pytest): the
    candidate set may shrink, but never below the true phi-heavy set,
    and verify recounts exactly.

    Runs as one aggregate over the (tiny) summary table — at 100 TB the
    summary is capacity x partitions x batches rows, orders of magnitude
    under the corpus; a maintenance job compacts periodically and
    rewrites the sidecar."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("_item", T.StringType()),
        T.StructField("_w", T.LongType()),
    ])
    merged_items = (
        summary.filter(F.col("_item").isNotNull())
        .groupBy("_item").agg(F.sum("_w").alias("_w"))
    )
    total = summary.filter(F.col("_item").isNull()) \
        .agg(F.sum("_w").alias("_w"))

    def fold(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = counters.add(
                pdf.set_index("_item")["_w"], fill_value=0)
        if len(counters) > capacity:
            kth = counters.nlargest(capacity + 1).iloc[-1]
            counters = counters[counters > kth] - kth
        yield pd.DataFrame({"_item": list(counters.index),
                            "_w": [int(w) for w in counters.values]})

    # one partition so ONE global decrement produces a single
    # <=capacity summary; the folded table is capacity x partitions x
    # batches rows — orders of magnitude under the corpus
    folded = merged_items.coalesce(1).mapInPandas(fold, out_schema)
    return folded.unionByName(
        total.select(F.lit(None).cast("string").alias("_item"), "_w"))


def compact_mg_summaries_by(
    summary: DataFrame,
    by: list[str],
    capacity: int,
) -> DataFrame:
    """Group-wise `compact_mg_summaries`: fold per-slice Misra-Gries
    summaries carrying group key columns down to <= ``capacity``
    candidates + 1 sentinel PER GROUP — the compaction inside
    `heavy_hitters_by`.

    The decrement is per-group independent (each group's counters are
    an MG summary of that group's slice of the corpus, so the
    mergeable-summaries rule applies within the group — same pigeonhole
    recall proof), which is what lets the fold PARALLELIZE: the input
    is repartitioned on the ``by`` keys so each task receives all of —
    and only — its own groups' rows, no single task ever sees all
    groups (plan-pinned: the fold's mapInPandas sits over an
    `Exchange hashpartitioning(by)`, never a Coalesce-1), and the
    kernel decrements incrementally per arrow batch so per-group state
    stays <= capacity counters during the fold.  Lazy — callers decide
    whether to materialize (heavy_hitters_by localCheckpoints the
    <= groups x (capacity + 1)-row result, which is why it no longer
    needs the old "pre-filter high-cardinality by" contract)."""
    import pandas as pd

    by = list(by)
    # project to the summary triple up front: streamed sidecars carry
    # extra columns (e.g. the exactly-once sink's _batch_id partition
    # column), which must not leak into the fold's output schema
    summary = summary.select(*by, "_item", "_w")
    merged = (
        summary.filter(F.col("_item").isNotNull())
        .groupBy(*by, "_item").agg(F.sum("_w").alias("_w"))
    )
    totals_rows = (
        summary.filter(F.col("_item").isNull())
        .groupBy(*by).agg(F.sum("_w").alias("_w"))
        .select(*by, F.lit(None).cast("string").alias("_item"), "_w")
    )
    k = capacity

    def foldg(batches):
        counters: dict = {}
        for pdf in batches:
            for keys, sub in pdf.groupby(by, sort=False, dropna=False):
                kt = keys if isinstance(keys, tuple) else (keys,)
                s = counters.get(kt, pd.Series(dtype="int64")).add(
                    sub.set_index("_item")["_w"], fill_value=0)
                if len(s) > k:
                    kth = s.nlargest(k + 1).iloc[-1]
                    s = s[s > kth] - kth
                counters[kt] = s
        rows = []
        for kt, s in counters.items():
            rows += [kt + (it, int(w)) for it, w in s.items()]
        cols = list(zip(*rows)) if rows else [[] for _ in range(len(by) + 2)]
        yield pd.DataFrame(
            {c: list(v) for c, v in zip(by + ["_item", "_w"], cols)})

    folded = merged.repartition(*by).mapInPandas(foldg, summary.schema)
    return folded.unionByName(totals_rows)


def heavy_hitters_verify(
    items: DataFrame,
    summary: DataFrame,
    phi_num: int,
    phi_den: int,
) -> DataFrame:
    """The exact-verify half of `heavy_hitters`: given any candidate
    summary whose candidate set is a SUPERSET of the true phi-heavy
    items (and whose sentinel rows sum to the item total), produce the
    exact phi-heavy set with exact counts.  Output correctness does not
    depend on WHICH superset the summary holds — false candidates are
    counted and filtered out — which is what makes the streaming
    maintainer's batch-order-dependent summaries safe to serve from."""
    total = summary.filter(F.col("_item").isNull()) \
        .agg(F.sum("_w").alias("n_total"))
    cands = summary.filter(F.col("_item").isNotNull()) \
        .select("_item").distinct()
    exact = (
        items.join(F.broadcast(cands), "_item")
        .groupBy("_item").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * phi_den > phi_num * F.col("n_total"))
        .select("_item", "cnt", "n_total")
    )


def heavy_hitters_summarize(
    df: DataFrame,
    item_col: str,
    capacity: int,
    path: str,
) -> None:
    """Persist the compacted Misra-Gries candidate summary of a corpus
    as a parquet sidecar (<= capacity candidates + 1 sentinel row) —
    the batch mirror of the streaming maintainer
    (`streaming.ingest.stream_heavy_hitter_summaries`), so REPEAT batch
    callers stop re-paying the corpus MG pass on every call: build the
    summary once, then `heavy_hitters_serve` any phi coarser than the
    summary's guarantee at verify-only cost (one broadcast-filtered
    exact recount — the MG `mapInPandas` pass over the corpus is
    skipped entirely).

    The sidecar records its ``capacity`` in ``_mg.json`` (underscore
    prefix = invisible to Spark's parquet reader, the `_SUCCESS` /
    `_cuts.json` convention); serve ENFORCES capacity >=
    phi_den/phi_num against it, because a phi finer than the summary's
    recall guarantee could silently miss a true heavy hitter.  Rewrite
    (mode=overwrite) is the maintenance model — for continuous corpora
    use the streaming maintainer."""
    import json
    import os

    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    items = df.select(F.col(item_col).cast("string").alias("_item")) \
        .filter(F.col("_item").isNotNull())
    summary = mg_candidate_summary(items, capacity).transform(barrier)
    # <= capacity + 1 rows: one file is the right layout
    compact_mg_summaries(summary, capacity) \
        .coalesce(1).write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "_mg.json"), "w") as f:
        json.dump({"capacity": int(capacity)}, f)


def heavy_hitters_serve(
    df: DataFrame,
    item_col: str,
    path: str,
    phi_num: int = 1,
    phi_den: int = 100,
    verify_total: bool = True,
) -> DataFrame:
    """Exact phi-heavy hitters from a `heavy_hitters_summarize` sidecar:
    output-identical to `heavy_hitters(df, item_col, phi_num, phi_den)`
    (pytest-pinned) at verify-only cost — the candidate set comes from
    the persisted summary (<= capacity + 1 rows, broadcast), so the
    only corpus work is the exact recount scan that verify always
    needs; the MG candidate pass is never re-run.

    Contracts enforced, not documented: ``capacity >= phi_den/phi_num``
    (read from the sidecar's ``_mg.json`` — a finer phi than the
    summary's recall guarantee could drop a true heavy hitter, so it
    raises), and — by default — the corpus is THE corpus the summary
    was built over (``verify_total``: one narrow count aggregate
    compared against the sidecar's sentinel; a drifted corpus breaks
    the recall proof silently, so it raises; disable only when the
    caller owns that proof).  For corpora that grow, use the streaming
    maintainer instead of disabling the check."""
    import json
    import os

    meta_p = os.path.join(path, "_mg.json")
    if not os.path.exists(meta_p):
        raise ValueError(
            f"{path!r} has no _mg.json: not a heavy_hitters_summarize "
            "sidecar (the capacity record is required to prove the "
            "recall guarantee for the requested phi)")
    with open(meta_p) as f:
        capacity = int(json.load(f)["capacity"])
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be positive")
    if capacity < phi_den / phi_num:
        raise ValueError(
            f"sidecar capacity={capacity} < 1/phi={phi_den}/{phi_num}: "
            "the persisted summary's Misra-Gries recall guarantee is "
            "too coarse for this phi — re-summarize with capacity >= "
            f"{phi_den}/{phi_num}")
    spark = df.sparkSession
    summary = spark.read.parquet(path)
    items = df.select(F.col(item_col).cast("string").alias("_item")) \
        .filter(F.col("_item").isNotNull())
    if verify_total:
        sentinel = summary.filter(F.col("_item").isNull()) \
            .agg(F.sum("_w")).collect()[0][0] or 0
        n_items = items.count()
        if n_items != sentinel:
            raise ValueError(
                f"corpus drift: sidecar was summarized over {sentinel} "
                f"items but the DataFrame holds {n_items} — the recall "
                "guarantee only covers the summarized corpus "
                "(re-summarize, or use the streaming maintainer for "
                "growing corpora)")
    return heavy_hitters_verify(items, summary, phi_num, phi_den) \
        .withColumnRenamed("_item", item_col)


def heavy_hitters_summarize_by(
    df: DataFrame,
    by: list[str],
    item_col: str,
    capacity: int,
    path: str,
) -> None:
    """Grouped `heavy_hitters_summarize`: persist the group-wise
    compacted MG summary (<= groups x (capacity + 1) rows, written
    DISTRIBUTED — the fold's hash partitioning on the group keys is the
    layout; no coalesce, no driver collect) plus ``_mg.json`` recording
    capacity AND the group columns, so `heavy_hitters_serve_by` can
    enforce both the recall guarantee and that the caller's ``by``
    matches the summarized grouping."""
    import json
    import os

    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    by = list(by)
    items = df.select(
        *by, F.col(item_col).cast("string").alias("_item")) \
        .filter(F.col("_item").isNotNull())
    summary = mg_candidate_summary_by(items, by, capacity).transform(barrier)
    compact_mg_summaries_by(summary, by, capacity) \
        .write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "_mg.json"), "w") as f:
        json.dump({"capacity": int(capacity), "by": by}, f)


def heavy_hitters_serve_by(
    df: DataFrame,
    by: list[str],
    item_col: str,
    path: str,
    phi_num: int = 1,
    phi_den: int = 100,
    verify_total: bool = True,
) -> DataFrame:
    """Per-group exact phi-heavy hitters from a
    `heavy_hitters_summarize_by` sidecar — output-identical to
    `heavy_hitters_by` at verify-only cost (the grouped MG pass never
    re-runs).  Enforces: capacity >= phi_den/phi_num, the caller's
    ``by`` equals the summarized grouping, and — by default — corpus
    identity per group (``verify_total``: one distributed groupBy count
    full-outer-joined against the sidecar sentinels; ANY group whose
    total drifted raises — the check is distributed, so
    high-cardinality ``by`` stays scale-out like everything else on
    this path)."""
    import json
    import os

    meta_p = os.path.join(path, "_mg.json")
    if not os.path.exists(meta_p):
        raise ValueError(
            f"{path!r} has no _mg.json: not a heavy_hitters_summarize_by "
            "sidecar")
    with open(meta_p) as f:
        meta = json.load(f)
    capacity, by = int(meta["capacity"]), list(by)
    if meta.get("by") != by:
        raise ValueError(
            f"grouping mismatch: sidecar was summarized by "
            f"{meta.get('by')}, caller asked for {by} — per-group recall "
            "only holds for the summarized grouping")
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be positive")
    if capacity < phi_den / phi_num:
        raise ValueError(
            f"sidecar capacity={capacity} < 1/phi={phi_den}/{phi_num}: "
            "re-summarize with capacity >= phi_den/phi_num")
    spark = df.sparkSession
    summary = spark.read.parquet(path)
    items = df.select(
        *by, F.col(item_col).cast("string").alias("_item")) \
        .filter(F.col("_item").isNotNull())
    if verify_total:
        sent = summary.filter(F.col("_item").isNull()) \
            .groupBy(*by).agg(F.sum("_w").alias("_s"))
        now = items.groupBy(*by).agg(F.count(F.lit(1)).alias("_c"))
        # null-SAFE key equality: a NULL group key is a real group in
        # both the sentinels and the recount; a plain join would leave
        # it unmatched on both sides and report phantom drift
        cond = [sent[c].eqNullSafe(now[c]) for c in by]
        drifted = sent.join(now, cond, "full").filter(
            F.coalesce("_s", F.lit(-1)) != F.coalesce("_c", F.lit(-2))
        ).count()
        if drifted:
            raise ValueError(
                f"corpus drift: {drifted} group(s) changed size since "
                "the sidecar was summarized — the per-group recall "
                "guarantee only covers the summarized corpus "
                "(re-summarize, or use the streaming maintainer)")
    return heavy_hitters_verify_by(items, summary, by, phi_num, phi_den) \
        .withColumnRenamed("_item", item_col)


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    (plus Cramér's V effect size) — the corpus-audit answering "is
    language independent of source?", i.e. whether a mix is balanced or
    a source skews the distribution.

    Expected counts come from the marginals (E = row_total x col_total /
    N) over the FULL category cross product, zero-observed cells
    included — dropping them understates the statistic.  One count
    shuffle; marginals broadcast back; the cross product is
    |A| x |B| categories, never rows.  Returns (chi2, dof, cramers_v,
    n_rows)."""
    obs = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_o"))
    ra = obs.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    cb = obs.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    n = obs.agg(F.sum("_o").alias("_n"))
    grid = (
        ra.crossJoin(cb).crossJoin(F.broadcast(n))
        .join(obs, ["_a", "_b"], "left")
        .withColumn("_o", F.coalesce("_o", F.lit(0)))
        .withColumn("_e", F.col("_ra") * F.col("_cb") / F.col("_n"))
    )
    cells = grid.withColumn(
        "_x", (F.col("_o") - F.col("_e")) ** 2 / F.col("_e"))
    return (
        cells.agg(
            F.round(F.sum("_x"), 4).alias("chi2"),
            ((F.countDistinct("_a") - 1) * (F.countDistinct("_b") - 1))
            .cast("long").alias("dof"),
            F.round(
                F.sqrt(
                    F.sum("_x")
                    / (F.first("_n")
                       * F.least(F.countDistinct("_a") - 1,
                                 F.countDistinct("_b") - 1))
                ), 4,
            ).alias("cramers_v"),
            F.first("_n").cast("long").alias("n_rows"),
        )
    )


# Poisson(1) pmf cumulative thresholds scaled to the md5 bucket space —
# multiplicities 0..4 cover 99.6% of the mass; the tail folds into 4.
_POIS_CUM = [3679, 7358, 9197, 9810, 10_000]


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    by: str,
    id_col: str,
    n_boot: int = 32,
    alpha: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean via the
    DETERMINISTIC Poisson bootstrap — the bootstrap that distributes: no
    resample pass ever materializes an n-row sample; each row instead
    carries a Poisson(1) multiplicity per replicate, derived from
    md5(id, replicate) so the same rows produce the same interval on any
    cluster, any partitioning, any rerun.

    Returns (group, mean, ci_lo, ci_hi, n_boot) with the interval from
    the alpha/2 and 1-alpha/2 percentiles of the replicate means.  Plan:
    one explode x n_boot (the entire bootstrap cost, amortized across
    replicates in a single shuffle on (group, replicate)), a tiny
    (groups x n_boot) percentile aggregate, and a broadcast join of the
    point estimate."""
    from prql_query_spark.operators.sampling import hash_bucket

    b = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_b")
    key = F.concat(F.col(id_col).cast("string"), F.lit("|"),
                   F.col("_b").cast("string"))
    u = hash_bucket(key, seed)
    m = (
        F.when(u < _POIS_CUM[0], 0)
        .when(u < _POIS_CUM[1], 1)
        .when(u < _POIS_CUM[2], 2)
        .when(u < _POIS_CUM[3], 3)
        .otherwise(4)
    )
    rep_means = (
        df.select(F.col(by), F.col(id_col), F.col(value_col), b)
        .withColumn("_m", m)
        .groupBy(by, "_b")
        .agg(
            (F.sum(F.col(value_col) * F.col("_m")) / F.sum("_m"))
            .alias("_mean_b")
        )
    )
    ci = rep_means.groupBy(by).agg(
        F.round(F.expr(f"percentile(_mean_b, {alpha / 2})"), 4).alias("ci_lo"),
        F.round(F.expr(f"percentile(_mean_b, {1 - alpha / 2})"), 4)
        .alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_boot"),
    )
    point = df.groupBy(by).agg(F.round(F.avg(value_col), 4).alias("mean"))
    return point.join(F.broadcast(ci), by).select(
        by, "mean", "ci_lo", "ci_hi", "n_boot")


def gini_concentration(
    df: DataFrame,
    weight_col: str,
    by: str,
) -> DataFrame:
    """Gini coefficient of how ``weight_col`` mass concentrates across
    ``by`` groups (0 = perfectly even mix, ->1 = one group dominates) —
    the single-number companion to `skew_report` for corpus-mix
    dashboards, computed with the exact rank formulation
    G = (2*sum(i*w_i) / (n*sum(w)) - (n+1)/n) over groups sorted by
    weight.

    One group aggregate (tiny — one row per group), one ordered window
    over groups, one scalar aggregate.  Returns (gini, n_groups,
    total_weight)."""
    totals = df.groupBy(F.col(by)).agg(
        F.sum(F.col(weight_col).cast("double")).alias("_w"))
    w = Window.orderBy(F.col("_w").asc(), F.col(by).asc())
    ranked = totals.withColumn("_i", F.row_number().over(w))
    return ranked.agg(
        F.round(
            2.0 * F.sum(F.col("_i") * F.col("_w"))
            / (F.count(F.lit(1)) * F.sum("_w"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
            4,
        ).alias("gini"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.round(F.sum("_w"), 4).alias("total_weight"),
    )


def ks_test(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between numeric
    distributions: D = max |ECDF_a - ECDF_b|, the nonparametric drift
    test that catches shape changes PSI's fixed bins smear out.

    Returns (d_stat, at_value, n_a, n_b).  Per-side value counts, one
    full-outer merge on the value, one ordered window of running sums,
    one max aggregate — the window runs over DISTINCT values, not rows,
    so a 10^9-row column with bounded cardinality stays cheap; for
    continuous uniques consider pre-rounding."""
    ca = df_a.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_ca"))
    cb = df_b.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_cb"))
    merged = ca.join(cb, "_v", "full").select(
        "_v",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    tot = merged.agg(F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb"))
    gaps = (
        merged.crossJoin(F.broadcast(tot))
        .withColumn(
            "_gap",
            F.abs(
                F.sum("_ca").over(w) / F.col("_na")
                - F.sum("_cb").over(w) / F.col("_nb")
            ),
        )
    )
    best = gaps.orderBy(F.desc("_gap"), F.asc("_v")).limit(1)
    return best.select(
        F.round("_gap", 6).alias("d_stat"),
        F.col("_v").alias("at_value"),
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
    )


def mannwhitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U rank-sum comparison of two samples: does one
    distribution stochastically dominate the other?  Median-robust where
    the t-test is not, and the standard A/B gate for skewed metrics.

    Returns (u_stat, rank_biserial, n_a, n_b, mean_rank_a, mean_rank_b)
    with midrank tie handling; rank_biserial = 1 - 2U/(n_a n_b) in
    [-1, 1] (0 = no dominance).  One union, one rank window over pooled
    DISTINCT-ordered values, two scalar aggregates — ranks are exact
    halves, so both engines agree bit-for-bit."""
    pooled = (
        df_a.select(F.col(value_col).alias("_v"), F.lit(1).alias("_s"))
        .unionByName(
            df_b.select(F.col(value_col).alias("_v"), F.lit(0).alias("_s")))
    )
    w = Window.orderBy("_v")
    ranked = pooled.withColumn(
        "_r",
        F.rank().over(w)
        + (F.count(F.lit(1)).over(Window.partitionBy("_v")) - 1) / 2.0,
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("_s") == 1, F.col("_r"))).alias("_ra"),
        F.sum(F.when(F.col("_s") == 0, F.col("_r"))).alias("_rb"),
        F.sum("_s").alias("_na"),
        F.sum(1 - F.col("_s")).alias("_nb"),
    )
    u = F.col("_ra") - F.col("_na") * (F.col("_na") + 1) / 2.0
    return agg.select(
        F.round(u, 4).alias("u_stat"),
        F.round(1.0 - 2.0 * u / (F.col("_na") * F.col("_nb")), 4)
        .alias("rank_biserial"),
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.round(F.col("_ra") / F.col("_na"), 4).alias("mean_rank_a"),
        F.round(F.col("_rb") / F.col("_nb"), 4).alias("mean_rank_b"),
    )


def _densify_hours(hourly: DataFrame, fill: dict) -> DataFrame:
    """Left-join an hourly aggregate onto the complete
    sequence(min(bucket), max(bucket), 1 hour) axis, filling gap columns
    per ``fill``.  The axis is generated from a one-row bounds aggregate
    and has #hours rows — tiny at any data scale (a decade is ~88k
    rows), so this never touches the raw-event volume."""
    bounds = hourly.agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    axis = bounds.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    out = axis.join(hourly, "bucket", "left")
    for c, v in fill.items():
        out = out.withColumn(c, F.coalesce(F.col(c), v))
    return out


def autocorrelation(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    max_lag: int = 24,
) -> DataFrame:
    """Autocorrelation function of the hourly total series at lags
    1..``max_lag`` — the periodicity detector that says WHICH seasonal
    cycle `seasonal_decompose` should model (a daily cycle spikes at lag
    24, weekly at 168).

    Hourly totals pre-aggregate in DECIMAL (cent-exact, engine-agreeing);
    the bucket axis is DENSIFIED (sequence(min,max,1h) left-joined, gaps
    as 0) before the lag window — a row-offset lag over a sparse series
    would silently compare against the k-th prior NON-EMPTY hour, not the
    same hour k hours ago (round-3 ADVICE).  All lags come from ONE
    ordered window pass (max_lag lag() columns), and all ACF values from
    ONE aggregate of corr expressions — explode to (lag, acf) long form.
    Series length = hours, so everything after the pre-aggregation is
    tiny."""
    hourly = (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(
            ((F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
             .cast("long") / 100.0).alias("total")
        )
    )
    hourly = _densify_hours(hourly, fill={"total": F.lit(0.0)})
    w = Window.orderBy("bucket")
    lagged = hourly.select(
        "total",
        *[F.lag("total", i).over(w).alias(f"_l{i}")
          for i in range(1, max_lag + 1)],
    )
    agg = lagged.agg(*[
        F.round(F.corr("total", f"_l{i}"), 4).alias(f"_a{i}")
        for i in range(1, max_lag + 1)
    ])
    rows = F.array(*[
        F.struct(F.lit(i).alias("lag"), F.col(f"_a{i}").alias("acf"))
        for i in range(1, max_lag + 1)
    ])
    return (
        agg.select(F.explode(rows).alias("_r"))
        .select(F.col("_r.lag").cast("int").alias("lag"), "_r.acf")
    )


def period_change(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period_hours: int = 24,
) -> DataFrame:
    """Period-over-period change of the hourly total series (lag
    ``period_hours`` = day-over-day at 24, week-over-week at 168) — the
    dashboard delta every metrics page leads with, computed cent-exact.

    Returns (bucket, total, prev_total, abs_change, pct_change);
    pct_change NULL when the prior period is missing or zero.  The
    bucket axis is DENSIFIED (empty hours appear with total 0) so 'lag
    24' really means the same hour yesterday, not the 24th prior
    non-empty bucket (round-3 ADVICE).  One pre-aggregation shuffle +
    one ordered window; the axis join is over post-aggregate hour
    counts, not raw rows."""
    hourly = (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(
            ((F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
             .cast("long")).alias("_cents")
        )
    )
    hourly = _densify_hours(hourly, fill={"_cents": F.lit(0).cast("long")})
    w = Window.orderBy("bucket")
    prev = F.lag("_cents", period_hours).over(w)
    return (
        hourly.withColumn("_prev", prev)
        .select(
            "bucket",
            (F.col("_cents") / 100.0).alias("total"),
            (F.col("_prev") / 100.0).alias("prev_total"),
            ((F.col("_cents") - F.col("_prev")) / 100.0).alias("abs_change"),
            F.round(
                F.when(
                    F.col("_prev").isNotNull() & (F.col("_prev") != 0),
                    (F.col("_cents") - F.col("_prev"))
                    / F.abs(F.col("_prev").cast("double")),
                ), 6,
            ).alias("pct_change"),
        )
        .orderBy("bucket")
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """EXACT ROC-AUC via the rank statistic (the Mann-Whitney identity
    AUC = U/(P*N), tie-aware): average tied ranks (RANK + (ties-1)/2),
    then AUC = (sum of positive avg-ranks - P(P+1)/2) / (P*N).
    Halves are exact in float64 and the rank sums are integers+halves,
    so any SQL twin applying the same formula matches bit-for-bit
    after the 6-decimal DECIMAL rounding.

    Plan: ONE global rank window (a sort — same memory class as
    exact_percentiles' spilling window-sort: spills, never OOMs) plus
    one aggregate.  For monitoring at 100 TB prefer `roc_auc_bucketed`
    (histogram AUC over equidepth cuts, self-reported error bound, no
    global sort); this operator is the exact evaluation path.

    ``by`` computes per-group AUC (the segment-drift / fairness slice
    view; the rank window partitions on the groups, so no group ever
    sees another's rows).  Groups with only one class have undefined
    AUC and are EXCLUDED (same contract as ir_metrics' undefined
    queries) — check n_pos/n_neg coverage separately if absence
    matters.
    """
    groups = list(by) if by else []
    w_rank = Window.partitionBy(*groups).orderBy(score_col)
    w_tie = Window.partitionBy(*groups, score_col)
    ranked = df.select(
        *groups,
        F.col(label_col).cast("boolean").alias("_y"),
        (F.rank().over(w_rank)
         + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0).alias("_ar"))
    aggs = [
        F.sum(F.col("_y").cast("long")).alias("_p"),
        F.sum((~F.col("_y")).cast("long")).alias("_n"),
        F.sum(F.when(F.col("_y"), F.col("_ar")).otherwise(0.0)).alias("_rs"),
    ]
    agg = ranked.groupBy(*groups).agg(*aggs) if groups else ranked.agg(*aggs)
    # products in float64: _p*(_p+1) and _p*_n as int64 wrap at ~3e9
    # positives (same hazard class as auc_from_histograms'); float64 is
    # bit-identical below 2^53 (all evaluation scales) and never wraps
    pd_, nd_ = F.col("_p").cast("double"), F.col("_n").cast("double")
    auc = (F.col("_rs") - pd_ * (pd_ + 1) / 2.0) / (pd_ * nd_)
    return (
        agg.filter((F.col("_p") > 0) & (F.col("_n") > 0))
        .select(
            *groups,
            F.col("_p").alias("n_pos"), F.col("_n").alias("n_neg"),
            F.round(auc.cast("decimal(38,12)"), 6).cast("double")
            .alias("auc"))
    )


def roc_auc_bucketed(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
    buckets: int = 100,
    cuts: list[float] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """The MONITORING-SCALE path of `roc_auc` (the bucketed
    approximation its docstring routes 100 TB monitoring to): histogram
    AUC over score cuts, with a SELF-REPORTED exact error bound — no
    global sort anywhere in the plan.

    Plan: (optional) one Greenwald-Khanna aggregate for equidepth cuts
    (``cuts=None``; error <= 1/accuracy of rank), then a narrow
    bucket-assign against the broadcast cut literals, one
    map-side-combined groupBy over <= len(cuts)+1 buckets per group, and
    a window over that TINY histogram.  Contrast with the exact path's
    rank window: a single-task global sort when ungrouped.  With pinned
    ``cuts`` the per-bucket (pos, neg) counts are SUM-mergeable across
    days/partitions — the monitoring pattern is to fix the cuts once and
    merge histograms forever, which also keeps day-over-day AUC
    comparable.

    Estimate = tie-aware Mann-Whitney AUC of the COARSENED scores
    (bucket index as score): pairs across buckets are concordant in both
    (bucket(x) > bucket(y) implies x > y since a cut separates them);
    pairs within a bucket contribute 1/2 each.  The true within-bucket
    contribution per (pos, neg) pair lies in [0, 1], so

        |auc_exact - auc_bucketed| <= 0.5 * sum_b pos_b*neg_b / (P*N)

    — returned as ``err_bound``, computed EXACTLY from the histogram
    (valid for ANY cuts; equidepth merely makes it small: with balanced
    classes and B equidepth buckets it is ~1/(2B)).  Pinned by pytest
    against the exact rank path on the gate fixture.

    All AUC/bound terms are integers and exact halves (< 2^53), so plain
    SUMs are float64-exact and a SQL twin with literal ``cuts`` matches
    bit-for-bit after the 6-decimal DECIMAL rounding.  ``by`` slices use
    GLOBAL cuts (comparable across segments — the fairness-monitoring
    convention); one-class groups are excluded like the exact path.
    """
    groups = list(by) if by else []
    rows = df.select(
        *groups,
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull())
    if cuts is None:
        if buckets < 2:
            raise ValueError("buckets must be >= 2")
        fracs = [i / buckets for i in range(1, buckets)]
        got = rows.agg(
            F.percentile_approx("_s", fracs, accuracy).alias("c")
        ).collect()[0]["c"] or []
        seen: set = set()
        cuts = [float(c) for c in got
                if not (c in seen or seen.add(c))]  # dedup, order kept
        if not cuts:
            # GK returns no cuts only when there are zero non-null
            # scores, so the result is empty whatever the cuts; pin ONE
            # literal cut so the bucket-assign array stays typed (a
            # zero-argument F.array() is NullType and the `score > c`
            # comparison can fail analysis instead of returning empty).
            cuts = [0.0]
    hist = score_histogram(rows, "_s", "_y", cuts, by=groups)
    return auc_from_histograms(hist, by=groups)


def score_histogram(
    df: DataFrame,
    score_col: str,
    label_col: str,
    cuts: list[float],
    by: list[str] | None = None,
) -> DataFrame:
    """(by..., bucket, pos, neg) counts of a labeled score table under
    PINNED cuts — the SUM-mergeable building block of monitoring-scale
    AUC: histograms from disjoint slices (days, batches, partitions)
    merge by summing per-bucket counts, so AUC over any union of slices
    never rescans scores (`auc_from_histograms`).  One narrow
    bucket-assign against the broadcast cut literals + one
    map-side-combined aggregate over <= len(cuts)+1 buckets per group.

    Bucket assignment is ONE higher-order expression —
    ``1 + size(filter(cuts_array, c -> score > c))`` — not a
    len(cuts)-deep WHEN chain: the deep chain exceeds codegen method
    limits and falls back to interpreted evaluation (measured 8.4×
    slower at 99 cuts × 6M rows, 6,207 → 738 ms; outputs identical —
    the filter count IS the chain's sum, BASELINE §4.4i.6)."""
    if not cuts:
        raise ValueError(
            "cuts must be non-empty: a zero-cut histogram has one "
            "bucket (AUC is undefined) and the empty literal array is "
            "untyped — pass at least one cut (roc_auc_bucketed "
            "substitutes [0.0] on empty input)")
    groups = list(by) if by else []
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    bucket = F.lit(1) + F.size(
        F.filter(arr, lambda c: F.col(score_col) > c))
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(*groups, bucket.alias("bucket"),
                F.col(label_col).cast("boolean").alias("_y"))
        .groupBy(*groups, "bucket")
        .agg(F.sum(F.col("_y").cast("long")).alias("pos"),
             F.sum((~F.col("_y")).cast("long")).alias("neg"))
    )


def write_cuts_fingerprint(hist_dir: str, cuts: list[float]) -> None:
    """Pin a histogram sidecar's cuts: write ``_cuts.json`` (the literal
    cuts plus a sha256 of their canonical JSON) into ``hist_dir``.  The
    underscore prefix makes the file invisible to Spark's parquet
    reader (the `_SUCCESS` convention), so the sidecar keeps reading
    back clean.  If a fingerprint already exists it must MATCH —
    re-pinning different cuts over live partials is exactly the silent
    corruption this file exists to prevent, so it raises."""
    import hashlib
    import json
    import os

    canon = json.dumps([float(c) for c in cuts])
    existing = read_cuts_fingerprint(hist_dir)
    if existing is not None:
        if existing != json.loads(canon):
            raise ValueError(
                f"cuts mismatch: {hist_dir!r} is already pinned to "
                f"{len(existing)} different cuts — appending partials "
                "under new cuts would silently corrupt the served AUC "
                "(start a fresh sidecar directory instead)")
        return
    os.makedirs(hist_dir, exist_ok=True)
    payload = {"cuts": json.loads(canon),
               "sha256": hashlib.sha256(canon.encode()).hexdigest()}
    with open(os.path.join(hist_dir, "_cuts.json"), "w") as f:
        json.dump(payload, f)


def read_cuts_fingerprint(hist_dir: str) -> list[float] | None:
    """The pinned cuts of a histogram sidecar, or None if the directory
    has no ``_cuts.json`` (pre-fingerprint sidecar or not a sidecar).
    Raises on a corrupt fingerprint (hash not matching the cuts) — a
    half-written or hand-edited pin is as dangerous as a missing one."""
    import hashlib
    import json
    import os

    p = os.path.join(hist_dir, "_cuts.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        payload = json.load(f)
    cuts = [float(c) for c in payload["cuts"]]
    canon = json.dumps(cuts)
    if hashlib.sha256(canon.encode()).hexdigest() != payload.get("sha256"):
        raise ValueError(
            f"corrupt cuts fingerprint in {p!r}: sha256 does not match "
            "the cuts list — refusing to serve from an unverifiable "
            "sidecar")
    return cuts


def auc_from_histograms(
    hist: DataFrame | str,
    by: list[str] | None = None,
    cuts: list[float] | None = None,
) -> DataFrame:
    """Histogram AUC + exact error bound from (bucket, pos, neg) rows —
    the serve half of `roc_auc_bucketed`, usable directly over a
    PERSISTED sidecar of per-slice histogram partials (the streaming
    maintainer `streaming.ingest.stream_auc_histograms` appends one
    partial set per microbatch): partials for the same bucket are
    first SUMMED (mergeability is exact under pinned cuts — the merged
    histogram IS the one-pass histogram, so the streamed AUC equals the
    batch AUC bit-for-bit, pytest-pinned), then folded through the
    tie-aware Mann-Whitney identity over the <= buckets-sized table.

    Arithmetic contract: the products (pos x cumulative-neg, pos x neg)
    are computed in FLOAT64, not int64 — the bucket counts themselves
    fit int64 at any realistic scale (int64 holds 9.2e18 rows), but
    their PRODUCTS cross int64 max at ~1e10-row buckets over ~1e9
    cumulative negatives, i.e. exactly the 100 TB monitoring regime
    this operator exists for, and a non-ANSI int64 product silently
    wraps.  Float64 products never wrap; they are bit-exact below 2^53
    (every evaluation/test scale — the DECIMAL-6-rounded output is
    engine-exact there, parity-pinned), and above 2^53 carry ~1e-16
    relative error — noise against the operator's own err_bound
    (~1/(2*buckets)).  One-class groups are excluded, matching
    `roc_auc`.

    When ``hist`` is a path (str), the sidecar's pinned-cuts
    fingerprint (`_cuts.json`, written by
    `streaming.ingest.stream_auc_histograms`) is REQUIRED and — if the
    caller passes ``cuts`` — verified against the caller's cuts:
    merging partials produced under different cuts is the one way this
    operator can silently lie (bucket indices from different cuts are
    not comparable), so a missing or mismatched fingerprint raises
    instead of serving a wrong-but-plausible AUC."""
    groups = list(by) if by else []
    if isinstance(hist, str):
        spark = SparkSession.getActiveSession()
        sidecar_cuts = read_cuts_fingerprint(hist)
        if sidecar_cuts is None:
            raise ValueError(
                f"histogram sidecar {hist!r} has no _cuts.json "
                "fingerprint: cannot prove its partials share pinned "
                "cuts (write it with stream_auc_histograms, or pass a "
                "DataFrame if you accept responsibility for cut "
                "consistency)")
        if cuts is not None and [float(c) for c in cuts] != sidecar_cuts:
            raise ValueError(
                f"cuts mismatch: sidecar {hist!r} was built under "
                f"{len(sidecar_cuts)} pinned cuts that differ from the "
                f"{len(cuts)} cuts passed — AUC over mixed-cut "
                "histograms is undefined")
        hist = spark.read.parquet(hist)
    hist = hist.groupBy(*groups, "bucket").agg(
        F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    w = Window.partitionBy(*groups).orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    posd, negd = F.col("pos").cast("double"), F.col("neg").cast("double")
    contrib = hist.select(
        *groups, "pos", "neg",
        (posd * F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("double")
         + posd * negd / 2.0).alias("_u"),
        (posd * negd / 2.0).alias("_e"))
    aggs = [
        F.sum("pos").alias("_p"), F.sum("neg").alias("_n"),
        F.sum("_u").alias("_us"), F.sum("_e").alias("_es"),
    ]
    agg = contrib.groupBy(*groups).agg(*aggs) if groups \
        else contrib.agg(*aggs)
    r6 = lambda c: F.round(c.cast("decimal(38,12)"), 6).cast("double")  # noqa: E731
    pn = F.col("_p").cast("double") * F.col("_n").cast("double")
    return (
        agg.filter((F.col("_p") > 0) & (F.col("_n") > 0))
        .select(
            *groups,
            F.col("_p").alias("n_pos"), F.col("_n").alias("n_neg"),
            r6(F.col("_us") / pn).alias("auc"),
            r6(F.col("_es") / pn).alias("err_bound"))
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tie_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """EXACT average precision (PR-AUC by the step definition):
    AP = (1/P) * sum over positives of precision@rank, ranking by
    (score DESC, tie_col ASC).  The tiebreak column is REQUIRED —
    unlike the rank-statistic AUC, AP is genuinely order-dependent
    under score ties, so determinism must come from an explicit total
    order, not from luck.

    The per-positive precision terms are rationals, so the sum uses
    the ordered-fold convention (rank-sorted sequential fold) — a SQL
    twin summing the identical order matches bit-for-bit after the
    6-decimal DECIMAL rounding.  Groups with no positives are
    excluded.  Scale note: the fold collects one value per POSITIVE
    per group — evaluation-sized (judgment sets), not corpus-sized;
    this is the exact evaluation path, not a monitoring stream.
    """
    groups = list(by) if by else []
    w = Window.partitionBy(*groups).orderBy(
        F.desc(score_col), F.col(tie_col))
    ranked = df.select(
        *groups,
        F.col(label_col).cast("boolean").alias("_y"),
        F.row_number().over(w).alias("_rn"),
        F.sum(F.col(label_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cp"))
    terms = ranked.filter(F.col("_y"))
    arr = F.array_sort(F.collect_list(F.struct(
        F.col("_rn").alias("r"),
        (F.col("_cp") / F.col("_rn")).alias("v"))))
    fold = F.aggregate(F.transform(arr, lambda s: s["v"]),
                       F.lit(0.0), lambda a, x: a + x)
    aggs = [F.count(F.lit(1)).alias("_pp"), fold.alias("_apsum")]
    agg = terms.groupBy(*groups).agg(*aggs) if groups else terms.agg(*aggs)
    return agg.filter(F.col("_pp") > 0).select(
        *groups,
        F.col("_pp").alias("n_pos"),
        F.round((F.col("_apsum") / F.col("_pp")).cast("decimal(38,12)"), 6)
        .cast("double").alias("avg_precision"))
