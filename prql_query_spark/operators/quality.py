"""Data-quality operators: declarative constraint audits, blocklist
filtering, and outlier winsorization.

The reference reaches these only via raw SQL passthrough (reference
src/main.rs:75-77); here they are first-class, each with a DuckDB oracle
twin.  Constraint rules are plain SQL boolean expressions evaluated with
`F.expr`, so the SAME rule text runs on both engines — the audit cannot
drift from its oracle by construction.

Scale posture:

* constraint_audit — ONE full-scan aggregation regardless of rule count
  (every rule is a conditional-sum in the same HashAggregate); the result
  is |rules| rows, unpivoted driver-free with `stack`.
* filter_blocklist — left_anti hash join; the blocklist is the build side
  and broadcasts under the session threshold, so the corpus never
  shuffles.  This is the "remove known-bad / opted-out documents" gate of
  a training pipeline.
* winsorize — two-pass: exact per-group percentiles (one agg shuffle on
  the group key), broadcast the tiny bounds table back, clip with
  least/greatest.  At 100 TB swap `percentile` for `percentile_approx`
  and the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_audit(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate named SQL boolean constraints in one pass.

    Returns (rule, n_rows, n_violations, violation_rate); a NULL predicate
    result counts as a violation (unknown is not compliant).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, expr) in enumerate(rules.items()):
        ok = F.expr(expr)
        aggs.append(
            F.sum(F.when(ok.isNull() | ~ok, 1).otherwise(0)).alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _v{i}" for i, name in enumerate(rules)
    )
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
    )


def filter_blocklist(
    df: DataFrame, blocklist: DataFrame, key: str
) -> DataFrame:
    """Drop rows whose `key` appears in the blocklist (left_anti join —
    the standard removal gate for opt-outs / known-bad content hashes)."""
    return df.join(F.broadcast(blocklist.select(key).distinct()), key, "left_anti")


def bloom_semi_join(
    corpus: DataFrame,
    keys: DataFrame,
    corpus_col: str,
    key_col: str | None = None,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Corpus rows whose ``corpus_col`` appears in ``keys`` — the exact
    semantics of a semi-join, executed as bloom-prefilter + exact verify.

    The 100 TB membership-probe pattern (what Catalyst's runtime bloom
    join does for equi-joins, here first-class and composable): build a
    k-hash bloom of the key set with ONE tiny aggregation (positions =
    pmod(xxhash64(key, i), m), grouped bit_or per 64-bit word), collect
    the ≤ m/64-long bitmap (16 KB at the default m=2^16 — small BY
    CONSTRUCTION, like the broadcast sides elsewhere), embed it as an
    array literal, and probe the corpus with a NARROW filter — the
    corpus does not shuffle and non-members never reach the join.  A
    bloom has no false negatives, so the exact semi-join on the ~fpp
    survivors returns precisely the semi-join answer; the oracle twin is
    the plain `WHERE ... IN` — equality holds by construction, making an
    approximate structure value-checkable.

    Size m to the key cardinality (fpp ≈ (1-e^{-kn/m})^k; the default
    2^16 bits / 5 hashes holds fpp < 1% up to ~5k keys); at warehouse
    scale raise num_bits — the bitmap stays driver-tiny up to 2^26 bits
    (8 MB) and the plan shape is unchanged.
    """
    key_col = key_col or corpus_col
    if num_bits % 64 or num_bits <= 0:
        # a ragged last word would make element_at return NULL for the
        # high positions — a silent FALSE NEGATIVE, the one failure mode
        # a bloom must never have
        raise ValueError(f"num_bits must be a positive multiple of 64, "
                         f"got {num_bits}")
    m = num_bits
    words = m // 64
    # hash the STRING form on both sides: xxhash64 is type-sensitive, so
    # an int key set probing a bigint corpus column would silently miss
    uniq = keys.select(F.col(key_col).alias("_k")).distinct()
    hashed = uniq.select(F.col("_k").cast("string").alias("_s"))

    def _word(col_name: str, i: int):
        return (f"CAST(floor(pmod(xxhash64(`{col_name}`, {i}), {m}) / 64) "
                "AS INT)")

    def _mask(col_name: str, i: int):
        return (f"shiftleft(1L, CAST(pmod(xxhash64(`{col_name}`, {i}), {m})"
                " % 64 AS INT))")

    pos_structs = [
        F.struct(F.expr(_word("_s", i)).alias("w"),
                 F.expr(_mask("_s", i)).alias("b"))
        for i in range(num_hashes)
    ]
    word_rows = (
        hashed.select(F.explode(F.array(*pos_structs)).alias("s"))
        .select(F.col("s.w").alias("w"), F.col("s.b").alias("b"))
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("mask"))
        .collect()
    )
    bitmap = [0] * words
    for r in word_rows:
        bitmap[r["w"]] = r["mask"]
    bf = F.array(*[F.lit(x) for x in bitmap])
    probed = corpus.withColumn("_ps", F.col(corpus_col).cast("string"))
    hit = None
    for i in range(num_hashes):
        test = (
            F.element_at(bf, F.expr(_word("_ps", i)) + 1)
            .bitwiseAND(F.expr(_mask("_ps", i))) != 0
        )
        hit = test if hit is None else (hit & test)
    survivors = probed.filter(hit).drop("_ps")
    return survivors.join(
        F.broadcast(uniq.withColumnRenamed("_k", corpus_col)),
        corpus_col, "leftsemi",
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    by: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Clip `value_col` to its per-group [p_lo, p_hi] exact percentiles
    (continuous interpolation — matches DuckDB quantile_cont).
    Adds `<value_col>_w`; two shuffles: the percentile agg, then the
    broadcast join back (no shuffle on the fact side).
    """
    # BOTH percentiles from one buffer: percentile(col, array(lo, hi))
    # sorts the group once; two separate percentile() aggregates each
    # build and sort their own value buffer (measured 2.4 s vs 1.4 s at
    # sf0.1 — the exact-percentile buffer IS the cost of this operator).
    # A row_number-window + boundary-rank interpolation rewrite was
    # measured too (round 3): 1.53 s — the window's sort exchange costs
    # what the buffer cost, so the simpler form stays.  approx_percentile
    # is the 100 TB path when the oracle-exact contract isn't owed.
    bounds = df.groupBy(by).agg(
        F.percentile(value_col, F.array(F.lit(p_lo), F.lit(p_hi))).alias("_b"),
    ).select(by, F.col("_b")[0].alias("_lo"), F.col("_b")[1].alias("_hi"))

    return (
        df.join(F.broadcast(bounds), by)
        .withColumn(
            f"{value_col}_w",
            F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")),
        )
        .drop("_lo", "_hi")
    )


def impute_mean(
    df: DataFrame,
    value_col: str,
    by: str,
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULLs in `value_col` with the per-group mean (falling back to
    the global mean for all-NULL groups) — the standard numeric-feature
    imputation pass.

    Means are computed in exact integer cents (see the verify notes): a
    window mean over the group partition plus one scalar global mean, so
    the fact table shuffles once (the group window) and never joins.
    """
    from pyspark.sql import Window

    out_col = out_col or f"{value_col}_f"

    def cents_mean(scope: Window | None) -> "F.Column":
        s = F.sum(F.col(value_col).cast("decimal(18,2)"))
        n = F.count(value_col)
        if scope is not None:
            s, n = s.over(scope), n.over(scope)
        return F.when(
            n > 0,
            F.round((s * 100).cast("long").cast("double") * 100 / n) / 10000,
        )

    grp = cents_mean(Window.partitionBy(by))
    glob = cents_mean(Window.partitionBy())
    return df.withColumn(
        out_col, F.coalesce(F.col(value_col), grp, glob)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff between two table versions: every key classified as
    added / removed / changed / unchanged — the verification step after
    any migration, backfill, or CDC apply.

    Rows are compared by an md5 over the null-tagged compare columns
    (identical expression in the DuckDB oracle), so the full outer join
    carries ONE hash per side instead of every column; the join is the
    only shuffle and AQE handles key skew.

    Float/double columns render through DECIMAL(38,6) before hashing:
    engines disagree on bare double->string (Spark flips to E-notation at
    1e7, DuckDB at 1e15; 'Infinity' vs 'inf'), while the decimal-cast
    rendering is byte-identical on both (probed incl. -0.0).  Cost: the
    diff is blind to changes below 1e-6 — a documented tolerance, which
    is usually what a snapshot diff over money-like doubles wants anyway.

    Values OUTSIDE the decimal's range — NaN, +/-Infinity, |v| > 1e31 —
    take an escape branch instead: a chr(2)-tagged native string render.
    Without it, Spark's non-ANSI cast silently NULLs them, collapsing
    them with real NULLs (the chr(1) tag) so NULL->1e33 or NaN->Inf
    transitions would report 'unchanged'; DuckDB raises on the same
    cast.  The native renders differ across engines ('NaN' vs 'nan'),
    which is fine: hashes are only ever compared WITHIN one engine.
    """
    from pyspark.sql.types import DoubleType, FloatType

    compare_cols = compare_cols or [c for c in old.columns if c != key]
    float_cols = {
        f.name for f in old.schema.fields
        if isinstance(f.dataType, (DoubleType, FloatType))
    }

    def h(df: DataFrame, name: str) -> DataFrame:
        tagged = []
        for c in compare_cols:
            v = F.col(c)
            if c in float_cols:
                rendered = F.when(
                    F.isnan(v) | (F.abs(v) > 1e31),
                    F.concat(F.lit("\x02"), v.cast("string")),
                ).otherwise(v.cast("decimal(38,6)").cast("string"))
            else:
                rendered = v.cast("string")
            tagged.append(F.coalesce(rendered, F.lit("\x01NULL")))
        return df.select(F.col(key), F.md5(F.concat_ws("|", *tagged)).alias(name))

    o = h(old, "_ho")
    n = h(new, "_hn")
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), "added")
        .when(F.col("_hn").isNull(), "removed")
        .when(F.col("_ho") != F.col("_hn"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(F.col(key), status.alias("status"))


def scale_minmax(
    df: DataFrame,
    value_col: str,
    by: str,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group min-max feature scaling to [0, 1] (0.5 for constant
    groups, NULL passes through) — completes the prep trio with
    `winsorize` and `impute_mean`.  One window shuffle, no join-back.
    """
    from pyspark.sql import Window

    out_col = out_col or f"{value_col}_s"
    w = Window.partitionBy(by)
    lo, hi = F.min(value_col).over(w), F.max(value_col).over(w)
    scaled = F.when(hi == lo, F.lit(0.5)).otherwise(
        (F.col(value_col) - lo) / (hi - lo)
    )
    return df.withColumn(out_col, F.round(scaled, 6))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flagging by median absolute deviation:
    a row is an outlier when |x - median| > k * 1.4826 * MAD (the
    gaussian-consistent MAD scale).  Unlike z-scores, one wild value
    cannot drag the threshold — the robustness property the planted
    test pins.

    Adds `group_median`, `group_mad`, `is_outlier`.  Three aggregates'
    worth of work in two shuffle rounds (median, then MAD needs the
    median first), each joined back by broadcast — the fact side never
    shuffles.  Exact percentile(0.5), continuous interpolation, so the
    DuckDB `median`/`quantile_cont` twin matches bit-for-bit."""
    med = df.groupBy(F.col(by)).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("group_median"))
    with_med = df.join(F.broadcast(med), by)
    mad = with_med.groupBy(F.col(by)).agg(
        F.expr(f"percentile(abs({value_col} - group_median), 0.5)")
        .alias("group_mad"))
    out = with_med.join(F.broadcast(mad), by)
    thresh = F.lit(k) * F.lit(1.4826) * F.col("group_mad")
    return out.withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("group_median")) > thresh,
    )


BENFORD_P = [0.0] + [__import__("math").log10(1 + 1 / d) for d in range(1, 10)]


def benford_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-or-corrupted-numbers screen for financial/metric
    columns (organic multi-scale magnitudes follow log10(1+1/d); flat or
    spiky digit histograms flag generated data, unit bugs, or truncated
    extracts).

    Returns one row per digit 1-9: observed count, observed share,
    Benford expectation, and the per-digit chi-square contribution
    (sum it for the test statistic).  One narrow projection + one
    9-group aggregate; zero-and-null values are excluded (they have no
    leading significant digit)."""
    # first nonzero digit of the decimal string form — rounding-free,
    # and scientific notation ("1.23E-5") still leads with the mantissa
    # digit, so the same expression covers every magnitude
    digit = F.regexp_extract(
        F.abs(F.col(value_col)).cast("double").cast("string"), "[1-9]", 0
    ).cast("int")
    base = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .select(digit.alias("digit"))
        .groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    )
    total = base.agg(F.sum("n").alias("_t"))
    exp = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P[1:]]), F.col("digit"))
    return (
        base.crossJoin(F.broadcast(total))
        .select(
            "digit", "n",
            F.round(F.col("n") / F.col("_t"), 4).alias("share"),
            F.round(exp, 4).alias("benford"),
            F.round(
                (F.col("n") - exp * F.col("_t")) ** 2 / (exp * F.col("_t")), 4
            ).alias("chi2_part"),
        )
        .orderBy("digit")
    )
