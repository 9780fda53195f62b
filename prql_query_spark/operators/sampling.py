"""Deterministic sampling and dataset splitting for training pipelines.

Everything is keyed on a cryptographic hash of a caller-chosen key column,
never on RNG state, so the same row lands in the same split/sample on every
run, on any cluster size, after any repartition — the property a 100 TB
training pipeline actually needs (resumability, leakage-safe splits, stable
eval sets).  Splitting by a GROUP key (user_id, source domain) rather than a
row id gives leakage-safe grouped splits for free.

Mechanics: bucket = first 8 hex chars of md5(key || ':' || seed) read as an
integer, mod `buckets`.  md5 is bit-identical everywhere (Spark, DuckDB,
Python), which is what makes these operators value-checkable against the
DuckDB oracle — `hash_bucket_sql` emits the equivalent DuckDB expression.

Scale notes: all operators here are narrow (projection + filter — no
shuffle, no RNG broadcast, no sort).  They pipeline into whatever scan
precedes them and preserve partitioning.  `df.sample()` by contrast is
nondeterministic across retries/partition counts; `TABLESAMPLE` isn't
keyed.  Reference parity: the reference has no sampling surface at all
(prql-query TODO.md lists none); this is extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, seed: int = 42, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(key || ':' || seed).

    8 hex chars = 32 bits unsigned — fits a long exactly; `conv` parses
    unsigned so Spark and DuckDB agree on every value.
    """
    s = F.concat(key.cast("string"), F.lit(f":{seed}"))
    h = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
    return h % buckets


def hash_bucket_sql(key_expr: str, seed: int = 42, buckets: int = BUCKETS) -> str:
    """DuckDB twin of `hash_bucket` (for oracle SQL construction)."""
    return (
        f"(CAST(concat('0x', substr(md5(concat(CAST({key_expr} AS VARCHAR), "
        f"':{seed}')), 1, 8)) AS BIGINT) % {buckets})"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 42,
    label_col: str = "split",
) -> DataFrame:
    """Label every row with a split name ('train'/'val'/'test'/...) by hash
    bucket.  Weights are normalized; boundaries are exact integer bucket
    counts so the split is reproducible to the row.

    Keyed on `key_col`: pass a row id for an i.i.d. split, or a group key
    (user, document source) for a leakage-safe grouped split.
    """
    total = sum(weights.values())
    b = hash_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        bound = int(round(acc / total * BUCKETS))
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(label_col, out)


def split_bounds_sql(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, upper_bucket_bound) pairs matching `hash_split`'s boundaries —
    for building the CASE expression in oracle SQL."""
    total = sum(weights.values())
    out, acc = [], 0.0
    for name in list(weights)[:-1]:
        acc += weights[name]
        out.append((name, int(round(acc / total * BUCKETS))))
    out.append((list(weights)[-1], BUCKETS))
    return out


def sample_hash(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli-by-key sample: keeps rows whose bucket falls
    below `fraction` of the hash space.  Same key → same in/out decision on
    every run (unlike `df.sample`, which re-draws per execution/retry)."""
    bound = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), seed) < bound)


def stratified_sample_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%, keep
    all 'de').  One narrow filter — the per-stratum bound is a CASE on the
    stratum column, so no per-stratum job and no shuffle."""
    b = hash_bucket(F.col(key_col), seed)
    bound = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        ub = F.lit(int(round(frac * BUCKETS)))
        bound = F.when(cond, ub) if bound is None else bound.when(cond, ub)
    bound = (
        F.lit(int(round(default_fraction * BUCKETS)))
        if bound is None
        else bound.otherwise(int(round(default_fraction * BUCKETS)))
    )
    return df.filter(b < bound)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 50,
    by: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis-Spirakis A-res):
    keep the top-k rows per group by score ln(u)/w, where u is the row's
    md5-derived uniform and w its weight — selection probability is
    proportional to weight, yet fully reproducible (same rows on every
    run / cluster size / partitioning).

    ln(u)/w is the monotone twin of the textbook u^(1/w) key and is what
    the DuckDB oracle evaluates verbatim.  One shuffle (the per-group
    window); at 100 TB use a two-level variant (per-partition top-k via
    the same score, then global top-k) — the score is stable under any
    pre-filtering, which is what makes that refinement legal.
    """
    from pyspark.sql import Window

    h = hash_bucket(F.col(key_col), seed, buckets=1 << 32)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    score = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*(by or [F.lit(1)])).orderBy(
        F.desc("_score"), F.col(key_col)
    )
    # A-res requires positive weights: w<=0 would flip/blow up the score
    # ordering silently, so such rows are excluded from the sample frame
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_score", score)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_score", "_rk")
    )


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str = "doc_id",
    seed: int = 42,
    source_col: str = "mix_source",
    epoch_col: str = "mix_epoch",
) -> DataFrame:
    """Build a training mix: for each named source, `rate` full passes over
    the data plus a deterministic fractional sample (rate 2.4 = epochs 0,1
    complete + a 40% hash-sample as epoch 2) — the standard way pretraining
    mixes up/down-weight corpora.  Rows are tagged with the source name and
    epoch index so the mix is auditable and the loader can interleave.

    The fractional pass is keyed on md5(source || ':' || key) — same row,
    same in/out decision on every run and cluster size, and independent
    decisions across sources sharing a key space.

    Scale shape: a union of narrow branches (filter + projection only —
    no shuffle, no RNG state); each full epoch is one more scan of its
    source, which is exactly the I/O the materialized mix costs anyway.
    All sources must share a schema (unionByName, no missing-column fill).
    """
    parts = []
    for name, (df, rate) in sources.items():
        if rate < 0:
            raise ValueError(f"negative rate for {name!r}: {rate}")
        n_full = int(rate)
        frac = rate - n_full
        tagged = df.withColumn(source_col, F.lit(name))
        for e in range(n_full):
            parts.append(tagged.withColumn(epoch_col, F.lit(e)))
        if frac > 0:
            key = F.concat(F.lit(f"{name}:"), F.col(key_col).cast("string"))
            bound = int(round(frac * BUCKETS))
            parts.append(
                tagged.filter(hash_bucket(key, seed) < bound)
                .withColumn(epoch_col, F.lit(n_full))
            )
    if not parts:
        raise ValueError("mix_corpora needs at least one source with rate > 0")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_bounds(
    counts: dict[str, int], alpha: float, buckets: int = BUCKETS
) -> dict[str, int]:
    """Pure math shared with the oracle: per-source keep bounds for
    temperature-weighted sampling (multilingual-pretraining style,
    q_s ∝ p_s^alpha).  Rates are normalized so the most-upweighted source
    keeps everything (downsample-only — no row duplication; combine with
    mix_corpora for >1 epochs).  Returned as integer bucket bounds so both
    engines embed IDENTICAL literals and no cross-engine float comparison
    ever happens."""
    if not 0 <= alpha <= 1:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    total = sum(counts.values())
    # sum in SORTED source order: collect() row order varies run to run,
    # and float summation order changes ulps — the oracle twin replicates
    # this exact order with list_sum(list(... ORDER BY source))
    p = {s: counts[s] / total for s in sorted(counts) if counts[s] > 0}
    z = sum(v ** alpha for v in p.values())
    ratio = {s: ((v ** alpha) / z) / v for s, v in p.items()}
    m = max(ratio.values())
    return {s: int(round(r / m * buckets)) for s, r in ratio.items()}


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.7,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted corpus rebalancing: sample source s at a rate
    proportional to p_s^(alpha-1), flattening the size distribution the
    way multilingual/multi-domain pretraining mixes do (alpha=1 keeps the
    natural mix, alpha=0 equalizes expected counts).

    Per-source counts are one aggregate (tiny result, collected — the
    scalar-agg exception); the keep decision is the usual md5 hash-bucket
    against a per-source integer bound, so the pass itself is a narrow
    filter: no shuffle, no RNG, same rows kept on every run/cluster
    size/partitioning.
    """
    counts = {r[0]: r[1] for r in df.groupBy(source_col).count().collect()}
    bounds = temperature_bounds(counts, alpha)
    key = F.concat(F.col(source_col).cast("string"), F.lit(":"),
                   F.col(key_col).cast("string"))
    b = hash_bucket(key, seed)
    bound = F.lit(0)
    for s, v in bounds.items():
        bound = F.when(F.col(source_col) == s, F.lit(v)).otherwise(bound)
    return df.filter(b < bound)


def token_budget_select(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Quality-ranked token-budget selection: walk documents from highest
    `quality_col` down (ties broken by id) and keep them until the token
    budget is filled; the document that crosses the boundary is kept, so
    the budget is always reached when the corpus allows.

    Returns (id, quality, n_tokens, cum_tokens).  One window shuffle; as
    with pack_sequences, pass `shard_col` at 100 TB to rank within shards
    (a global total order is a single-reducer sort — per-shard budgets are
    what a distributed curriculum actually uses).
    """
    from pyspark.sql import Window

    from prql_query_spark.operators.text import token_count

    part = [shard_col] if shard_col else [F.lit(1)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col("quality").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = df.select(
        F.col(id_col),
        F.col(quality_col).alias("quality"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        *([F.col(shard_col)] if shard_col else []),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    if shard_col:
        with_cum = with_cum.drop(shard_col) if shard_col not in (
            id_col, "quality") else with_cum
    # keep docs whose PRECEDING cumulative total was still under budget
    return with_cum.filter(
        F.col("cum_tokens") - F.col("n_tokens") < F.lit(budget_tokens)
    )
