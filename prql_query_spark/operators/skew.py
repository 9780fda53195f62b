"""Skew-mitigation primitives: salted aggregation and salted broadcast join.

AQE's skew-join splitting handles sort-merge skew automatically; these
helpers cover the two cases it doesn't:

* salted two-phase aggregation — a groupBy where a handful of hot keys
  (empty string, null-ish defaults, bot user-ids) would pin one reducer.
  Phase 1 aggregates (key, salt) partials, phase 2 merges per key.  Both
  phases are map-side-combinable; the hot key's work spreads over
  ``n_salts`` reducers at the cost of one extra tiny shuffle.
* salted broadcast join — replicate the SMALL side n_salts times instead
  of splitting the big side, so a skewed big-side key still lands on many
  partitions.  Only for joins where the small side fits in a broadcast.

Results are EXACTLY equal to the unsalted equivalents (value-checked in
the driver gate against a plain SQL GROUP BY oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# mergeable aggregates: (partial expr, merge expr)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """``aggs`` maps output name -> (fn, column) with fn in
    sum/count/min/max (avg = sum+count merged by the caller).

    Example::

        salted_agg(lineitem, ["l_returnflag"],
                   {"qty": ("sum", "l_quantity"), "n": ("count", "*")})
    """
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    partials = []
    merges = []
    for name, (fn, col) in aggs.items():
        partial_fn, merge_fn = _MERGEABLE[fn]
        c = F.lit(1) if col == "*" else F.col(col)
        partials.append(partial_fn(c).alias(f"_p_{name}"))
        merges.append(merge_fn(F.col(f"_p_{name}")).alias(name))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*merges)
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: salt the big side randomly,
    replicate the broadcast side across all salts.  Every output row of the
    plain join appears exactly once."""
    b = big.withColumn("_salt", (F.spark_partition_id() % n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(F.broadcast(s), on=[on, "_salt"], how=how).drop("_salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight skew diagnostics for a prospective groupBy/join key:
    the top-k heaviest keys with their row share, cumulative share, and
    the ratio to a perfectly uniform key — the numbers that decide
    between a plain shuffle, `salted_agg`, or AQE skew-join before the
    expensive job runs (a 100 TB shuffle pinned on one reducer is
    diagnosed here for the cost of one count aggregate).

    Returns (key, n_rows, share, cum_share, x_uniform) ordered heaviest
    first.  One map-side-combined count shuffle + a tiny top-k window;
    totals ride back as broadcast scalar aggregates."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"))
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return top.select(
        "key", "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(F.sum("n_rows").over(w) / F.col("_total"), 6)
        .alias("cum_share"),
        F.round(F.col("n_rows") * F.col("_n_keys") / F.col("_total"), 4)
        .alias("x_uniform"),
    ).orderBy(F.desc("n_rows"), F.asc("key"))
