"""Temporal join operators the reference (and stock Spark SQL) lack.

The reference's surface has no as-of/range join (SURVEY.md §2 — its backends
would need raw SQL); these are extension-tier operators for event-stream
analytics, built scale-first:

* as-of join — implemented WITHOUT a join: both sides are unioned, hash-
  partitioned by key and sorted by time once, and the most recent right-side
  values are carried forward with `last(ignorenulls)` over a running window.
  One shuffle total, no n×m candidate explosion, no skew amplification —
  the classic union-scan formulation used by time-series stores.
* range join — interval containment via coarse time-bucket equi-join
  (each interval is exploded to the buckets it overlaps, each point to its
  bucket) so Catalyst executes a hash join on (key, bucket) instead of a
  broadcast-nested-loop over the raw inequality predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` (inclusive), per ``on`` key.  Left rows with no
    prior right row keep nulls (ASOF LEFT JOIN semantics).

    Scale: one hash shuffle on the key; the window's running frame is
    computed in a single sorted pass per partition.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    out_right = [f"{c}{suffix}" for c in right_cols] + [f"{ts}{suffix}"]
    left_cols = [c for c in left.columns]

    l_tagged = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts).alias("_r_ts"),
    )
    # right sorts before left at equal ts -> inclusive <= match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in right_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("_f_ts").alias(f"{ts}{suffix}"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket: str = "1 hour",
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``start <= ts < end`` per key, executed as a bucketed equi-join.

    Every interval is exploded to each coarse time bucket it overlaps and
    every point maps to exactly one bucket, so the physical plan is a hash
    join on (key, bucket) + residual filter — not a nested-loop over the
    inequality.  Choose ``bucket`` near the typical interval length: much
    smaller explodes intervals into many rows, much bigger inflates the
    candidate set.
    """
    import pandas as pd

    step = int(pd.Timedelta(bucket).total_seconds())
    p = points.withColumn("_bkt", F.floor(F.unix_timestamp(F.col(ts)) / step))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / step),
                F.floor((F.unix_timestamp(F.col(end)) - 1) / step),
            )
        ),
    )
    return (
        p.join(iv, on=[on, "_bkt"], how="inner")
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("_bkt")
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    unit: str = "hour",
) -> DataFrame:
    """Resample an event stream to a fixed grid per key and forward-fill
    gaps: (key, bucket, value_ff, was_gap).

    Per key the grid spans [min bucket, max bucket]; bucket value is the
    mean of observations inside it; empty buckets carry the last seen
    value forward (`last(ignorenulls)` over a running frame).

    Scale: the grid is built from the per-key span aggregate (rows =
    buckets per key, never |events| x grid), the observed-bucket agg is
    one shuffle with map-side combine, and the fill window rides the same
    (key) partitioning as the grid join.  Dense keys explode to at most
    span/step rows — bound `step` accordingly at ingest, not here.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    # mean in exact integer cents (see streaming.events.sliding_avg): the
    # 2-decimal data over small bucket counts sits exactly on round-half
    # boundaries, where float summation order and the engines' differing
    # round-at-scale paths disagree
    s_cents = (F.sum(F.col(value_col).cast("decimal(18,2)")) * 100).cast("long")
    hourly = (
        df.groupBy(F.col(key), bucket.alias("_b"))
        .agg((F.round(s_cents.cast("double") * 100 / F.count(F.lit(1)))
              / 10000).alias("_v"))
    )
    spans = hourly.groupBy(key).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("_b"),
    )
    joined = grid.join(hourly, [key, "_b"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        F.col("_b").alias("bucket"),
        F.round(F.last("_v", ignorenulls=True).over(w), 4).alias("value_ff"),
        F.col("_v").isNull().alias("was_gap"),
    )


def time_weighted_avg(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per key for irregularly sampled series: each
    sample is weighted by its holding time (seconds until the next
    sample); the final sample has no interval and is excluded — the
    standard finance/IoT aggregation where a plain AVG over-weights
    bursts.

    One shuffle (the per-key ordering); the weighted sums ride the same
    sort.  Returns (key, n_intervals, span_s, twa).
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    e = F.col(ts_col).cast("timestamp").cast("double")
    dt = F.lead(e).over(w) - e
    step = df.select(
        F.col(key), F.col(value_col).alias("_v"), dt.alias("_dt")
    ).filter(F.col("_dt").isNotNull())
    return (
        step.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(F.sum("_dt"), 3).alias("span_s"),
            F.round(F.sum(F.col("_v") * F.col("_dt")) / F.sum("_dt"), 4)
             .alias("twa"),
        )
    )
