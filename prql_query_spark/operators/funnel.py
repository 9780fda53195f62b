"""Funnel (sequential conversion) analysis over an event log.

How far does each user progress through an ordered list of step types,
where each step must occur strictly AFTER the previous one?  The classic
product-analytics operator — and a shape SQL handles badly at scale (k
chained self-joins, k shuffles).

Spark-first plan: ONE shuffle.  Events are grouped per user, sorted as an
array, and a single aggregate() fold walks the timeline advancing a
(stage, t) accumulator — the greedy earliest-match semantics every funnel
tool uses (earliest completion of step i maximizes chances for step i+1,
so greedy is optimal).  Per-user arrays are bounded by per-user activity,
not corpus size, so collect_list is safe where a cross-corpus collect
would not be.

The DuckDB oracle expresses the same semantics as chained min-after CTEs,
so the gate value-checks greedy == chained-joins equivalence too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per user: the highest funnel stage reached (0..len(steps)) and the
    timestamp of the last completed step."""
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    evs = events.filter(F.col(type_col).isin(list(steps)))
    per_user = evs.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
            )
        ).alias("_seq")
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("timestamp").alias("t"),
    )

    def _advance(acc, x):
        # clamp the index: ANSI mode would throw on element_at(steps, k+1)
        want = F.element_at(steps_lit, F.least(acc["stage"] + 1, F.lit(k)))
        ok = (
            (acc["stage"] < k)
            & (x["et"] == want)
            & (acc["t"].isNull() | (x["ts"] > acc["t"]))
        )
        return F.when(
            ok,
            F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                x["ts"].alias("t"),
            ),
        ).otherwise(acc)

    folded = F.aggregate(F.col("_seq"), init, _advance)
    return per_user.select(
        user_col,
        folded["stage"].alias("stage"),
        folded["t"].alias("reached_at"),
    )


def funnel_report(events: DataFrame, steps: list[str], **kw) -> DataFrame:
    """Stage histogram: how many users stalled at each stage."""
    return (
        funnel_stages(events, steps, **kw)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )
