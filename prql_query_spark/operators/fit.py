"""Per-group model fitting via Arrow grouped-map (applyInPandas).

The pattern every feature/curation pipeline eventually needs: fit a small
model per group (trend per source, calibration per shard) where the math
doesn't decompose into SQL aggregates.  This module keeps the Spark side
idiomatic: groupBy().applyInPandas — each group arrives as ONE Arrow batch
in a worker, numpy does the math, one row comes back.  The shuffle is the
same single exchange a groupBy agg would pay.

OLS itself IS SQL-expressible (regr_slope/regr_intercept), which is exactly
why it's used here: the DuckDB oracle value-checks the whole Arrow
grouped-map path — serialization, grouping, pandas batch shape — not just
the formula.  Swap `_ols` for scipy/sklearn for genuinely non-SQL fits; the
plumbing is identical.

Skew note: one group = one task.  A pathological group (billions of rows)
needs pre-aggregation or sampling before the fit; `max_rows_per_group`
guards against silent OOM by failing loudly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_trend(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    y_col: str = "value",
    max_rows_per_group: int = 50_000_000,
) -> DataFrame:
    """Per-group OLS trend of y over time: slope per DAY (x is rebased to
    the group's first timestamp so the normal equations stay conditioned),
    intercept at the group's t0, and n."""
    schema = f"{group_col} string, slope_per_day double, intercept double, n long"

    def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) > max_rows_per_group:
            raise ValueError(
                f"group {pdf[group_col].iloc[0]!r} has {len(pdf)} rows; "
                "pre-aggregate before fitting"
            )
        x = pdf["_epoch"].to_numpy(dtype="float64")
        x = (x - x.min()) / 86400.0
        y = pdf[y_col].to_numpy(dtype="float64")
        a = np.vstack([x, np.ones_like(x)]).T
        (slope, intercept), *_ = np.linalg.lstsq(a, y, rcond=None)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "slope_per_day": [slope],
             "intercept": [intercept], "n": [len(pdf)]}
        )

    # cast via TIMESTAMP so TIMESTAMP_NTZ inputs work (NTZ→double is not
    # a legal cast; NTZ→TIMESTAMP→double is)
    prepped = df.select(
        group_col,
        F.col(ts_col).cast("timestamp").cast("double").alias("_epoch"),
        y_col,
    )
    return prepped.groupBy(group_col).applyInPandas(_ols, schema)
