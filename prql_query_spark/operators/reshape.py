"""Reshape operators: pivot (long->wide), unpivot (wide->long), and JSON
column extraction — the table-shape tools a training-data pipeline uses
around its aggregations.

Scale notes:

* ``pivot_wide`` REQUIRES the category list.  Spark's `pivot(col)` without
  values runs a blocking distinct job over the full input just to discover
  the column set — a wasted extra pass at 100 TB, and nondeterministic
  column order besides.  With explicit values the pivot is a single
  map-side conditional aggregation (same plan as SUM(...) FILTER per
  category) that partial-aggregates before the shuffle.
* ``unpivot_long`` is Spark's native `unpivot` (EXPAND node): row count
  multiplies by the number of melted columns but nothing shuffles.
* ``json_field`` uses `get_json_object` — JVM-side Jackson parse, no
  Python.  For repeated extraction of many fields from the same column
  prefer one `from_json` with a struct schema over N get_json_object
  calls (one parse vs N parses per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    value_col: str,
    categories: list[str],
    agg: str = "sum",
    round_to: int | None = 4,
) -> DataFrame:
    """One-pass pivot with an explicit category list (see module docstring).

    Output columns: ``group_cols + categories``; cells are ``agg(value_col)``
    over the matching rows, NULL where a group saw no such category.
    """
    agg_col = getattr(F, agg)(value_col)
    if round_to is not None:
        agg_col = F.round(agg_col, round_to)
    return df.groupBy(*group_cols).pivot(pivot_col, categories).agg(agg_col)


def unpivot_long(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "attr",
    value_name: str = "val",
) -> DataFrame:
    """Melt ``value_cols`` into (attr, val) rows; values are cast to double
    so heterogeneous numeric columns share one value column."""
    casted = df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in value_cols]
    )
    return casted.unpivot(id_cols, value_cols, var_name, value_name)


def json_field(col: Column, path: str, cast: str | None = None) -> Column:
    """Extract one field from a JSON-string column (`$.path` syntax)."""
    out = F.get_json_object(col, f"$.{path}")
    return out.cast(cast) if cast else out
