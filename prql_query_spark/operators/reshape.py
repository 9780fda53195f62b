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


def union_evolve(dfs: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted (the multi-day ingestion case):
    columns are matched by name, missing columns become NULL, and numeric
    types widen to the least common type (int -> bigint -> double) instead
    of failing the union.

    Pure metadata work on the driver + per-frame cast projections — no
    shuffle at all; the union is a plan concatenation.
    """
    from pyspark.sql import functions as F

    rank = {"int": 1, "bigint": 2, "float": 3, "double": 4}
    target: dict[str, str] = {}
    order: list[str] = []
    for df in dfs:
        for name, dtype in df.dtypes:
            if name not in target:
                target[name] = dtype
                order.append(name)
            elif dtype != target[name]:
                a, b = target[name], dtype
                if a in rank and b in rank:
                    target[name] = a if rank[a] >= rank[b] else b
                elif {a, b} == {"timestamp_ntz", "timestamp"}:
                    target[name] = "timestamp"
                else:
                    raise ValueError(
                        f"union_evolve: column {name!r} has irreconcilable "
                        f"types {a} vs {b}"
                    )
    out = None
    for df in dfs:
        have = dict(df.dtypes)
        cols = [
            (F.col(c).cast(target[c]) if have[c] != target[c] else F.col(c))
            .alias(c)
            if c in have
            else F.lit(None).cast(target[c]).alias(c)
            for c in order
        ]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    return out
