"""File-skipping on per-file column bounds, shared by the Iceberg and
Delta readers (iceberg manifests' lower/upper_bounds, Delta add-action
``stats``).  Strictly an optimization layer: callers ALWAYS re-apply
the predicate as a row filter, and every code path here is built to
only ever keep too many files, never too few.

Only types whose parquet footer statistics are exact and timezone-free
participate (int/long/float/double/date): string min/max may be
truncated by the writer, and timestamp stats are zone-adjusted — both
would risk skipping a file that holds matching rows, the one outcome
this layer must never produce.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DataType, DateType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

BOUND_TYPES = (IntegerType, LongType, FloatType, DoubleType, DateType)

_SIMPLE_CONJUNCT = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|=|<|>)\s*"
    r"(-?\d+(?:\.\d+)?|DATE\s*'[^']*'|'[^']*')\s*$", re.IGNORECASE)


def footer_bounds(md) -> tuple[dict, dict, dict]:
    """(lower, upper, null_count) per column from one parquet footer —
    typed Python values, zero extra I/O beyond the metadata object the
    caller already holds.  A column qualifies for bounds only when
    EVERY row group reports exact min/max of a safe type; null counts
    require every row group to report one."""
    import datetime

    agg: dict[str, list] = {}
    nulls: dict[str, int] = {}
    dropped: set[str] = set()
    null_dropped: set[str] = set()
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue
            st = col.statistics
            if name not in null_dropped:
                if st is not None and st.null_count is not None:
                    nulls[name] = nulls.get(name, 0) + st.null_count
                else:
                    null_dropped.add(name)
                    nulls.pop(name, None)
            if name in dropped:
                continue
            if st is None or not st.has_min_max:
                dropped.add(name)
                agg.pop(name, None)
                continue
            mn, mx = st.min, st.max
            ok = (
                (type(mn) in (int, float) and type(mx) in (int, float))
                or (isinstance(mn, datetime.date)
                    and not isinstance(mn, datetime.datetime)
                    and isinstance(mx, datetime.date)
                    and not isinstance(mx, datetime.datetime)))
            if not ok:
                dropped.add(name)
                agg.pop(name, None)
                continue
            cur = agg.get(name)
            if cur is None:
                agg[name] = [mn, mx]
            else:
                cur[0] = min(cur[0], mn)
                cur[1] = max(cur[1], mx)
    return ({k: v[0] for k, v in agg.items()},
            {k: v[1] for k, v in agg.items()},
            nulls)


def conjunctive_keep(
    spark: SparkSession,
    types: dict[str, DataType],
    file_bounds: dict[str, tuple[dict, dict]],
    where: str,
) -> set[str] | None:
    """The keys of ``file_bounds`` whose [min, max] ranges could
    satisfy ``where``, or None when the predicate offers no usable
    conjunct (callers then skip nothing).

    Conservative by construction: only a top-level conjunction of
    ``col <op> literal`` comparisons participates — parentheses, OR,
    NOT, or IS make the predicate unsplittable (None); a conjunct that
    does not parse, or references a column outside ``types``, is
    IGNORED (ignoring keeps more files); a file missing bounds for a
    referenced column passes that conjunct (`min IS NULL OR ...` in
    the rewrite).  Interval tests are evaluated by Spark SQL over a
    one-row-per-file typed frame, so literal coercion follows engine
    semantics exactly; any analysis error falls back to None.

    THE CALLER OWNS TYPE SAFETY through ``types``: include only
    columns whose (min, max) values are exact.  Parquet footer stats
    qualify for BOUND_TYPES only (string stats may be truncated,
    timestamp stats are zone-adjusted); partition VALUES from table
    metadata are exact for strings too, which is why the Delta caller
    passes string partition columns as point intervals while both
    stats callers restrict to BOUND_TYPES."""
    if re.search(r"[()]|\bor\b|\bnot\b|\bis\b", where, re.IGNORECASE):
        return None
    conjuncts = []
    for raw in re.split(r"\band\b", where, flags=re.IGNORECASE):
        m = _SIMPLE_CONJUNCT.match(raw)
        if not m:
            continue
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if col in types:
            conjuncts.append((col, op, lit))
    if not conjuncts:
        return None

    cols = sorted({c for c, _o, _l in conjuncts})
    rows = []
    for key, (lo, hi) in file_bounds.items():
        vals = []
        for c in cols:
            vals += [(lo or {}).get(c), (hi or {}).get(c)]
        rows.append(tuple([key] + vals))
    frame_schema = StructType(
        [StructField("_pq_file", StringType(), False)]
        + [StructField(f"{c}__{b}", types[c], True)
           for c in cols for b in ("min", "max")])
    tests = []
    for c, op, lit in conjuncts:
        if op in ("<", "<="):
            tests.append(f"(`{c}__min` IS NULL OR `{c}__min` {op} {lit})")
        elif op in (">", ">="):
            tests.append(f"(`{c}__max` IS NULL OR `{c}__max` {op} {lit})")
        else:  # =
            tests.append(
                f"(`{c}__min` IS NULL OR (`{c}__min` <= {lit} "
                f"AND `{c}__max` >= {lit}))")
    pdf = spark.createDataFrame(rows, frame_schema)
    try:
        return {r["_pq_file"] for r in
                pdf.filter(" AND ".join(tests)).select("_pq_file").collect()}
    except Exception:
        return None
