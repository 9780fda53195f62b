"""Dataset profiling: ANALYZE-style per-column statistics in one pass.

The first step of any ingest/QA pipeline at scale: row count, null counts,
distinct cardinalities, numeric ranges — computed in a SINGLE aggregation
over one scan (count-distincts share the scan via Catalyst's Expand), then
pivoted to one row per column with a driver-free explode.  At 100 TB swap
`exact_distinct=False` to use HyperLogLog approx_count_distinct and the
plan loses the Expand entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, and min/max/avg as
    doubles for numeric columns (NULL for non-numeric — engines disagree on
    string formatting of extrema, and numeric ranges are what drives
    partition/layout decisions anyway)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = cols or list(fields)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c)) if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            distinct.alias(f"_nd_{c}"),
        ]
        if isinstance(fields[c], NumericType):
            aggs += [
                F.min(c).cast("double").alias(f"_min_{c}"),
                F.max(c).cast("double").alias(f"_max_{c}"),
                F.round(F.avg(c), 4).alias(f"_avg_{c}"),
            ]
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        num = isinstance(fields[c], NumericType)
        rows.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if num else F.lit(None).cast("double")).alias("min_val"),
            (F.col(f"_max_{c}") if num else F.lit(None).cast("double")).alias("max_val"),
            (F.round(F.col(f"_avg_{c}"), 4) if num else F.lit(None).cast("double")).alias("avg_val"),
        ))
    return (
        one.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


def profile_oracle_sql(table: str, cols: list[tuple[str, bool]]) -> str:
    """DuckDB twin: one UNION ALL block per (column, is_numeric)."""
    blocks = []
    for c, num in cols:
        mn = f"ROUND(CAST(MIN({c}) AS DOUBLE), 9)" if num else "CAST(NULL AS DOUBLE)"
        mx = f"ROUND(CAST(MAX({c}) AS DOUBLE), 9)" if num else "CAST(NULL AS DOUBLE)"
        av = f"ROUND(AVG({c}), 4)" if num else "CAST(NULL AS DOUBLE)"
        blocks.append(f"""
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {mn} AS min_val, {mx} AS max_val, {av} AS avg_val
FROM {table}""")
    return " UNION ALL ".join(blocks) + " ORDER BY col_name"


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations in long format (col_a, col_b, corr,
    upper triangle incl. diagonal) — the multicollinearity/feature-audit
    companion to `profile_table`.  ONE aggregate computes every pair
    (n*(n+1)/2 corr expressions over a single scan), then a literal
    explode to long — no per-pair jobs, no driver loop over data."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    agg = df.agg(*[
        F.round(F.corr(F.col(a), F.col(b)), 4).alias(f"_c_{i}")
        for i, (a, b) in enumerate(pairs)
    ])
    rows = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col(f"_c_{i}").alias("corr"),
        )
        for i, (a, b) in enumerate(pairs)
    ])
    return (
        agg.select(F.explode(rows).alias("_r"))
        .select("_r.col_a", "_r.col_b", "_r.corr")
    )


def spearman_corr(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Spearman rank correlation: Pearson over midranks, the
    monotonic-association measure that survives outliers and nonlinear
    scales (where `corr_matrix`'s Pearson reads noise).

    Midranks (rank window + per-value counts, exact halves) for each
    column, then one corr aggregate.  Returns (spearman, n_rows)."""
    ra = (F.rank().over(Window.orderBy(col_a))
          + (F.count(F.lit(1)).over(Window.partitionBy(col_a)) - 1) / 2.0)
    rb = (F.rank().over(Window.orderBy(col_b))
          + (F.count(F.lit(1)).over(Window.partitionBy(col_b)) - 1) / 2.0)
    ranked = df.select(ra.alias("_ra"), rb.alias("_rb"))
    return ranked.agg(
        F.round(F.corr("_ra", "_rb"), 4).alias("spearman"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
