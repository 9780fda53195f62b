"""Change-data-capture / warehouse-maintenance operators.

The reference engine is a read-only query tool; a training-data warehouse
also has to MAINTAIN tables from change streams.  Without a transactional
table format in the container (Delta/Iceberg jars absent), both operators
are expressed as pure DataFrame plans over plain parquet inputs — which is
also exactly what the compaction job on a real cluster computes before it
rewrites the table.

Scale notes: each operator is ONE window/aggregate shuffle keyed on the
business key — no join, no driver-side state.  At 100 TB the change log is
partitioned by ingest date, so `updates` is a few partitions and `current`
is read pruned; AQE sizes the single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Rebuild slowly-changing-dimension (type 2) validity intervals from a
    change log: each change row becomes a version valid from its own
    timestamp until the next change for the same key (NULL = still
    current).  One window shuffle on the key; every attribute column is
    carried through untouched.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def upsert_latest(
    current: DataFrame,
    updates: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest-wins merge (SCD type 1): union the existing snapshot with the
    update batch and keep the newest row per key.  `unionByName` + one
    row_number window — the standard MERGE-into-snapshot compaction plan.
    Spark's WindowGroupLimit pushes the rank<=1 filter into each partition
    before the final selection, so only per-key winners survive the sort.
    """
    order = [F.col(ts).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    return (
        current.unionByName(updates)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
