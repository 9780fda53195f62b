"""Bucketed tables: shuffle-free co-located joins for repeated big-big joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders every
night) is shuffling both sides on the key.  Writing both as bucketed tables
— hash-partitioned into the same number of buckets on the join key at WRITE
time — lets every subsequent join run with ZERO Exchange: Spark matches
bucket i to bucket i directly (SortMergeJoin reads pre-bucketed files).

This is the write-once-join-many trade: one up-front shuffle at ingest,
none per query after.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table (`saveAsTable` — bucketing
    metadata only exists in the catalog, not plain parquet paths)."""
    spark = df.sparkSession
    if mode == "overwrite":
        # a previous session may have left the managed location behind
        # without catalog metadata; saveAsTable refuses to reuse it
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
        if loc and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs the
    physical plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
