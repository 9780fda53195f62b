"""High-level engine facade: sources -> PRQL -> Spark DataFrame."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from prql_query_spark.compiler import compile_prql
from prql_query_spark.engine.session import get_spark
from prql_query_spark.engine.sources import (
    auto_from,
    register_dir,
    register_sources,
)

__all__ = ["PrqlEngine", "get_spark", "register_dir", "register_sources"]


class PrqlEngine:
    """Equivalent of the reference's backend::query entry points
    (/root/reference/src/backends/datafusion.rs:18, duckdb.rs:20), on Spark.
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.source_names: list[str] = []

    def add_sources(self, sources: list[str]) -> None:
        self.source_names.extend(register_sources(self.spark, sources))

    def add_dir(self, sf_dir: str) -> None:
        self.source_names.extend(register_dir(self.spark, sf_dir))

    def query(self, prql: str) -> DataFrame:
        if self.source_names:
            prql = auto_from(prql, self.source_names[-1])
        sql = compile_prql(prql, dialect="spark")
        return self.spark.sql(sql)

    def sql(self, sql: str) -> DataFrame:
        """Raw-SQL mode (`--sql`, reference main.rs:75-77)."""
        return self.spark.sql(sql)
