"""Database attach: `--database duckdb://… | sqlite://… | postgresql://…`.

Parity surface of the reference's `-d/--database` flag
(/root/reference/src/main.rs:47-49, src/backends/duckdb.rs:75-112): register
every table of the database as a queryable relation.

Implementation is Spark-first but honest about scale: a local database FILE
(duckdb/sqlite) is by definition driver-sized, so tables are read in-process
(DuckDB's Arrow interchange / stdlib sqlite3) and handed to Spark via
`createDataFrame` — zero-copy Arrow in the DuckDB case.  That is the same
topology the reference uses (its DuckDB backend runs in-process too) and is
the right call for the CLI's "query my .duckdb file" use; a cluster-scale
source should be parquet/JDBC instead, which `load_*`/`read_source` cover.

PostgreSQL needs a live server plus a JDBC driver on the Spark classpath —
neither exists in this container, so it raises a clear error naming the
`spark.read.jdbc` path (mirrors how the reference degrades without its
postgres_scanner extension, duckdb.rs:84-107).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class DatabaseError(Exception):
    pass


def attach_database(spark: SparkSession, url: str) -> list[str]:
    """Register every table of `url` as a temp view; returns the names.

    Schemes: duckdb://path, sqlite://path, postgresql://… (clear error).
    """
    if url.startswith("duckdb://"):
        return _attach_duckdb(spark, url[len("duckdb://"):])
    if url.startswith("sqlite://"):
        return _attach_sqlite(spark, url[len("sqlite://"):])
    if url.startswith(("postgresql://", "postgres://")):
        raise DatabaseError(
            "postgresql:// needs a running server and a JDBC driver on the "
            "Spark classpath (spark.read.jdbc(url, table)); neither is "
            "available here. Export to parquet or use duckdb:///sqlite://."
        )
    raise DatabaseError(
        f"unsupported database url {url!r} (expected duckdb://, sqlite:// "
        "or postgresql://)"
    )


def _register(spark: SparkSession, name: str, df: DataFrame) -> None:
    df.createOrReplaceTempView(name)


def _attach_duckdb(spark: SparkSession, path: str) -> list[str]:
    import duckdb

    try:
        con = duckdb.connect(path, read_only=True)
    except Exception as e:
        raise DatabaseError(f"cannot open duckdb database {path!r}: {e}") from e
    names = []
    try:
        for (t,) in con.execute("SHOW TABLES").fetchall():
            arrow = con.execute(f'SELECT * FROM "{t}"').arrow()
            _register(spark, t, spark.createDataFrame(arrow))
            names.append(t)
    finally:
        con.close()
    return names


def _attach_sqlite(spark: SparkSession, path: str) -> list[str]:
    import os
    import sqlite3

    if not os.path.exists(path):
        raise DatabaseError(f"cannot open sqlite database {path!r}: no such file")
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    names = []
    try:
        tables = [
            r[0] for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type = 'table' "
                "AND name NOT LIKE 'sqlite_%' ORDER BY name"
            )
        ]
        import pandas as pd

        for t in tables:
            pdf = pd.read_sql_query(f'SELECT * FROM "{t}"', con)
            _register(spark, t, spark.createDataFrame(pdf))
            names.append(t)
    finally:
        con.close()
    return names
