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

PostgreSQL attaches over `spark.read.jdbc` — the cluster-correct path (the
JDBC relation supports predicate pushdown and partitioned reads, unlike the
reference's in-process postgres_scanner, duckdb.rs:84-107).  The reference's
`?currentSchema=` handling (duckdb.rs:87-99, default `public`) is mirrored.
Without the postgres JDBC driver jar on the Spark classpath the attach
degrades to a clear `DatabaseError` naming the jar, exactly like the
reference degrades without its postgres_scanner extension.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession


class DatabaseError(Exception):
    pass


def attach_database(spark: SparkSession, url: str) -> list[str]:
    """Register every table of `url` as a temp view; returns the names.

    Schemes: duckdb://path, sqlite://path, postgresql://user:pw@host/db.
    """
    if url.startswith("duckdb://"):
        return _attach_duckdb(spark, url[len("duckdb://"):])
    if url.startswith("sqlite://"):
        return _attach_sqlite(spark, url[len("sqlite://"):])
    if url.startswith(("postgresql://", "postgres://")):
        return _attach_postgres(spark, url)
    raise DatabaseError(
        f"unsupported database url {url!r} (expected duckdb://, sqlite:// "
        "or postgresql://)"
    )


def pg_jdbc_parts(url: str) -> tuple[str, dict, str]:
    """postgresql://user:pw@host:port/db?currentSchema=s ->
    (jdbc url, connection properties, schema).  Pure so it is unit-testable
    without a server; schema defaults to `public` like the reference
    (duckdb.rs:87-99)."""
    u = urlparse(url)
    host = u.hostname or "localhost"
    port = u.port or 5432
    db = (u.path or "/").lstrip("/")
    props = {"driver": "org.postgresql.Driver"}
    if u.username:
        props["user"] = u.username
    if u.password:
        props["password"] = u.password
    schema = parse_qs(u.query).get("currentSchema", ["public"])[0]
    return f"jdbc:postgresql://{host}:{port}/{db}", props, schema


def _attach_postgres(spark: SparkSession, url: str) -> list[str]:
    jdbc_url, props, schema = pg_jdbc_parts(url)
    tables_q = (
        "(SELECT table_name FROM information_schema.tables "
        f"WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE') AS t"
    )
    try:
        names = [
            r[0] for r in spark.read.jdbc(jdbc_url, tables_q, properties=props)
            .collect()
        ]
        for t in names:
            _register(
                spark, t,
                spark.read.jdbc(jdbc_url, f'"{schema}"."{t}"', properties=props),
            )
        return sorted(names)
    except Exception as e:  # ClassNotFound (driver jar) or connection failure
        raise DatabaseError(
            f"cannot attach {jdbc_url}: {e}. spark.read.jdbc needs the "
            "postgresql JDBC driver jar (org.postgresql:postgresql) on the "
            "Spark classpath (spark.jars.packages) and a reachable server."
        ) from e


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
