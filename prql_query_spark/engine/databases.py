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

PostgreSQL attaches over `spark.read.jdbc` when the driver jar is on the
classpath — the cluster-correct path (predicate pushdown + partitioned
reads).  Without the jar it falls back to the pure-stdlib wire client
(`pgwire.py`) with the SAME partitioned topology: integer-PK tables are
range-split and each Spark task opens its own server connection inside
mapInPandas (`read_postgres_table`), so the attach works everywhere the
reference's in-process postgres_scanner does (duckdb.rs:84-107) while
staying distributed.  The reference's `?currentSchema=` handling
(duckdb.rs:87-99, default `public`) is mirrored in both paths; live
coverage in tests/test_postgres_live.py.
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


def pg_conn_parts(url: str) -> tuple[dict, str, dict]:
    """postgresql://user:pw@host:port/db?currentSchema=s&... ->
    (PgConnection kwargs, schema, extra options).  Pure/unit-testable."""
    u = urlparse(url)
    kwargs = {
        "host": u.hostname or "localhost",
        "port": u.port or 5432,
        "user": u.username or "postgres",
        "password": u.password,
        "database": (u.path or "/").lstrip("/") or None,
    }
    q = {k: v[0] for k, v in parse_qs(u.query).items()}
    schema = q.pop("currentSchema", "public")
    return kwargs, schema, q


def read_postgres_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a Postgres table through the pure-stdlib wire client (pgwire).

    Distribution model mirrors `spark.read.jdbc`'s partitioned read: with
    `partition_column` (any integer column), the driver fetches MIN/MAX
    once, splits the range into `num_partitions` predicates, and each
    Spark task opens ITS OWN server connection inside mapInPandas to scan
    only its slice — the corpus never flows through the driver.  NULL keys
    ride with the first slice, exactly like the JDBC relation.  Without a
    partition column the table is driver-collected (attach-sized tables
    only — the same topology the reference's in-process postgres_scanner
    uses for every table, duckdb.rs:84-107)."""
    from prql_query_spark.engine.pgwire import PgConnection, spark_type_for_oid

    kwargs, schema, _ = pg_conn_parts(url)
    fq = f'"{schema}"."{table}"'
    with PgConnection(**kwargs) as con:
        cols, oids, _rows = con.query(f"SELECT * FROM {fq} LIMIT 0")
        ddl = ", ".join(
            f"`{c}` {spark_type_for_oid(o)}" for c, o in zip(cols, oids))
        if partition_column is None:
            _c, _o, rows = con.query(f"SELECT * FROM {fq}")
            return spark.createDataFrame(rows, ddl)
        _c, _o, mm = con.query(
            f'SELECT MIN("{partition_column}"), MAX("{partition_column}") '
            f"FROM {fq}")
    lo, hi = mm[0]
    n = num_partitions or spark.sparkContext.defaultParallelism
    if lo is None or hi is None or n <= 1 or hi <= lo:
        preds = ["TRUE"]
    else:
        bounds = [lo + (hi - lo + 1) * i // n for i in range(n + 1)]
        preds = []
        for i in range(n):
            a, b = bounds[i], bounds[i + 1]
            if a == b:
                continue
            p = f'"{partition_column}" >= {a} AND "{partition_column}" < {b}'
            if i == 0:
                p = f'({p}) OR "{partition_column}" IS NULL'
            if i == n - 1:
                p = f'"{partition_column}" >= {a}'
            preds.append(p)

    col_list = ", ".join(f'"{c}"' for c in cols)
    names = list(cols)

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            for pred in pdf["pred"]:
                with PgConnection(**kwargs) as c:
                    _cc, _oo, rows = c.query(
                        f"SELECT {col_list} FROM {fq} WHERE {pred}")
                yield pd.DataFrame(
                    {nm: [r[i] for r in rows] for i, nm in enumerate(names)},
                    columns=names)

    pred_df = spark.createDataFrame(
        [(p,) for p in preds], "pred string").repartition(len(preds))
    return pred_df.mapInPandas(fetch, schema=ddl)


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
    except Exception as jdbc_err:
        # No JDBC jar on the classpath (Py4JJavaError ClassNotFound) — fall
        # back to the pure-stdlib wire client so the attach still works,
        # like the reference's always-available postgres_scanner.  A real
        # connection/auth failure surfaces from the fallback instead.
        try:
            return _attach_postgres_pgwire(spark, url)
        except Exception as e:
            raise DatabaseError(
                f"cannot attach {jdbc_url}: {e} (JDBC path also failed: "
                f"{jdbc_err})"
            ) from e


def _attach_postgres_pgwire(spark: SparkSession, url: str) -> list[str]:
    """Wire-client attach: discover tables, register each as a temp view.

    Tables with an integer primary key register as PARTITIONED reads
    (one connection per Spark task); the rest driver-collect.  URL options
    `partitionColumn`/`numPartitions` override the inference."""
    from prql_query_spark.engine.pgwire import PgConnection

    kwargs, schema, opts = pg_conn_parts(url)
    with PgConnection(**kwargs) as con:
        _c, _o, tables = con.query(
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE' "
            "ORDER BY table_name")
        pk = {}
        _c, _o, pkrows = con.query(
            "SELECT t.relname, a.attname FROM pg_index i "
            "JOIN pg_class t ON t.oid = i.indrelid "
            "JOIN pg_namespace n ON n.oid = t.relnamespace "
            "JOIN pg_attribute a ON a.attrelid = t.oid "
            " AND a.attnum = i.indkey[0] "
            "JOIN pg_type ty ON ty.oid = a.atttypid "
            f"WHERE i.indisprimary AND n.nspname = '{schema}' "
            "AND i.indnkeyatts = 1 AND ty.typname IN ('int2','int4','int8')")
        pk = {t: c for t, c in pkrows}
    names = []
    nparts = int(opts["numPartitions"]) if "numPartitions" in opts else None
    for (t,) in tables:
        part_col = opts.get("partitionColumn") or pk.get(t)
        _register(spark, t, read_postgres_table(
            spark, url, t, partition_column=part_col, num_partitions=nparts))
        names.append(t)
    return sorted(names)


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
