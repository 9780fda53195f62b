"""Arrow-type audit of every DuckDB oracle — no Spark session needed.

The driver's correctness gate hashes TYPED cells via Arrow.  DuckDB promotes
SUM(INTEGER/BIGINT) to HUGEINT, which exports as decimal128(38,0) and fails
the hash against Spark's BIGINT even when every value is equal — the entire
round-3 red class (6 driver reds) plus 3 more latent rows this audit caught
the day it was written (x_stratified_sample, x_sessionize,
x_token_length_summary).

Rule enforced here: NO oracle may return a decimal column.  The repo's FP
convention (FIXTURES.md) pins money to DOUBLE via integer-cents; counts to
BIGINT via CAST; so any decimal that reaches the output schema is an un-cast
integer SUM (or similar promotion) waiting to go red when it rotates into
the driver window.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_no_oracle_returns_decimal(con):
    oracles = entrymod.oracle_sql()
    assert oracles, "oracle_sql() is empty?"
    offenders = []
    for name, sql in oracles.items():
        tbl = con.execute(sql).arrow()
        for f in tbl.schema:
            if pa.types.is_decimal(f.type):
                offenders.append((name, f.name, str(f.type)))
    assert not offenders, (
        "oracle columns with decimal Arrow types (un-cast integer SUM?): "
        f"{offenders}"
    )


def test_gate_would_catch_uncast_int_sum(con):
    """Negative control: prove the audit actually fires on the bug shape."""
    tbl = con.execute(
        "SELECT SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS n "
        "FROM orders"
    ).arrow()
    assert pa.types.is_decimal(tbl.schema.field("n").type)
