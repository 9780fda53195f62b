"""Property-based differential testing: random PRQL expressions compiled
from ONE source to BOTH dialects, executed on Spark and DuckDB, values
compared row-for-row.

This is the adversarial version of the fixed query corpus — hypothesis
explores operator precedence, null propagation, and case/boolean corners
the hand-written queries don't.  The grammar is kept inside the
ANSI-mode-safe subset (no division, bounded literals) so a mismatch means a
compiler bug, not an engine-semantics difference.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prql_query_spark import compile_prql

INT_COLS = ["n_nationkey", "n_regionkey"]
STR_COLS = ["n_name"]


def _ints(depth: int) -> st.SearchStrategy[str]:
    base = st.sampled_from(INT_COLS) | st.integers(-20, 20).map(str)
    if depth <= 0:
        return base
    sub = _ints(depth - 1)
    binop = st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    )
    case = st.tuples(_bools(depth - 1), sub, sub).map(
        lambda t: f"case [{t[0]} -> {t[1]}, true -> {t[2]}]"
    )
    return base | binop | case


def _bools(depth: int) -> st.SearchStrategy[str]:
    cmp_ = st.tuples(
        _ints(0), st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), _ints(0)
    ).map(lambda t: f"({t[0]} {t[1]} {t[2]})")
    if depth <= 0:
        return cmp_
    sub = _bools(depth - 1)
    logic = st.tuples(sub, st.sampled_from(["and", "or"]), sub).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    )
    neg = sub.map(lambda b: f"not {b}")
    return cmp_ | logic | neg


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    import __spark_entry__ as entry

    entry._reg(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{sf_dir}/nation.parquet'"
    )
    return spark, con


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=_ints(3))
def test_random_int_expressions_match(engines, expr):
    spark, con = engines
    prql = (
        f"from nation | derive [e = {expr}] "
        f"| select [n_nationkey, e] | sort [n_nationkey]"
    )
    spark_rows = [
        (r.n_nationkey, r.e)
        for r in spark.sql(compile_prql(prql, "spark")).collect()
    ]
    duck_rows = [
        (int(k), int(e) if e is not None else None)
        for k, e in con.execute(compile_prql(prql, "duckdb")).fetchall()
    ]
    assert spark_rows == duck_rows, f"expr: {expr}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=_bools(2))
def test_random_filters_match(engines, cond):
    spark, con = engines
    prql = f"from nation | filter {cond} | select [n_nationkey] | sort [n_nationkey]"
    spark_rows = [r.n_nationkey for r in
                  spark.sql(compile_prql(prql, "spark")).collect()]
    duck_rows = [int(k) for (k,) in
                 con.execute(compile_prql(prql, "duckdb")).fetchall()]
    assert spark_rows == duck_rows, f"cond: {cond}"
