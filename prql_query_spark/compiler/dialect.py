"""SQL dialects for the compiler back-end.

The engine emits Spark SQL; the DuckDB dialect exists so the same PRQL source
can be compiled for the correctness oracle (mirrors the reference's dual
DataFusion/DuckDB backends, /root/reference/src/backends.rs:1-5).

The dialect layer also owns the s-string shim: the reference corpus embeds
DuckDB/SQLite spellings like ``STRFTIME('%Y-%m', ts)``
(/root/reference/examples/queries/invoice_totals.prql:4-5) which Spark lacks,
so raw SQL fragments are rewritten per-dialect (SURVEY.md §7.4 item 1).
"""

from __future__ import annotations

import re

# strftime → java SimpleDateFormat tokens (for Spark date_format)
_STRFTIME_TOKENS = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%j", "DDD"),
    ("%B", "MMMM"), ("%b", "MMM"), ("%A", "EEEE"), ("%a", "EEE"),
]


def strftime_to_java(fmt: str) -> str:
    for k, v in _STRFTIME_TOKENS:
        fmt = fmt.replace(k, v)
    return fmt


def _split_top_level_args(s: str) -> list[str]:
    args, depth, buf, in_str = [], 0, [], False
    for ch in s:
        if ch == "'" :
            in_str = not in_str
            buf.append(ch)
        elif in_str:
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        args.append("".join(buf).strip())
    return args


def _rewrite_calls(sql: str, fname: str, fn) -> str:
    """Find top-level calls of `fname(...)` (case-insensitive, balanced
    parens) and replace via fn(args: list[str]) -> str."""
    out = []
    i, n = 0, len(sql)
    pat = re.compile(re.escape(fname) + r"\s*\(", re.IGNORECASE)
    while i < n:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        # make sure it's not part of a longer identifier
        if m.start() > 0 and (sql[m.start() - 1].isalnum() or sql[m.start() - 1] == "_"):
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        out.append(sql[i : m.start()])
        # find matching close paren
        depth, j, in_str = 1, m.end(), False
        while j < n and depth > 0:
            c = sql[j]
            if c == "'":
                in_str = not in_str
            elif not in_str:
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
        out.append(fn(_split_top_level_args(inner)))
        i = j
    return "".join(out)


class Dialect:
    name = "ansi"

    # Wrap applied to a complete SUM(...) [OVER (...)] expression whose
    # argument is *statically integer*.  Spark's SUM(int) is BIGINT;
    # DuckDB's is HUGEINT, which exports to Arrow as decimal128(38,0) and
    # breaks typed value-hash comparison against the Spark result even when
    # every value is equal (the entire round-3 red class).  The DuckDB
    # dialect overrides this to pin BIGINT.
    int_sum_wrap = "{0}"

    def quote(self, ident: str) -> str:
        raise NotImplementedError

    def qualified(self, name: str) -> str:
        return ".".join(self.quote(p) for p in name.split("."))

    def star_except(self, cols: list[str]) -> str:
        raise NotImplementedError

    def rewrite_raw(self, sql: str) -> str:
        """Shim raw s-string / --sql fragments into this dialect."""
        return sql

    def fn_sql(self, name: str, args: list[str]) -> str | None:
        """Dialect-specific function spelling; None = use generic."""
        return None


class SparkDialect(Dialect):
    name = "spark"

    def quote(self, ident: str) -> str:
        if ident == "*":
            return "*"
        return f"`{ident}`"

    def star_except(self, cols: list[str]) -> str:
        inner = ", ".join(self.quote(c) for c in cols)
        return f"* EXCEPT ({inner})"

    def rewrite_raw(self, sql: str) -> str:
        def conv(args: list[str]) -> str:
            # STRFTIME in the corpus puts the '%...' format first
            # (invoice_totals.prql:4-5); DuckDB also allows (ts, fmt).
            fmt_idx = 0 if (args and args[0].startswith("'") and "%" in args[0]) else 1
            fmt = args[fmt_idx].strip("'")
            expr = args[1 - fmt_idx]
            return f"date_format({expr}, '{strftime_to_java(fmt)}')"

        sql = _rewrite_calls(sql, "STRFTIME", conv)
        return sql


class DuckDBDialect(Dialect):
    name = "duckdb"

    # DuckDB SUM(INTEGER/BIGINT) -> HUGEINT -> Arrow decimal128(38,0);
    # cast back to BIGINT so the oracle's Arrow schema matches Spark's.
    # Safe: a sum that overflows BIGINT would also overflow on the Spark
    # side, so the pinned type never loses values the comparison could see.
    int_sum_wrap = "CAST({0} AS BIGINT)"

    def quote(self, ident: str) -> str:
        if ident == "*":
            return "*"
        return f'"{ident}"'

    def star_except(self, cols: list[str]) -> str:
        inner = ", ".join(self.quote(c) for c in cols)
        return f"* EXCLUDE ({inner})"

    def fn_sql(self, name: str, args: list[str]) -> str | None:
        if name == "stddev":
            # Spark STDDEV = sample stddev; make DuckDB match explicitly
            return f"stddev_samp({args[0]})"
        if name == "percentile":
            # Spark PERCENTILE is continuous-interpolated; DuckDB's
            # matching spelling is quantile_cont.  args are in PRQL order
            # (`percentile 0.5 x` -> [fraction, value]).
            return f"quantile_cont({args[1]}, {args[0]})"
        if name == "approx_percentile":
            # DuckDB's sketch quantile (t-digest).  Engines use DIFFERENT
            # sketches, so approx results agree only within sketch error —
            # never put this in an exact-hash oracle row.
            return f"approx_quantile({args[1]}, {args[0]})"
        return None


DIALECTS = {"spark": SparkDialect, "duckdb": DuckDBDialect}


def get_dialect(name) -> Dialect:
    if isinstance(name, Dialect):
        return name
    return DIALECTS[name]()
