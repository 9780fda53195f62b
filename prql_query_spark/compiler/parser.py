"""Parser: PRQL 0.6 surface -> PL AST (ast_nodes).

Covers the transforms inventoried in SURVEY.md §2.A (evidence citations into
/root/reference/ are given there): from/select/derive/filter/join/group/
aggregate/sort/take/window/append, let/func statements, s-/f-strings, case,
ranges, date literals.
"""

from __future__ import annotations

from prql_query_spark.compiler import ast_nodes as A
from prql_query_spark.compiler.lexer import Token, lex


class ParseError(ValueError):
    pass


_TRANSFORM_WORDS = {
    "from", "select", "derive", "filter", "join", "group", "aggregate",
    "sort", "take", "window", "append", "union", "remove", "intersect",
}

# PRQL "functions" are curried and applied by juxtaposition (`sum total`,
# `lag 7 x`).  We parse juxtaposition only for known callables, by arity.
# User `func` definitions are added per-query.
BUILTIN_ARITY = {
    # aggregates (PRQL 0.6.1 std-lib, SURVEY.md §2.A.2)
    "sum": 1, "min": 1, "max": 1, "average": 1, "avg": 1, "stddev": 1,
    "count_distinct": 1, "any": 1, "every": 1,
    # extension aggregates (SURVEY §2.A.2 "available in Spark")
    "median": 1, "percentile": 2, "approx_count_distinct": 1,
    "approx_percentile": 2,
    # count is special-cased (0 or 1 args) in parse_call
    # window (SURVEY.md §2.A.3)
    "lag": 2, "lead": 2, "rank": 0, "row_number": 0, "dense_rank": 0,
    "first": 1, "last": 1, "cume_dist": 0, "ntile": 1, "percent_rank": 0,
    # scalar std-lib
    "abs": 1, "floor": 1, "ceil": 1, "round": 2, "sqrt": 1, "ln": 1,
    "lower": 1, "upper": 1, "length": 1, "trim": 1, "ltrim": 1, "rtrim": 1,
    "coalesce": 2, "isnull": 1,
    # explicit casts (extension; lets queries pin integer widths so Spark
    # and the DuckDB oracle agree on schemas)
    "long": 1, "int": 1, "double": 1, "string": 1,
}


class Parser:
    def __init__(self, toks: list[Token], func_arity: dict[str, int]):
        self.toks = toks
        self.i = 0
        self.func_arity = func_arity

    # ------------------------------------------------------------- utilities
    def peek(self, k: int = 0) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def at_op(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in vals

    def eat_op(self, val: str) -> None:
        t = self.next()
        if t.kind != "OP" or t.value != val:
            raise ParseError(f"expected {val!r}, got {t.kind}:{t.value!r} at {t.pos}")

    def skip_newlines(self) -> None:
        while self.peek().kind == "NEWLINE":
            self.next()

    def skip_seps(self) -> None:
        """Skip newlines and `|` (pipeline separators)."""
        while self.peek().kind == "NEWLINE" or self.at_op("|"):
            self.next()

    # ------------------------------------------------------------ statements
    def parse_query(self) -> A.Query:
        lets, funcs, pipeline = [], {}, []
        self.skip_seps()
        # optional `prql version:... target:...` header (reference prepends
        # one at src/main.rs:153-157)
        t = self.peek()
        if t.kind == "IDENT" and t.value == "prql":
            while self.peek().kind not in ("NEWLINE", "EOF"):
                self.next()
            self.skip_seps()
        while True:
            self.skip_seps()
            t = self.peek()
            if t.kind == "EOF":
                break
            if t.kind == "IDENT" and t.value == "let":
                lets.append(self.parse_let())
            elif t.kind == "IDENT" and t.value == "func":
                fd = self.parse_funcdef()
                funcs[fd.name] = fd
                self.func_arity[fd.name] = len(fd.params)
            else:
                pipeline = self.parse_pipeline(top=True)
                break
        return A.Query(lets=lets, funcs=funcs, pipeline=pipeline)

    def parse_let(self) -> A.LetDef:
        self.next()  # let
        name = self._ident_word("let name")
        self.eat_op("=")
        t = self.peek()
        if t.kind == "SSTRING":
            self.next()
            return A.LetDef(name=name, pipeline=None, sql=_parse_interp(t.value, sstring=True))
        if self.at_op("("):
            self.next()
            pipe = self.parse_pipeline(close_paren=True)
            self.eat_op(")")
            return A.LetDef(name=name, pipeline=pipe)
        pipe = self.parse_pipeline(top=False, single_line=True)
        return A.LetDef(name=name, pipeline=pipe)

    def parse_funcdef(self) -> A.FuncDef:
        self.next()  # func
        name = self._ident_word("func name")
        params = []
        while self.peek().kind == "IDENT" and not self.at_op("->"):
            params.append(self.next().value)
        self.eat_op("->")
        body = self.parse_expr()
        return A.FuncDef(name=name, params=params, body=body)

    def _ident_word(self, what: str) -> str:
        t = self.next()
        if t.kind != "IDENT":
            raise ParseError(f"expected {what}, got {t.kind}:{t.value!r} at {t.pos}")
        return t.value

    # -------------------------------------------------------------- pipeline
    def parse_pipeline(self, top: bool = False, close_paren: bool = False,
                       single_line: bool = False) -> list:
        """Parse transforms separated by NEWLINE or `|`."""
        out = []
        while True:
            if not single_line:
                self.skip_seps()
            t = self.peek()
            if t.kind == "EOF":
                break
            if close_paren and self.at_op(")"):
                break
            out.append(self.parse_transform())
            t = self.peek()
            if t.kind == "EOF":
                break
            if close_paren and self.at_op(")"):
                break
            if t.kind == "NEWLINE" or self.at_op("|"):
                if single_line and t.kind == "NEWLINE":
                    break
                self.next()
                continue
            raise ParseError(f"expected end of transform, got {t.kind}:{t.value!r} at {t.pos}")
        return out

    def parse_transform(self):
        t = self.peek()
        if t.kind != "IDENT":
            # a bare expression pipeline stage (rare) — not supported
            raise ParseError(f"expected transform, got {t.kind}:{t.value!r} at {t.pos}")
        word = t.value
        if word == "from":
            self.next()
            alias, table = self._alias_table()
            return A.From(table=table, alias=alias)
        if word == "select":
            self.next()
            exclude = False
            if self.at_op("!"):
                self.next()
                exclude = True
            exprs = self._expr_list()
            return A.Select(exprs=exprs, exclude=exclude)
        if word == "derive":
            self.next()
            return A.Derive(assigns=self._expr_list())
        if word == "filter":
            self.next()
            return A.Filter(expr=self.parse_expr())
        if word == "join":
            self.next()
            return self._parse_join()
        if word == "group":
            self.next()
            keys = self._expr_list()
            self.skip_newlines()
            self.eat_op("(")
            pipe = self.parse_pipeline(close_paren=True)
            self.eat_op(")")
            return A.Group(keys=keys, pipeline=pipe)
        if word == "aggregate":
            self.next()
            return A.Aggregate(assigns=self._expr_list())
        if word == "sort":
            self.next()
            return A.Sort(keys=self._sort_keys())
        if word == "take":
            self.next()
            e = self.parse_expr()
            if isinstance(e, A.RangeLit):
                s = e.start.value if e.start else None
                en = e.end.value if e.end else None
                return A.Take(start=s, end=en)
            if isinstance(e, A.Literal) and e.kind == "int":
                return A.Take(n=e.value)
            raise ParseError("take expects an int or range")
        if word == "window":
            self.next()
            return self._parse_window()
        if word == "loop":
            # post-0.6.1 PRQL: apply the sub-pipeline repeatedly until it
            # yields no rows; result is the union of every step
            self.next()
            self.skip_newlines()
            self.eat_op("(")
            pipe = self.parse_pipeline(close_paren=True)
            self.eat_op(")")
            return A.Loop(pipeline=pipe)
        if word in ("append", "union"):
            self.next()
            _, table = self._alias_table()
            return A.Append(table=table)
        if word in ("remove", "intersect"):
            # post-0.6.1 PRQL set ops (SURVEY §2.A #15: free in Spark)
            self.next()
            _, table = self._alias_table()
            op = "EXCEPT ALL" if word == "remove" else "INTERSECT ALL"
            return A.Append(table=table, op=op)
        # Unknown word: treat as a function-style custom transform? Not in 0.6.
        raise ParseError(f"unknown transform {word!r} at {t.pos}")

    def _alias_table(self) -> tuple[str | None, str]:
        name = self._ident_word("table name")
        alias = None
        if self.at_op("="):
            self.next()
            alias, name = name, self._ident_word("table name")
        # schema-qualified passthrough (reference src/main.rs:313-316)
        while self.at_op("."):
            self.next()
            name += "." + self._ident_word("table name part")
        return alias, name

    def _parse_join(self) -> A.Join:
        side = "inner"
        # side:left named arg may appear before the table
        if (self.peek().kind == "IDENT" and self.peek().value == "side"
                and self.peek(1).kind == "OP" and self.peek(1).value == ":"):
            self.next(); self.next()
            side = self._ident_word("join side")
        alias, table = self._alias_table()
        conds: list = []
        if self.at_op("["):
            self.next()
            self.skip_newlines()
            while not self.at_op("]"):
                if self.at_op("=="):
                    # [==col] shared-key join -> USING (invoice_totals.prql:2)
                    self.next()
                    conds.append(A.JoinCondUsing(col=self._ident_word("using column")))
                else:
                    e = self.parse_expr()
                    # bare single ident in join conds == USING (README.md:35)
                    if isinstance(e, A.Ident) and len(e.parts) == 1:
                        conds.append(A.JoinCondUsing(col=e.parts[0]))
                    else:
                        conds.append(e)
                self.skip_newlines()
                if self.at_op(","):
                    self.next()
                    self.skip_newlines()
            self.eat_op("]")
        return A.Join(table=table, alias=alias, side=side, conds=conds)

    def _parse_window(self) -> A.WindowT:
        kind, frame = "default", None
        while (self.peek().kind == "IDENT" and self.peek(1).kind == "OP"
               and self.peek(1).value == ":"):
            pname = self.next().value
            self.next()  # :
            if pname == "rolling":
                t = self.next()
                if t.kind != "NUMBER":
                    raise ParseError("rolling expects a number")
                kind, frame = "rows", (-(int(t.value) - 1), 0)
            elif pname == "expanding":
                t = self.next()  # true/false
                if t.kind == "BOOL" and t.value:
                    kind, frame = "rows", (None, 0)
            elif pname in ("rows", "range"):
                e = self._parse_signed_range()
                kind, frame = pname, e
            else:
                raise ParseError(f"unknown window parameter {pname!r}")
        self.skip_newlines()
        self.eat_op("(")
        pipe = self.parse_pipeline(close_paren=True)
        self.eat_op(")")
        return A.WindowT(kind=kind, frame=frame, pipeline=pipe)

    def _parse_signed_range(self) -> tuple:
        def side():
            if self.at_op(".."):
                return None
            neg = False
            if self.at_op("-"):
                self.next()
                neg = True
            t = self.next()
            if t.kind != "NUMBER":
                raise ParseError("range bound must be a number")
            return -int(t.value) if neg else int(t.value)

        lo = side()
        self.eat_op("..")
        hi = None
        t = self.peek()
        if t.kind == "NUMBER" or self.at_op("-"):
            hi = side()
        return (lo, hi)

    def _sort_keys(self) -> list:
        keys = []
        if self.at_op("["):
            self.next()
            self.skip_newlines()
            while not self.at_op("]"):
                keys.append(self._one_sort_key())
                self.skip_newlines()
                if self.at_op(","):
                    self.next()
                    self.skip_newlines()
            self.eat_op("]")
        else:
            keys.append(self._one_sort_key())
        return keys

    def _one_sort_key(self) -> A.SortKey:
        desc = False
        if self.at_op("-"):
            self.next()
            desc = True
        elif self.at_op("+"):
            self.next()
        return A.SortKey(expr=self.parse_expr(), desc=desc)

    def _expr_list(self) -> list:
        """`[a, b = expr, ...]` or a single item without brackets."""
        out = []
        if self.at_op("["):
            self.next()
            self.skip_newlines()
            while not self.at_op("]"):
                out.append(self._assign_or_expr())
                self.skip_newlines()
                if self.at_op(","):
                    self.next()
                    self.skip_newlines()
            self.eat_op("]")
        else:
            out.append(self._assign_or_expr())
        return out

    def _assign_or_expr(self):
        t, t1 = self.peek(), self.peek(1)
        if t.kind == "IDENT" and t1.kind == "OP" and t1.value == "=":
            # name = expr (but not ==)
            self.next(); self.next()
            return A.Assign(name=t.value, expr=self.parse_expr())
        return self.parse_expr()

    # ----------------------------------------------------------- expressions
    def parse_expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.at_op("or"):
            self.next()
            left = A.Binary("or", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.at_op("and"):
            self.next()
            left = A.Binary("and", left, self._not())
        return left

    def _not(self):
        if self.at_op("not"):
            self.next()
            return A.Unary("not", self._not())
        return self._cmp()

    def _cmp(self):
        left = self._coalesce()
        while self.at_op("==", "!=", "<", "<=", ">", ">=", "~=", "in"):
            op = self.next().value
            right = self._in_rhs() if op == "in" else self._coalesce()
            left = A.Binary(op, left, right)
        return left

    def _in_rhs(self):
        """Right side of `in`: a..b range or a [v1, v2, ...] list."""
        if self.at_op("["):
            self.next()
            items = []
            self.skip_newlines()
            while not self.at_op("]"):
                items.append(self.parse_expr())
                self.skip_newlines()
                if self.at_op(","):
                    self.next()
                    self.skip_newlines()
            self.eat_op("]")
            return A.ListLit(items=items)
        return self._range()

    def _coalesce(self):
        left = self._range()
        while self.at_op("??"):
            self.next()
            left = A.Binary("??", left, self._range())
        return left

    def _range(self):
        # a..b ranges (take, `in` ranges, date ranges)
        if self.at_op(".."):
            self.next()
            return A.RangeLit(start=None, end=self._add())
        left = self._add()
        if self.at_op(".."):
            self.next()
            t = self.peek()
            if t.kind in ("NUMBER", "DATE", "STRING", "IDENT") or self.at_op("-", "("):
                return A.RangeLit(start=left, end=self._add())
            return A.RangeLit(start=left, end=None)
        return left

    def _add(self):
        left = self._mul()
        while self.at_op("+", "-"):
            op = self.next().value
            left = A.Binary(op, left, self._mul())
        return left

    def _mul(self):
        left = self._unary()
        while self.at_op("*", "/", "%"):
            op = self.next().value
            left = A.Binary(op, left, self._unary())
        return left

    def _unary(self):
        if self.at_op("-"):
            self.next()
            return A.Unary("-", self._unary())
        if self.at_op("+"):
            self.next()
            return self._unary()
        return self._call()

    def _call(self):
        t = self.peek()
        if t.kind == "IDENT":
            name = t.value
            if name == "count":
                # count | count x  (README.md:205 uses bare `count`)
                self.next()
                if self._atom_follows():
                    return A.FuncCall("count", [self._atom()])
                return A.FuncCall("count", [])
            if name in ("case", "switch"):
                self.next()
                return self._case()
            arity = self.func_arity.get(name)
            if arity is not None:
                if arity == 0:
                    self.next()
                    return A.FuncCall(name, [])
                if not self._is_plain_column_ref():
                    self.next()
                    try:
                        args = [self._atom() for _ in range(arity)]
                    except ParseError as exc:
                        raise ParseError(
                            f"{name} expects {arity} argument"
                            f"{'s' if arity != 1 else ''} "
                            f"(e.g. `lag 7 x`, `percentile 0.5 x`): {exc}"
                        ) from exc
                    return A.FuncCall(name, args)
        return self._atom()

    def _is_plain_column_ref(self) -> bool:
        """`avg` as last token of an expression (no atom follows) is a column."""
        save = self.i
        self.next()
        follows = self._atom_follows()
        self.i = save
        return not follows

    def _atom_follows(self) -> bool:
        t = self.peek()
        if t.kind in ("NUMBER", "STRING", "SSTRING", "FSTRING", "DATE", "IDENT",
                      "BOOL", "NULL"):
            return True
        return self.at_op("(")

    def _case(self):
        self.eat_op("[")
        self.skip_newlines()
        arms = []
        while not self.at_op("]"):
            cond = self.parse_expr()
            if self.at_op("->") or self.at_op("=>"):
                self.next()
            val = self.parse_expr()
            if isinstance(cond, A.Literal) and cond.kind == "bool" and cond.value:
                arms.append((None, val))
            elif isinstance(cond, A.Ident) and str(cond) == "_":
                arms.append((None, val))
            else:
                arms.append((cond, val))
            self.skip_newlines()
            if self.at_op(","):
                self.next()
                self.skip_newlines()
        self.eat_op("]")
        return A.CaseExpr(arms=arms)

    def _atom(self):
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return A.Literal(t.value, "float" if isinstance(t.value, float) else "int")
        if t.kind == "STRING":
            self.next()
            return A.Literal(t.value, "str")
        if t.kind == "BOOL":
            self.next()
            return A.Literal(t.value, "bool")
        if t.kind == "NULL":
            self.next()
            return A.Literal(None, "null")
        if t.kind == "DATE":
            self.next()
            kind = "timestamp" if "T" in t.value or ":" in t.value else "date"
            if ":" in t.value and "-" not in t.value:
                kind = "time"
            return A.Literal(t.value.replace("T", " "), kind)
        if t.kind == "SSTRING":
            self.next()
            return _parse_interp(t.value, sstring=True)
        if t.kind == "FSTRING":
            self.next()
            return _parse_interp(t.value, sstring=False)
        if t.kind == "IDENT":
            self.next()
            parts = [t.value]
            while self.at_op(".") and self.peek(1).kind in ("IDENT",) or (
                self.at_op(".") and self.peek(1).kind == "OP" and self.peek(1).value == "*"
            ):
                self.next()
                nxt = self.next()
                parts.append("*" if nxt.value == "*" else nxt.value)
            return A.Ident(parts)
        if self.at_op("("):
            self.next()
            self.skip_newlines()
            e = self.parse_expr()
            # expression-level pipe: (x | in a..b) etc.
            while True:
                self.skip_newlines()
                if self.at_op("|"):
                    self.next()
                    self.skip_newlines()
                    if self.at_op("in"):
                        # (x | in a..b) -> BETWEEN; (x | in [a, b]) -> IN
                        self.next()
                        e = A.Binary("in", e, self._in_rhs())
                        continue
                    rhs = self.parse_expr()
                    e = _apply_pipe(e, rhs)
                    continue
                break
            self.eat_op(")")
            return e
        raise ParseError(f"unexpected {t.kind}:{t.value!r} at {t.pos}")


def _apply_pipe(value, func_expr):
    """(x | f a b) applies f with x appended as the last argument."""
    if isinstance(func_expr, A.FuncCall):
        return A.FuncCall(func_expr.name, func_expr.args + [value], func_expr.named)
    if isinstance(func_expr, A.Ident):
        return A.FuncCall(str(func_expr), [value])
    raise ParseError("right side of expression pipe must be a function")


def _parse_interp(raw: str, sstring: bool):
    """Split `...{expr}...` into parts; exprs are parsed as PRQL expressions."""
    parts: list = []
    buf = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == "{":
            j = raw.find("}", i + 1)
            if j < 0:
                raise ParseError("unterminated { in interpolated string")
            if buf:
                parts.append("".join(buf))
                buf = []
            inner = raw[i + 1 : j].strip()
            toks = lex(inner)
            p = Parser(toks, dict(BUILTIN_ARITY))
            parts.append(p.parse_expr())
            i = j + 1
        else:
            buf.append(c)
            i += 1
    if buf:
        parts.append("".join(buf))
    return A.SString(parts) if sstring else A.FString(parts)


def parse(src: str) -> A.Query:
    toks = lex(src)
    return Parser(toks, dict(BUILTIN_ARITY)).parse_query()
