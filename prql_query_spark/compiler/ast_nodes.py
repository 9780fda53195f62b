"""PL-level AST for the PRQL 0.6 surface.

Mirrors the *shape* of the reference pipeline (PRQL text -> PL -> RQ -> SQL,
stage names visible at /root/reference/src/backends/duckdb.rs:129,63-64) but is
an original Python design: the parser below produces these nodes, the resolver
in sqlgen.py lowers them to SQL layers.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


# ---------------------------------------------------------------- expressions
@dataclass
class Literal(Node):
    value: object
    kind: str  # int | float | str | bool | null | date | timestamp | time


@dataclass
class Ident(Node):
    parts: list[str]  # e.g. ["i", "invoice_date"]

    @property
    def name(self) -> str:
        return self.parts[-1]

    def __str__(self) -> str:
        return ".".join(self.parts)


@dataclass
class SString(Node):
    parts: list  # str | Node alternating


@dataclass
class FString(Node):
    parts: list  # str | Node alternating


@dataclass
class FuncCall(Node):
    name: str
    args: list = field(default_factory=list)
    named: dict = field(default_factory=dict)


@dataclass
class Binary(Node):
    op: str
    left: Node
    right: Node


@dataclass
class Unary(Node):
    op: str  # "-" | "not"
    expr: Node


@dataclass
class RangeLit(Node):
    start: Node | None
    end: Node | None


@dataclass
class CaseExpr(Node):
    arms: list  # list[(cond Node, value Node)]; cond None => else


@dataclass
class Assign(Node):
    name: str
    expr: Node


# ----------------------------------------------------------------- transforms
@dataclass
class From(Node):
    table: str
    alias: str | None = None


@dataclass
class Select(Node):
    exprs: list  # Assign | expr
    exclude: bool = False  # select ![a, b]


@dataclass
class Derive(Node):
    assigns: list  # list[Assign]


@dataclass
class Filter(Node):
    expr: Node


@dataclass
class JoinCondUsing(Node):
    col: str


@dataclass
class Join(Node):
    table: str
    alias: str | None
    side: str  # inner | left | right | full
    conds: list  # JoinCondUsing | expr


@dataclass
class Group(Node):
    keys: list  # list[Ident | Assign]
    pipeline: list  # list[Transform]


@dataclass
class Aggregate(Node):
    assigns: list  # list[Assign]


@dataclass
class SortKey(Node):
    expr: Node
    desc: bool = False


@dataclass
class Sort(Node):
    keys: list  # list[SortKey]


@dataclass
class Take(Node):
    n: int | None = None
    start: int | None = None  # 1-based inclusive
    end: int | None = None


@dataclass
class WindowT(Node):
    # frame: ("rows"|"range", lo, hi) with None = unbounded; or None = default
    kind: str  # rolling | expanding | rows | range | default
    frame: tuple | None
    pipeline: list  # list[Transform] (derive/sort inside)


@dataclass
class ListLit(Node):
    items: list


@dataclass
class Loop(Node):
    pipeline: list  # list[Transform] applied repeatedly until empty


@dataclass
class Append(Node):
    table: str
    op: str = "UNION ALL"  # UNION ALL | EXCEPT ALL | INTERSECT ALL


# ----------------------------------------------------------------- statements
@dataclass
class LetDef(Node):
    name: str
    pipeline: list | None  # list[Transform] if PRQL pipeline
    sql: SString | None = None  # let x = s"SELECT ..." (reference duckdb.rs:53-59)


@dataclass
class FuncDef(Node):
    name: str
    params: list[str]
    body: Node


@dataclass
class Query(Node):
    lets: list  # list[LetDef]
    funcs: dict  # name -> FuncDef
    pipeline: list  # list[Transform]
