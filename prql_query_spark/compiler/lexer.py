"""Lexer for the PRQL 0.6 surface (reference pins prql-compiler 0.6.1,
/root/reference/Cargo.toml:32).

Newlines and ``|`` both separate pipeline transforms.  Whether a newline is
significant depends on parser context (separator in a pipeline / sub-pipeline,
ignorable inside ``[...]`` lists), so the lexer emits NEWLINE tokens everywhere
(collapsing runs) and the parser skips them where they don't matter.
"""

from __future__ import annotations

from dataclasses import dataclass


class LexError(ValueError):
    pass


@dataclass
class Token:
    kind: str  # IDENT NUMBER STRING SSTRING FSTRING DATE OP NEWLINE EOF
    value: object
    pos: int


_TWO_CHAR_OPS = {"==", "!=", "<=", ">=", "??", "..", "->", "=>", "~="}
_ONE_CHAR_OPS = set("+-*/%=<>|,[]().:!")

_KEYWORD_OPS = {"and", "or", "not", "in"}


def lex(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)

    def push(kind: str, value, pos: int) -> None:
        toks.append(Token(kind, value, pos))

    while i < n:
        c = src[i]
        if c == "#":  # comment to end of line
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "\n":
            if toks and toks[-1].kind != "NEWLINE":
                push("NEWLINE", "\n", i)
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        # s-strings / f-strings
        if c in "sf" and i + 1 < n and src[i + 1] in "\"'":
            quote = src[i + 1]
            j = i + 2
            buf = []
            while j < n and src[j] != quote:
                if src[j] == "\\" and j + 1 < n:
                    buf.append(src[j + 1])
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise LexError(f"unterminated {c}-string at {i}")
            push("SSTRING" if c == "s" else "FSTRING", "".join(buf), i)
            i = j + 1
            continue
        if c == "`":  # quoted identifier (auto-from inserts these, main.rs:147)
            j = src.find("`", i + 1)
            if j < 0:
                raise LexError(f"unterminated ` at {i}")
            push("IDENT", src[i + 1 : j], i)
            i = j + 1
            continue
        if c in "\"'":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "\\": "\\", c: c}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            push("STRING", "".join(buf), i)
            i = j + 1
            continue
        if c == "@":  # date/time literal: @2009-01-01 or @2009-01-01T00:00:00[.ffffff]
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] in "-:.T"):
                if src[j] == "." and j + 1 < n and src[j + 1] == ".":
                    break  # don't swallow the range operator ".."
                j += 1
            lit = src[i + 1 : j]
            if not lit:
                raise LexError(f"bare @ at {i}")
            push("DATE", lit, i)
            i = j
            continue
        if c.isdigit() or (
            c == "." and i + 1 < n and src[i + 1].isdigit() and not (toks and toks[-1].kind == "NUMBER")
        ):
            j = i
            seen_dot = False
            while j < n:
                ch = src[j]
                if ch.isdigit() or ch == "_":
                    j += 1
                elif ch == "." and not seen_dot and j + 1 < n and src[j + 1] != ".":
                    # don't swallow the range operator ".."
                    seen_dot = True
                    j += 1
                elif ch in "eE" and j + 1 < n and (src[j + 1].isdigit() or src[j + 1] in "+-"):
                    seen_dot = True
                    j += 2
                else:
                    break
            text = src[i:j].replace("_", "")
            push("NUMBER", float(text) if ("." in text or "e" in text or "E" in text) else int(text), i)
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            if word in _KEYWORD_OPS:
                push("OP", word, i)
            elif word in ("true", "false"):
                push("BOOL", word == "true", i)
            elif word == "null":
                push("NULL", None, i)
            else:
                push("IDENT", word, i)
            i = j
            continue
        if src[i : i + 2] in _TWO_CHAR_OPS:
            push("OP", src[i : i + 2], i)
            i += 2
            continue
        if c in _ONE_CHAR_OPS:
            push("OP", c, i)
            i += 1
            continue
        raise LexError(f"unexpected character {c!r} at {i}")

    push("EOF", None, n)
    return toks
