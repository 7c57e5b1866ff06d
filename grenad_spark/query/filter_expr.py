"""Meilisearch filter-expression parser.

Meilisearch's `filter` search parameter is a STRING in its own little
boolean language (filter-parser crate; grammar documented in
meilisearch/filter-parser/src/lib.rs and the public filtering guide):

    comparison   attr = v | attr != v | attr > v | >= | < | <=
    range        attr lo TO hi                 (inclusive both ends)
    membership   attr IN [v1, v2, ...]         (also NOT IN)
    existence    attr EXISTS | attr NOT EXISTS
    nullness     attr IS NULL | attr IS NOT NULL
    emptiness    attr IS EMPTY | attr IS NOT EMPTY
    boolean      e AND e | e OR e | NOT e | ( e )
    values       'single' | "double" quoted, or bare words / numbers

Up to now the engine accepted raw SQL in `search_topk_filtered`
(filterable-attributes serving); this module closes the API-parity gap by
compiling the Meilisearch string into ONE ANSI-SQL boolean expression that
both execution sides accept verbatim — Spark `F.expr(...)` on the pruned
documents scan AND the DuckDB oracle. Compiling to a common SQL dialect
(instead of building a Column tree) keeps the oracle trivially identical
to the served plan: there is a single compiled artifact, not two
translations that could drift.

Scale note: the OUTPUT is a plain predicate on the documents relation, so
everything Catalyst does for hand-written filters still happens — pushdown
into the parquet scan (`PushedFilters`), partition pruning on range
predicates, and the semi-join shape of search_topk_filtered is unchanged.
The parser itself is driver-side, O(len(filter)), zero jobs.

Operator precedence matches Meilisearch: OR < AND < NOT < comparison.
`IS EMPTY` compiles to `attr = ''` (string attributes — Meilisearch's
empty-string/empty-array case; arrays are out of scope for the flat
document shape here and raise at parse time only if used with TO).
`EXISTS` compiles to `attr IS NOT NULL` (a flat column exists for every
document unless null — the faceted-JSON "missing field" case maps to SQL
NULL in a columnar layout).
"""

from __future__ import annotations

import re

__all__ = ["parse_filter", "FilterSyntaxError"]


class FilterSyntaxError(ValueError):
    """Raised on malformed Meilisearch filter strings (parse position included)."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<lbrack>\[)
      | (?P<rbrack>\])
      | (?P<comma>,)
      | (?P<op>!=|>=|<=|=|>|<)
      | (?P<squote>'(?:[^'\\]|\\.)*')
      | (?P<dquote>"(?:[^"\\]|\\.)*")
      | (?P<word>[^\s()\[\],!=><]+)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "TO", "IN", "EXISTS", "IS", "NULL", "EMPTY"}
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _tokenize(s: str) -> list[tuple[str, str, int]]:
    """(kind, text, pos) triples. kind ∈ {punct, op, str, word}."""
    out: list[tuple[str, str, int]] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == m.start():
            raise FilterSyntaxError(f"unexpected character at {i}: {s[i:i+10]!r}")
        i = m.end()
        if m.lastgroup in ("lparen", "rparen", "lbrack", "rbrack", "comma"):
            out.append(("punct", m.group(m.lastgroup), m.start()))
        elif m.lastgroup == "op":
            out.append(("op", m.group("op"), m.start()))
        elif m.lastgroup in ("squote", "dquote"):
            raw = m.group(m.lastgroup)[1:-1]
            out.append(("str", re.sub(r"\\(.)", r"\1", raw), m.start()))
        else:
            out.append(("word", m.group("word"), m.start()))
    return out


def _sql_value(kind: str, text: str) -> str:
    """SQL literal: numbers pass through, everything else single-quoted
    (quotes doubled — the one escape both Spark SQL and DuckDB share)."""
    if kind == "word" and _NUM_RE.match(text):
        return text
    return "'" + text.replace("'", "''") + "'"


class _Parser:
    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.i = 0

    def _peek(self) -> tuple[str, str, int] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str, int]:
        t = self._peek()
        if t is None:
            raise FilterSyntaxError("unexpected end of filter")
        self.i += 1
        return t

    def _kw(self, word: str) -> bool:
        """Consume a keyword (case-insensitive, unquoted words only)."""
        t = self._peek()
        if t is not None and t[0] == "word" and t[1].upper() == word:
            self.i += 1
            return True
        return False

    # OR (lowest) ------------------------------------------------------
    def parse_or(self) -> str:
        parts = [self.parse_and()]
        while self._kw("OR"):
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"

    def parse_and(self) -> str:
        parts = [self.parse_not()]
        while self._kw("AND"):
            parts.append(self.parse_not())
        return parts[0] if len(parts) == 1 else "(" + " AND ".join(parts) + ")"

    def parse_not(self) -> str:
        if self._kw("NOT"):
            return f"(NOT {self.parse_not()})"
        return self.parse_primary()

    # primary: parenthesized expr or one attribute condition -------------
    def parse_primary(self) -> str:
        t = self._peek()
        if t is None:
            raise FilterSyntaxError("unexpected end of filter")
        if t[0] == "punct" and t[1] == "(":
            self.i += 1
            inner = self.parse_or()
            c = self._next()
            if c[1] != ")":
                raise FilterSyntaxError(f"expected ')' at {c[2]}")
            return inner
        return self.parse_condition()

    def parse_condition(self) -> str:
        kind, attr, pos = self._next()
        if kind != "word" or attr.upper() in _KEYWORDS or not _IDENT_RE.match(attr):
            raise FilterSyntaxError(f"expected attribute name at {pos}: {attr!r}")

        t = self._peek()
        if t is None:
            raise FilterSyntaxError(f"dangling attribute {attr!r}")

        # attr <op> value
        if t[0] == "op":
            op = self._next()[1]
            vk, vt, vp = self._next()
            if vk not in ("word", "str"):
                raise FilterSyntaxError(f"expected value at {vp}")
            sql_op = "<>" if op == "!=" else op
            return f"{attr} {sql_op} {_sql_value(vk, vt)}"

        # attr NOT IN [...] / attr NOT EXISTS
        if t[0] == "word" and t[1].upper() == "NOT":
            self.i += 1
            if self._kw("IN"):
                return f"(NOT {self._in_list(attr)})"
            if self._kw("EXISTS"):
                return f"{attr} IS NULL"
            raise FilterSyntaxError(f"expected IN or EXISTS after NOT at {t[2]}")

        if self._kw("IN"):
            return self._in_list(attr)
        if self._kw("EXISTS"):
            return f"{attr} IS NOT NULL"

        # attr IS [NOT] NULL|EMPTY
        if self._kw("IS"):
            neg = self._kw("NOT")
            if self._kw("NULL"):
                return f"{attr} IS {'NOT ' if neg else ''}NULL"
            if self._kw("EMPTY"):
                return f"{attr} {'<>' if neg else '='} ''"
            raise FilterSyntaxError(f"expected NULL or EMPTY after IS near {attr!r}")

        # attr lo TO hi  (inclusive range)
        vk, vt, vp = self._next()
        if vk in ("word", "str"):
            if self._kw("TO"):
                hk, ht, hp = self._next()
                if hk not in ("word", "str"):
                    raise FilterSyntaxError(f"expected range end at {hp}")
                return (
                    f"{attr} BETWEEN {_sql_value(vk, vt)} AND {_sql_value(hk, ht)}"
                )
        raise FilterSyntaxError(f"expected operator after attribute at {vp}")

    def _in_list(self, attr: str) -> str:
        c = self._next()
        if c[1] != "[":
            raise FilterSyntaxError(f"expected '[' after IN at {c[2]}")
        vals: list[str] = []
        while True:
            t = self._next()
            if t[0] == "punct" and t[1] == "]":
                break
            if t[0] == "punct" and t[1] == ",":
                continue
            if t[0] not in ("word", "str"):
                raise FilterSyntaxError(f"bad IN-list element at {t[2]}")
            vals.append(_sql_value(t[0], t[1]))
        if not vals:
            # Meilisearch: `attr IN []` matches nothing
            return "FALSE"
        return f"{attr} IN ({', '.join(vals)})"


def parse_filter(expr: str) -> str:
    """Compile one Meilisearch filter string to an ANSI-SQL boolean
    expression accepted verbatim by Spark `F.expr` and DuckDB."""
    p = _Parser(expr)
    sql = p.parse_or()
    t = p._peek()
    if t is not None:
        raise FilterSyntaxError(f"trailing input at {t[2]}: {t[1]!r}")
    return sql
