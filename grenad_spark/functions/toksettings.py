"""Custom tokenizer settings — Meilisearch's `separatorTokens`,
`nonSeparatorTokens` (v1.4) and `dictionary` (v1.4) index settings
(docs.meilisearch.com/reference/api/settings; charabia applies them as
segmenter overrides before any word DB is written).

ONE spec compiles three ways, all from the same normalized pipeline
(lower -> separator-token replaces -> one alternation extract):

- a PySpark Column (JVM regexp_extract_all, whole-stage codegen) feeding
  the index build,
- a DuckDB expression string for the oracle (an INDEPENDENT regex engine
  over the document side — the cross-check that matters),
- a pure-Python tokenizer for driver-side query strings (queries are
  literals; engine and oracle must agree on them by construction, the
  filter-DSL philosophy).

Semantics (deterministic, documented subset of charabia):
- base kept-character class is [a-z0-9]; each single-char
  non_separator_token joins it (so `-` makes `merge-sort` one word);
- each separator_token string is replaced by a space BEFORE extraction
  (so an alnum-bearing separator like `-big-` splits even through
  non-separator chars);
- each dictionary entry is a leftmost-first alternation branch ahead of
  the kept-run, so `c++` survives as one token even when `+` separates
  (entries sorted longest-first; Java regex, RE2 and Python `re` all
  report the same leftmost-first alternation match).

The reference stores opaque byte keys (src/lib.rs:31) — tokenizer
settings only change the key stream fed to the Sorter analog, nothing
downstream of build_segments.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_KEPT_BASE = "a-z0-9"
# chars needing a backslash inside/outside a character class, valid and
# identical in Java regex, RE2 and Python re
_SPECIALS = set("\\^$.|?*+()[]{}-")


def _esc(ch: str) -> str:
    return "\\" + ch if ch in _SPECIALS else ch


def _esc_literal(s: str) -> str:
    return "".join(_esc(c) for c in s)


@dataclass(frozen=True)
class TokenizerSettings:
    """Validated, lowercase-normalized tokenizer override set."""

    separator_tokens: tuple[str, ...] = ()
    non_separator_tokens: tuple[str, ...] = ()
    dictionary: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        object.__setattr__(
            self, "separator_tokens",
            tuple(s.lower() for s in self.separator_tokens),
        )
        object.__setattr__(
            self, "non_separator_tokens",
            tuple(c.lower() for c in self.non_separator_tokens),
        )
        object.__setattr__(
            self, "dictionary", tuple(d.lower() for d in self.dictionary)
        )
        for s in self.separator_tokens:
            if not s:
                raise ValueError("empty separator token")
            if "'" in s:
                raise ValueError("separator tokens may not contain quotes")
        for c in self.non_separator_tokens:
            if len(c) != 1:
                raise ValueError(
                    f"non-separator tokens are single characters, got {c!r}"
                )
            if re.fullmatch("[a-z0-9]", c):
                raise ValueError(f"{c!r} is already a word character")
            if c == "'":
                raise ValueError("quote cannot be a non-separator")
        for d in self.dictionary:
            if not d:
                raise ValueError("empty dictionary entry")
            if "'" in d:
                raise ValueError("dictionary entries may not contain quotes")

    # -- compiled artifacts -------------------------------------------------

    def pattern(self) -> str:
        """The alternation: dictionary entries (longest first) ahead of one
        kept-character run. Identical match semantics in Java/RE2/re."""
        kept = _KEPT_BASE + "".join(_esc(c) for c in self.non_separator_tokens)
        branches = [
            _esc_literal(d)
            for d in sorted(set(self.dictionary), key=lambda d: (-len(d), d))
        ]
        branches.append(f"[{kept}]+")
        return "|".join(branches)

    def tag(self) -> str:
        """Deterministic 10-hex tag for index paths / manifest."""
        spec = repr((self.separator_tokens, self.non_separator_tokens,
                     self.dictionary))
        return hashlib.sha256(spec.encode()).hexdigest()[:10]

    # -- the three dialects -------------------------------------------------

    def py_tokens(self, text: str) -> list[str]:
        """Driver-side tokenizer (query strings)."""
        t = text.lower()
        for s in self.separator_tokens:
            t = t.replace(s, " ")
        return re.findall(self.pattern(), t)

    def tokens_col(self, col: Column | str) -> Column:
        """array<string> token column — pure JVM exprs (lower + literal
        replaces + regexp_extract_all), no UDF, codegen-friendly. The
        pattern travels as a Column literal, so no SQL-string escaping
        layer exists to drift."""
        c = F.col(col) if isinstance(col, str) else col
        t = F.lower(c)
        for s in self.separator_tokens:
            t = F.replace(t, F.lit(s), F.lit(" "))
        return F.regexp_extract_all(t, F.lit(self.pattern()), F.lit(0))

    def sql_tokens_expr(self, col: str = "text") -> str:
        """DuckDB expression producing the identical array<string>."""
        t = f"lower({col})"
        for s in self.separator_tokens:
            t = f"replace({t}, '{s}', ' ')"
        # DuckDB string literals are standard SQL: backslashes stay literal
        return f"regexp_extract_all({t}, '{self.pattern()}', 0)"

    def sql_tokens_cte(self, table: str = "documents") -> str:
        """(doc_id, term) occurrence stream CTE body for oracles."""
        return (
            f"SELECT doc_id, unnest({self.sql_tokens_expr('text')}) AS term "
            f"FROM {table}"
        )

    def sql_term_doc_tf(self, table: str = "documents") -> str:
        return (
            f"SELECT term, doc_id, count(*)::INT AS tf "
            f"FROM ({self.sql_tokens_cte(table)}) GROUP BY term, doc_id"
        )

    def sql_dl(self, table: str = "documents") -> str:
        return (
            f"SELECT doc_id, len({self.sql_tokens_expr('text')}) AS dl "
            f"FROM {table}"
        )


def bm25_custom_tokenizer_oracle_sql(
    settings: TokenizerSettings,
    queries: list[tuple[int, str]],
    k: int = 10,
    table: str = "documents",
) -> str:
    """DuckDB oracle for BM25 top-k under custom tokenizer settings.

    Document side: DuckDB tokenizes independently with the compiled
    pattern. Query side: driver-tokenized (py_tokens) into a VALUES
    relation — query strings are literals shared by both engines, the
    single-artifact rule. `table` may be any (doc_id, text) expression,
    e.g. the punctuation-bearing derived corpus."""
    from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS

    qt_rows = sorted(
        {(qid, t) for qid, q in queries for t in settings.py_tokens(q)}
    )
    if not qt_rows:
        return (
            "SELECT NULL::INT AS query_id, NULL::BIGINT AS doc_id, "
            "NULL::DOUBLE AS score WHERE false"
        )
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in qt_rows)
    return f"""
WITH tdt AS ({settings.sql_term_doc_tf(table)}),
dl AS ({settings.sql_dl(table)}),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qt AS (SELECT * FROM (VALUES {vals}) AS q(query_id, term)),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""
