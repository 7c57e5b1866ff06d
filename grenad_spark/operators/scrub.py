"""Corpus scrubbing: PII redaction + benchmark decontamination.

Two standard pre-training hygiene passes, both 100% JVM-side column
expressions (regexp_replace / shingle joins — no UDFs), each with a
value-exact DuckDB oracle:

- redact_pii: replace emails / URLs / long digit runs with typed
  placeholder tokens. Regexes are deliberately restricted to syntax Java
  regex (Spark) and RE2 (DuckDB) treat identically — the same discipline as
  the shared tokenizer. One projection over the documents scan; no shuffle.
- decontaminate: drop every document sharing an n-gram SHINGLE with a
  benchmark/eval set (the standard guard against test-set leakage into
  training corpora). The benchmark side is tiny (an eval suite), so its
  shingle set broadcasts and the corpus side is one scan + semi-join — at
  100 TB this is a broadcast-semi-join over the token stream, never a
  corpus×benchmark join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grenad_spark.operators.dedup import shingles, sql_shingles

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Java-regex / RE2 common subset only: character classes, +, {m,}, no
# backrefs, no lookaround. Order matters: emails before generic digit runs
# (an email's local part may contain digits).
_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[A-Za-z0-9./_\-?=&%#]+"
_LONG_DIGITS_RE = r"[0-9]{7,}"  # phone-ish / account-ish digit runs

_RULES: list[tuple[str, str]] = [
    (_EMAIL_RE, "<email>"),
    (_URL_RE, "<url>"),
    (_LONG_DIGITS_RE, "<number>"),
]


def redact_col(col: Column) -> Column:
    out = col
    for pat, tok in _RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) with emails/URLs/long digit runs replaced by typed
    placeholders, plus n_redactions (how many substitutions happened —
    cheap leakage telemetry: count the placeholder tokens)."""
    red = redact_col(F.col(text_col))
    # placeholder occurrences counted by length delta — the same integer
    # arithmetic the SQL oracle uses, so the count is engine-exact
    n_red = sum(
        (
            (F.length(red) - F.length(F.replace(red, F.lit(tok), F.lit(""))))
            / F.lit(len(tok))
            for _, tok in _RULES
        ),
        F.lit(0),
    )
    return docs.select(
        "doc_id",
        red.alias("text"),
        n_red.cast("int").alias("n_redactions"),
    )


def sql_redact_expr(expr: str) -> str:
    out = expr
    for pat, tok in _RULES:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 5
) -> DataFrame:
    """(doc_id) of corpus docs that share NO word n-gram with the benchmark
    set — the docs safe to train on. Both sides shingle through the SAME
    helper as the dedup family (one tokenizer, one gram definition — a
    divergent benchmark-side tokenization would silently miss leaks). The
    benchmark shingle set is tiny (an eval suite) and broadcasts; corpus
    docs flag via one semi-join on the shingle key. benchmark needs
    (doc_id, text) like any docs table."""
    bench_sh = shingles(benchmark, n).select("shingle").distinct()
    # corpus side stays NON-distinct: duplicate (doc_id, shingle) rows are
    # harmless to the semi-join, and a distinct here would be a corpus-wide
    # aggregate BEFORE any benchmark filtering — the exact shuffle this
    # operator's scale contract forbids. The explode+broadcast-join is a
    # narrow map over the scan; only matched doc_ids aggregate.
    corpus_sh = shingles(corpus, n, distinct=False)
    contaminated = corpus_sh.join(F.broadcast(bench_sh), "shingle").select(
        "doc_id"
    ).distinct()
    return corpus.select("doc_id").join(contaminated, "doc_id", "left_anti")
