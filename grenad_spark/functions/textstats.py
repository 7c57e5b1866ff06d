"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All JVM-side column expressions (no UDFs) with value-exact DuckDB oracles —
each op is a narrow projection over `text`, so at scale it runs inside the
same scan as tokenization with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_col

# deterministic stopword lists for the n-gram/stopword language heuristic.
# Tiny by design: the fixture corpus vocabulary is synthetic; real deployments
# swap in real lists — the operator shape (scores + argmax w/ tiebreak) stands.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "un"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ein", "zu"),
}


# BPE-ish piece shapes (letter runs / single digits / single punctuation —
# the GPT-2 pattern family minus lookahead, so Java regex and RE2 agree);
# counts pieces, approximating subword token counts for budget estimates.
# Whitespace is an EXPLICIT class, not \s: Java's \s includes \x0B
# (vertical tab) while RE2's does not — the one place the engines' \s
# definitions diverge, which would hash-mismatch on \x0B-bearing text
_WS_CLASS = r" \t\n\r\x0b\f"
BPE_ISH_RE = rf"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9{_WS_CLASS}]"
_WS_RE = rf"[{_WS_CLASS}]+"


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_ws_tokens, n_bpe_ish): the three counting schemes
    a training-data budget uses — the engine tokenizer, raw whitespace
    splitting, and a BPE-ish subword piece count. All pure column
    expressions; the BPE-ish count is regexp_count over a pattern in the
    Java-regex/RE2 common subset."""
    return docs.select(
        "doc_id",
        F.size(tokens_col("text")).cast("int").alias("n_tokens"),
        F.size(F.filter(F.split("text", _WS_RE), lambda t: t != ""))
        .cast("int")
        .alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH_RE)).cast("int").alias("n_bpe_ish"),
    )


SQL_TOKEN_COUNT = (
    "SELECT doc_id, "
    "len(list_filter(regexp_split_to_array(lower(text), "
    f"'{TOKEN_SPLIT_RE}'), x -> x <> ''))::INT AS n_tokens, "
    f"len(list_filter(regexp_split_to_array(text, '{_WS_RE}'), x -> x <> ''))::INT "
    "AS n_ws_tokens, "
    f"len(regexp_extract_all(text, '{BPE_ISH_RE}'))::INT "
    "AS n_bpe_ish FROM documents"
)


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio, quality).

    quality = 0.5·clamp(n_tokens/100) + 0.3·stopword_ratio_score +
              0.2·mean_token_len_score — a deterministic, explainable filter
    signal (length / stopword-density heuristics standard in web pipelines).
    """
    toks = tokens_col("text")
    en = LANG_STOPWORDS["en"]
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*en)))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    tl_score = F.when((mean_len >= 3.0) & (mean_len <= 8.0), 1.0).otherwise(0.5)
    return docs.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(0.5 * len_score + 0.3 * stop_ratio + 0.2 * tl_score, 6).alias("quality"),
    )


def sql_quality_score() -> str:
    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, n_chars, len(toks) AS n_tok,
         len(list_filter(toks, x -> x IN ({en}))) AS n_stop,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
              ELSE 0.0 END AS mean_len
  FROM t
)
SELECT doc_id, n_chars::INT AS n_chars, n_tok::INT AS n_tokens,
       round(mean_len, 6) AS mean_token_len,
       round(CASE WHEN n_tok > 0 THEN n_stop::DOUBLE / n_tok ELSE 0.0 END, 6) AS stopword_ratio,
       round(0.5 * least(n_tok::DOUBLE / 100.0, 1.0)
             + 0.3 * (CASE WHEN n_tok > 0 THEN n_stop::DOUBLE / n_tok ELSE 0.0 END)
             + 0.2 * (CASE WHEN mean_len >= 3.0 AND mean_len <= 8.0 THEN 1.0 ELSE 0.5 END), 6) AS quality
FROM m
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, lang_score) — stopword-hit scoring with
    deterministic tiebreak (score desc, lang asc)."""
    toks = tokens_col("text")
    scores = F.array(
        *[
            F.struct(
                (-F.size(F.filter(toks, lambda t: t.isin(*ws)))).cast("long").alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_sort(scores)[0]
    return docs.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        (-best["neg"]).cast("int").alias("lang_score"),
    )


def sql_lang_id() -> str:
    cases = []
    for lang, ws in sorted(LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in ws)
        cases.append(f"len(list_filter(toks, x -> x IN ({lst}))) AS s_{lang}")
    langs = sorted(LANG_STOPWORDS)
    # argmax with (score desc, lang asc) tiebreak via greatest + first match
    pred = "CASE " + " ".join(
        f"WHEN s_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM documents
),
s AS (SELECT doc_id, {', '.join(cases)} FROM t),
g AS (SELECT *, greatest({', '.join('s_' + lg for lg in langs)}) AS best FROM s)
SELECT doc_id, {pred} AS pred_lang, best::INT AS lang_score FROM g
"""


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) canonical fingerprint: md5 over the sorted distinct token
    set — the 'fingerprint' clustering method for near-identical docs that
    differ only in token order/repetition."""
    toks = tokens_col("text")
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return docs.select("doc_id", F.md5(canon).alias("fp"))


SQL_FINGERPRINT = (
    "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
    f"list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> ''))), ' ')) AS fp "
    "FROM documents"
)


# ---------------------------------------------------------------------------
# n-gram repetition statistics — the Gopher repetition-filter family
# (Rae et al. 2021, table A1: documents dominated by a repeated n-gram or
# by duplicated n-grams are boilerplate/spam). Adapted to token n-grams
# over the engine tokenizer:
#   top2_frac  = occurrences of the most frequent 2-gram / total 2-grams
#   top3_frac  = same for 3-grams
#   dup5_frac  = occurrences belonging to 5-grams seen >= 2 times / total
#   keep       = top2 <= 0.20 AND top3 <= 0.18 AND dup5 <= 0.15
# All thresholds are the published Gopher-family defaults. Pure built-in
# exprs: ONE explode of the tagged n-gram stream, one (doc, n, gram)
# partial-agg shuffle (∝ n-grams, never ∝ pairs), one pivot.
# ---------------------------------------------------------------------------

REP_TOP2_MAX = 0.20
REP_TOP3_MAX = 0.18
REP_DUP5_MAX = 0.15


def repetition_stats(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", tokens_col("text").alias("t"))

    def grams(n: int):
        return F.when(
            F.size("t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - n + 1),
                lambda i: F.concat_ws(" ", F.slice("t", i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    rows = None
    for n in (2, 3, 5):
        part = base.select(
            "doc_id", F.lit(n).alias("n"), F.explode(grams(n)).alias("g")
        )
        rows = part if rows is None else rows.unionByName(part)
    cnts = rows.groupBy("doc_id", "n", "g").agg(F.count("*").alias("c"))
    stats = cnts.groupBy("doc_id", "n").agg(
        F.max("c").alias("mx"),
        F.sum("c").alias("tot"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup"),
    )
    piv = (
        stats.groupBy("doc_id")
        .pivot("n", [2, 3, 5])
        .agg(
            F.first("mx").alias("mx"),
            F.first("tot").alias("tot"),
            F.first("dup").alias("dup"),
        )
    )

    def frac(num, den):
        return F.round(
            F.when(
                F.coalesce(F.col(den), F.lit(0)) > 0,
                F.col(num).cast("double") / F.col(den),
            ).otherwise(F.lit(0.0)),
            6,
        )

    out = (
        docs.select("doc_id")
        .join(piv, "doc_id", "left")
        .select(
            "doc_id",
            frac("2_mx", "2_tot").alias("top2_frac"),
            frac("3_mx", "3_tot").alias("top3_frac"),
            frac("5_dup", "5_tot").alias("dup5_frac"),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("top2_frac") <= REP_TOP2_MAX)
        & (F.col("top3_frac") <= REP_TOP3_MAX)
        & (F.col("dup5_frac") <= REP_DUP5_MAX),
    )


def sql_repetition_stats() -> str:
    parts = []
    for n in (2, 3, 5):
        parts.append(f"""
g{n} AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= {n}
         THEN list_transform(range(1, len(toks) - {n} + 2),
                             i -> array_to_string(toks[i:i + {n} - 1], ' '))
         ELSE [] END) AS g
  FROM t
),
c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY doc_id, g),
s{n} AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS tot,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
  FROM c{n} GROUP BY doc_id
)""")
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM documents
),{", ".join(parts)}
SELECT d.doc_id,
       round(CASE WHEN coalesce(s2.tot, 0) > 0 THEN s2.mx::DOUBLE / s2.tot ELSE 0.0 END, 6) AS top2_frac,
       round(CASE WHEN coalesce(s3.tot, 0) > 0 THEN s3.mx::DOUBLE / s3.tot ELSE 0.0 END, 6) AS top3_frac,
       round(CASE WHEN coalesce(s5.tot, 0) > 0 THEN s5.dup::DOUBLE / s5.tot ELSE 0.0 END, 6) AS dup5_frac,
       (round(CASE WHEN coalesce(s2.tot, 0) > 0 THEN s2.mx::DOUBLE / s2.tot ELSE 0.0 END, 6) <= {REP_TOP2_MAX}
        AND round(CASE WHEN coalesce(s3.tot, 0) > 0 THEN s3.mx::DOUBLE / s3.tot ELSE 0.0 END, 6) <= {REP_TOP3_MAX}
        AND round(CASE WHEN coalesce(s5.tot, 0) > 0 THEN s5.dup::DOUBLE / s5.tot ELSE 0.0 END, 6) <= {REP_DUP5_MAX}) AS keep
FROM (SELECT doc_id FROM documents) d
LEFT JOIN s2 ON s2.doc_id = d.doc_id
LEFT JOIN s3 ON s3.doc_id = d.doc_id
LEFT JOIN s5 ON s5.doc_id = d.doc_id
"""
