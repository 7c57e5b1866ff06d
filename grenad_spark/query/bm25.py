"""BM25 scoring — exhaustive DataFrame path (the correctness anchor).

Formula (Robertson/Lucene-style, the one Meilisearch-adjacent engines use):
    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,q)= Σ_{t ∈ unique(q)} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
with k1=1.2, b=0.75, ties broken by doc_id ascending.

This path is 100% JVM-side DataFrame ops (broadcast-join the query terms into
the posting stream, one shuffle to agg per (query_id, doc_id), window top-k).
It is both the DuckDB-oracle-matched query and the ground truth that the
block-max WAND path (query/wand.py) must reproduce rank-identically.

Scale: the broadcast side is |query terms| rows; the posting stream is filtered
to those terms BEFORE the shuffle, so the agg shuffle carries only candidate
(query, doc) pairs — at 10^12 docs this is the standard "term-at-a-time
scatter" plan, and WAND replaces it only to cut the scoring work, not the
shape. Scores are rounded to 4 decimals ONLY for cross-engine comparison;
ranking uses the rounded score + doc_id so Spark and DuckDB order identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE, sql_term_doc_tf, term_doc_tf
from grenad_spark.index.stats import corpus_stats, doc_lengths, term_stats

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 4

# (query_id, query) — FIXTURES.md §3 queries_ref: head terms, the rare term
# ('dup'), multi-term AND/OR mixes, a long tail query.
REFERENCE_QUERIES: list[tuple[int, str]] = [
    (1, "spark window"),
    (2, "merge sort table"),
    (3, "dup"),
    (4, "the fast join"),
    (5, "hash join order"),
    (6, "key value stream"),
    (7, "dup spark"),
    (8, "query vector scan"),
    (9, "a"),
    (10, "big data batch stream"),
    (11, "filter column row"),
    (12, "slow customer line group agg small part fast"),
]
DEFAULT_K = 10

# typo-tolerant query set (each term matches dictionary terms within
# Levenshtein distance 1)
FUZZY_QUERIES: list[tuple[int, str]] = [
    (1, "spakr"),
    (2, "window merge"),
    (3, "dupp"),
    (4, "qury vektor"),
    (5, "join hash tble"),
]

# two-typo query set (max_edits=2 — transpositions cost 2 under plain
# Levenshtein, plus genuine double typos; served via the persisted SymSpell
# deletion table, no vocabulary scan)
FUZZY2_QUERIES: list[tuple[int, str]] = [
    (1, "sprak"),
    (2, "widnow mrege"),
    (3, "dupzz"),
    (4, "vektr"),
    (5, "striam bache"),
]

# conjunctive (AND) query set
AND_QUERIES: list[tuple[int, str]] = [
    (1, "dup spark"),
    (2, "merge sort table window"),
    (3, "the fast join hash"),
    (4, "dup stream batch"),
]

# exact-phrase query set (token adjacency over the positional index):
# common bigrams, a trigram, a single-term phrase, a repeated-term phrase,
# and an out-of-vocabulary phrase that must return no rows
PHRASE_QUERIES: list[tuple[int, str]] = [
    (1, "merge sort"),
    (2, "the fast"),
    (3, "key value stream"),
    (4, "dup"),
    (5, "data batch data"),
    (6, "zzzunknown phrase"),
]

# proximity-ranked query set (conjunctive; ranked by summed adjacent-pair
# min position distance, then BM25 — the Meilisearch proximity rule)
PROX_QUERIES: list[tuple[int, str]] = [
    (1, "merge sort"),
    (2, "the join"),
    (3, "key value stream"),
    (4, "dup spark"),
    (5, "data stream"),
]

# typoTolerance-settings query set (per-word budgets from
# minWordSizeForTypos 5/9 + disableOnWords): a 5-char 1-typo word beside an
# exact short word, a 6-char 1-typo, an 8-char 1-typo, a 9-char 2-typo, a
# short word denied typos (stays OOV), and a disabled word denied its typo
TYPO_SETTINGS_QUERIES: list[tuple[int, str]] = [
    (1, "mrege sort"),
    (2, "striam"),
    (3, "custoner"),
    (4, "custonerr"),
    (5, "sorr dup"),
    (6, "wandow dup"),
]

# pair-proximity-DB query set (capped Meilisearch proximity semantics —
# served from the materialized word_pair_proximity analog): the PROX set
# plus a repeated-term query (self-pair needs two occurrences) and a
# three-term query whose middle pair is usually beyond the 7-token window
# (exercises the ABSENT_COST leg)
PROX_DB_QUERIES: list[tuple[int, str]] = [
    (1, "merge sort"),
    (2, "the join"),
    (3, "key value stream"),
    (4, "dup spark"),
    (5, "data data"),
    (6, "window the batch"),
]

# prefix-search query set (terms ending in * expand against the dictionary)
PREFIX_QUERIES: list[tuple[int, str]] = [
    (1, "sp*"),
    (2, "ba* dup"),
    (3, "win* merge"),
    (4, "qu* v*"),
    (5, "dup str*"),
]


def query_terms_df(spark: SparkSession, queries: list[tuple[int, str]]) -> DataFrame:
    """(query_id, term) with unique terms per query (BM25 ignores query-side tf)."""
    q = spark.createDataFrame(queries, "query_id int, query string")
    return q.select(
        "query_id", F.explode(F.split(F.lower("query"), TOKEN_SPLIT_RE)).alias("term")
    ).filter(F.col("term") != "").distinct()


def score_expr(tf, df, dl, n_docs, avgdl):
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))
    tf_part = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / F.lit(float(avgdl))))
    return idf * tf_part


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exhaustive BM25 top-k: (query_id, doc_id, score) rounded for parity."""
    queries = queries if queries is not None else REFERENCE_QUERIES
    tdt = term_doc_tf(docs)
    dl = doc_lengths(docs)
    n_docs, avgdl = corpus_stats(dl).first()
    ts = term_stats(tdt)
    qt = query_terms_df(spark, queries)

    per_term = (
        tdt.join(F.broadcast(qt), "term")
        .join(F.broadcast(ts), "term")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            score_expr(
                F.col("tf").cast("double"), F.col("df").cast("double"),
                F.col("dl").cast("double"), n_docs, avgdl,
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("s"), SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "score")
    )


def sql_queries_values(queries: list[tuple[int, str]] | None = None) -> str:
    queries = queries if queries is not None else REFERENCE_QUERIES
    rows = ", ".join(f"({qid}, '{q}')" for qid, q in queries)
    return f"(VALUES {rows}) AS q(query_id, query)"


def bm25_oracle_sql(
    queries: list[tuple[int, str]] | None = None,
    k: int = DEFAULT_K,
    table: str = "documents",
) -> str:
    """DuckDB SQL computing the identical result (same formula, rounding,
    ties). `table` may be any table expression with (doc_id, text) — e.g. a
    logical re-crawled corpus for the fresh-search oracle."""
    return f"""
WITH tdt AS ({sql_term_doc_tf(table)}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM {table}
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS term
        FROM {sql_queries_values(queries)})
  WHERE term <> ''
),
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


def bm25_page_oracle_sql(
    queries: list[tuple[int, str]] | None = None,
    offset: int = 0,
    limit: int = DEFAULT_K,
    table: str = "documents",
) -> str:
    """DuckDB oracle for search_topk_page: ranks offset+1..offset+limit of
    the disjunctive BM25 ranking plus the exact match-set size."""
    return f"""
WITH tdt AS ({sql_term_doc_tf(table)}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM {table}
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS term
        FROM {sql_queries_values(queries)})
  WHERE term <> ''
),
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
SELECT query_id, doc_id, score, rank, total_hits FROM (
  SELECT *,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank,
         count(*) OVER (PARTITION BY query_id)::BIGINT AS total_hits
  FROM scored
) WHERE rank > {int(offset)} AND rank <= {int(offset) + int(limit)}
"""


_SCORING_TAIL = f"""
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
) WHERE rn <= {{k}}
"""

_CORPUS_CTES = f"""
tdt AS ({{tdt}}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM documents
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
vocab AS (SELECT DISTINCT term FROM tdt)
"""


def bm25_fuzzy_oracle_sql(
    queries: list[tuple[int, str]] | None = None, k: int = DEFAULT_K, max_edits: int = 1
) -> str:
    """DuckDB oracle for typo-tolerant BM25 (levenshtein ≤ max_edits)."""
    queries = queries if queries is not None else FUZZY_QUERIES
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
rawq AS (
  SELECT DISTINCT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS qterm
  FROM {sql_queries_values(queries)}
),
qt AS (
  SELECT DISTINCT r.query_id, v.term
  FROM rawq r JOIN vocab v
    ON r.qterm <> ''
   AND abs(length(v.term) - length(r.qterm)) <= {max_edits}
   AND levenshtein(v.term, r.qterm) <= {max_edits}
),
{_SCORING_TAIL.format(k=k).lstrip()}
"""


def bm25_and_oracle_sql(
    queries: list[tuple[int, str]] | None = None, k: int = DEFAULT_K
) -> str:
    """DuckDB oracle for conjunctive (AND) BM25: only docs containing every
    distinct query term are ranked."""
    queries = queries if queries is not None else AND_QUERIES
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS term
    FROM {sql_queries_values(queries)}
  ) WHERE term <> ''
),
qn AS (SELECT query_id, count(*)::INT AS n_terms FROM qt GROUP BY query_id),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score,
         count(DISTINCT tdt.term)::INT AS hit_terms
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, score FROM (
  SELECT s.*, row_number() OVER (PARTITION BY s.query_id ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN qn ON s.query_id = qn.query_id AND s.hit_terms = qn.n_terms
) WHERE rn <= {k}
"""


def bm25_prefix_oracle_sql(queries: list[tuple[int, str]] | None = None, k: int = DEFAULT_K) -> str:
    """DuckDB oracle for prefix-expanded BM25: a `p*` token matches every
    dictionary term with prefix p; expansions score as ordinary disjuncts."""
    queries = queries if queries is not None else PREFIX_QUERIES
    rows = ", ".join(f"({qid}, '{q}')" for qid, q in queries)
    return f"""
WITH tdt AS ({sql_term_doc_tf('documents')}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM documents
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
vocab AS (SELECT DISTINCT term FROM tdt),
rawq AS (
  SELECT query_id, unnest(string_split(lower(query), ' ')) AS tok
  FROM (VALUES {rows}) AS q(query_id, query)
),
cleaned AS (
  SELECT query_id, tok LIKE '%*' AS is_prefix,
         regexp_replace(CASE WHEN tok LIKE '%*' THEN rtrim(tok, '*') ELSE tok END,
                        '[^a-z0-9]+', '', 'g') AS p
  FROM rawq
),
qt AS (
  SELECT DISTINCT query_id, v.term
  FROM cleaned c JOIN vocab v
    ON length(c.p) > 0 AND (
         (NOT c.is_prefix AND v.term = c.p)
         OR (c.is_prefix AND v.term LIKE c.p || '%')
       )
),
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


def bm25_phrase_oracle_sql(
    queries: list[tuple[int, str]] | None = None,
    k: int = DEFAULT_K,
    table: str = "documents",
) -> str:
    """DuckDB oracle for exact-phrase BM25: a doc matches iff the phrase's
    tokens appear ADJACENTLY in order in its token stream; matches rank by
    BM25 over the phrase's distinct terms. Adjacency is checked with the
    space-join trick — tokens contain only [a-z0-9], so substring match of
    ' t0 t1 ... ' inside ' '||array_to_string(tokens,' ')||' ' is EXACTLY
    token adjacency (no partial-token false positives, no LIKE
    metacharacters)."""
    import re

    queries = queries if queries is not None else PHRASE_QUERIES
    norm = [
        (qid, " ".join(t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t))
        for qid, q in queries
    ]
    norm = [(qid, p) for qid, p in norm if p]
    rows = ", ".join(f"({qid}, '{p}')" for qid, p in norm)
    return f"""
WITH tdt AS ({sql_term_doc_tf(table)}),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM {table}
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
q AS (SELECT * FROM (VALUES {rows}) AS v(query_id, phrase)),
match AS (
  SELECT q.query_id, toks.doc_id
  FROM toks CROSS JOIN q
  WHERE ' ' || array_to_string(toks.t, ' ') || ' ' LIKE '% ' || q.phrase || ' %'
),
qt AS (SELECT DISTINCT query_id, unnest(string_split(phrase, ' ')) AS term FROM q),
scored AS (
  SELECT m.query_id, m.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM match m
  JOIN qt ON qt.query_id = m.query_id
  JOIN tdt ON tdt.term = qt.term AND tdt.doc_id = m.doc_id
  JOIN ts ON ts.term = qt.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN cs
  GROUP BY m.query_id, m.doc_id
)
SELECT query_id, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


_AND_MATCHES_CTES = f"""
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS term
    FROM {{queries_values}}
  ) WHERE term <> ''
),
qn AS (SELECT query_id, count(*)::INT AS n_terms FROM qt GROUP BY query_id),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score,
         count(DISTINCT tdt.term)::INT AS hit_terms
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
),
matches AS (
  SELECT s.query_id, s.doc_id, s.score
  FROM scored s JOIN qn ON s.query_id = qn.query_id AND s.hit_terms = qn.n_terms
)
"""


def bm25_sorted_oracle_sql(
    queries: list[tuple[int, str]], sort_col: str, k: int = DEFAULT_K,
    ascending: bool = False,
) -> str:
    """DuckDB oracle for search_topk_sorted: conjunctive matches ranked by a
    document attribute (sortable-attribute serving)."""
    order = "ASC" if ascending else "DESC"
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
{_AND_MATCHES_CTES.format(queries_values=sql_queries_values(queries)).strip()}
SELECT query_id, doc_id, {sort_col}, score FROM (
  SELECT m.query_id, m.doc_id, d.{sort_col}, m.score,
         row_number() OVER (PARTITION BY m.query_id
                            ORDER BY d.{sort_col} {order}, m.doc_id ASC) AS rn
  FROM matches m JOIN documents d USING (doc_id)
) WHERE rn <= {k}
"""


def bm25_distinct_attr_oracle_sql(
    queries: list[tuple[int, str]], distinct_col: str, k: int = DEFAULT_K
) -> str:
    """DuckDB oracle for search_topk_distinct_attr: best doc per attribute
    value, then global top-k (distinct-attribute serving)."""
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
{_AND_MATCHES_CTES.format(queries_values=sql_queries_values(queries)).strip()},
attrd AS (
  SELECT m.query_id, m.doc_id, d.{distinct_col}, m.score,
         row_number() OVER (PARTITION BY m.query_id, d.{distinct_col}
                            ORDER BY m.score DESC, m.doc_id ASC) AS grn
  FROM matches m JOIN documents d USING (doc_id)
)
SELECT query_id, doc_id, {distinct_col}, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rn
  FROM attrd WHERE grn = 1
) WHERE rn <= {k}
"""


def bm25_filtered_oracle_sql(
    queries: list[tuple[int, str]],
    filter_sql: str,
    k: int = DEFAULT_K,
) -> str:
    """DuckDB oracle for search_topk_filtered: standard disjunctive BM25
    restricted to docs satisfying `filter_sql` over the documents table."""
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
allowed AS (SELECT doc_id FROM documents WHERE {filter_sql}),
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS term
    FROM {sql_queries_values(queries)}
  ) WHERE term <> ''
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN allowed a ON tdt.doc_id = a.doc_id
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


def bm25_words_oracle_sql(
    queries: list[tuple[int, str]] | None = None, k: int = DEFAULT_K
) -> str:
    """DuckDB oracle for search_topk_words (the Meilisearch WORDS ranking
    rule): rank by matched-distinct-term count DESC, BM25 DESC, doc ASC."""
    queries = queries if queries is not None else REFERENCE_QUERIES
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS term
    FROM {sql_queries_values(queries)}
  ) WHERE term <> ''
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score,
         count(DISTINCT tdt.term)::INT AS hit_terms
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, hit_terms, score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hit_terms DESC, score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def bm25_fuzzy_ranked_oracle_sql(
    queries: list[tuple[int, str]] | None = None, k: int = DEFAULT_K, max_edits: int = 1
) -> str:
    """DuckDB oracle for search_topk_fuzzy_ranked — the Meilisearch rule
    pipeline on typo-tolerant queries: covered query-term slots DESC, total
    typos ASC (Σ per covered slot of min edit distance among the doc's
    matched derivations; one derivation may credit several slots), BM25
    DESC, doc ASC."""
    queries = queries if queries is not None else FUZZY_QUERIES
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
rawq AS (
  SELECT DISTINCT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS qterm
  FROM {sql_queries_values(queries)}
),
qx AS (
  SELECT r.query_id, r.qterm, v.term, levenshtein(v.term, r.qterm)::BIGINT AS lev
  FROM rawq r JOIN vocab v
    ON r.qterm <> ''
   AND abs(length(v.term) - length(r.qterm)) <= {max_edits}
   AND levenshtein(v.term, r.qterm) <= {max_edits}
),
slotm AS (
  SELECT qx.query_id, tdt.doc_id, qx.qterm, min(qx.lev) AS typos
  FROM tdt JOIN qx ON tdt.term = qx.term
  GROUP BY 1, 2, 3
),
agg2 AS (
  SELECT query_id, doc_id, count(*)::INT AS hit_terms, sum(typos)::BIGINT AS typos
  FROM slotm GROUP BY 1, 2
),
qt AS (SELECT DISTINCT query_id, term FROM qx),
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
SELECT query_id, doc_id, hit_terms, typos, score FROM (
  SELECT s.query_id, s.doc_id, a.hit_terms, a.typos, s.score,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY a.hit_terms DESC, a.typos ASC, s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN agg2 a ON a.query_id = s.query_id AND a.doc_id = s.doc_id
) WHERE rn <= {k}
"""


def bm25_typo_settings_oracle_sql(
    queries: list[tuple[int, str]] | None = None,
    settings=None,
    k: int = DEFAULT_K,
) -> str:
    """DuckDB oracle for search_topk_typo_settings: the fuzzy_ranked oracle
    with PER-WORD edit budgets (Meilisearch minWordSizeForTypos +
    disableOnWords). Budgets are computed here with the SAME
    TypoSettings.budget the engine uses, then inlined as VALUES rows."""
    import re

    from grenad_spark.query.search import TypoSettings

    queries = queries if queries is not None else TYPO_SETTINGS_QUERIES
    settings = settings or TypoSettings()
    rows = []
    for qid, q in queries:
        for qterm in dict.fromkeys(
            t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t
        ):
            rows.append(f"({int(qid)}, '{qterm}', {settings.budget(qterm)})")
    vals = ", ".join(rows)
    return f"""
WITH {_CORPUS_CTES.format(tdt=sql_term_doc_tf('documents'))},
rawq AS (SELECT * FROM (VALUES {vals}) AS v(query_id, qterm, budget)),
qx AS (
  SELECT r.query_id, r.qterm, v.term, levenshtein(v.term, r.qterm)::BIGINT AS lev
  FROM rawq r JOIN vocab v
    ON abs(length(v.term) - length(r.qterm)) <= r.budget
   AND levenshtein(v.term, r.qterm) <= r.budget
),
slotm AS (
  SELECT qx.query_id, tdt.doc_id, qx.qterm, min(qx.lev) AS typos
  FROM tdt JOIN qx ON tdt.term = qx.term
  GROUP BY 1, 2, 3
),
agg2 AS (
  SELECT query_id, doc_id, count(*)::INT AS hit_terms, sum(typos)::BIGINT AS typos
  FROM slotm GROUP BY 1, 2
),
qt AS (SELECT DISTINCT query_id, term FROM qx),
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
SELECT query_id, doc_id, hit_terms, typos, score FROM (
  SELECT s.query_id, s.doc_id, a.hit_terms, a.typos, s.score,
         row_number() OVER (PARTITION BY s.query_id
           ORDER BY a.hit_terms DESC, a.typos ASC, s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN agg2 a ON a.query_id = s.query_id AND a.doc_id = s.doc_id
) WHERE rn <= {k}
"""
