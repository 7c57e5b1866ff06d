"""Facet distribution — Meilisearch-style facet counts over document fields.

In the reference stack, Meilisearch materializes facet databases
(field-id → value → docids) as grenad KV files built through the same
Sorter/Writer pipeline as the word databases, and answers "facet
distribution" requests (value → count, optionally restricted to a search's
match set) by streaming those posting sets. Spark-first, both shapes are a
projection + one aggregate:

- facet_counts: unpivot the facet columns with `stack` (one JVM-side
  projection, no UDF, no shuffle before the partial agg) then count per
  (facet, value). At 10^12 docs the shuffle carries |distinct values| rows
  per partition after map-side combine — the same reason the term_dict build
  scales.
- facet_counts_for_term: the search-restricted distribution. The match set
  comes from the INDEX (pruned segment scan of one term + vectorized block
  decode — the point-lookup path), then a doc_id equi-join against the
  documents table feeds the same unpivot+count. Work ∝ posting size of the
  term, never ∝ corpus.
- facet_numeric_buckets: fixed-width histogram of a numeric field (the
  numeric-facet-range analog of Meilisearch's ordered facet levels).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grenad_spark.functions.varbyte import decode_block_rows, decompress_payloads


def facet_counts(docs: DataFrame, facet_cols: list[str]) -> DataFrame:
    """(facet, value, cnt) — value distribution of each facet column."""
    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in facet_cols)
    unpivoted = docs.selectExpr(f"stack({len(facet_cols)}, {pairs}) AS (facet, value)")
    return unpivoted.groupBy("facet", "value").agg(
        F.count("*").cast("long").alias("cnt")
    )


def sql_facet_counts(facet_cols: list[str], table: str = "documents") -> str:
    parts = [
        f"SELECT '{c}' AS facet, CAST({c} AS VARCHAR) AS value, "
        f"count(*)::BIGINT AS cnt FROM {table} GROUP BY 1, 2"
        for c in facet_cols
    ]
    return " UNION ALL ".join(parts)


def _make_decode_docs(codec: str):
    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d, _tf, _dl = decode_block_rows(
                decompress_payloads(list(pdf["payload"]), codec),
                pdf["n"].to_numpy(),
            )
            yield pd.DataFrame({"doc_id": d})

    return fn


def matching_doc_ids(spark: SparkSession, index, term: str) -> DataFrame:
    """(doc_id) of every doc containing `term`, decoded from the index's
    posting blocks (pruned scan: In(term) reaches the parquet reader)."""
    seg = index.segments(spark).filter(F.col("term") == term).select("n", "payload")
    return seg.mapInPandas(_make_decode_docs(index.payload_codec), "doc_id long")


def facet_counts_for_term(
    spark: SparkSession, index, docs: DataFrame, term: str, facet_cols: list[str]
) -> DataFrame:
    """Facet distribution restricted to docs matching `term` — the
    Meilisearch facetDistribution-of-a-search shape."""
    matched = matching_doc_ids(spark, index, term)
    return facet_counts(docs.join(matched, "doc_id"), facet_cols)


def sql_facet_counts_for_term(
    facet_cols: list[str], term: str, table: str = "documents"
) -> str:
    from grenad_spark.functions.tokenize import sql_term_doc_tf

    match = (
        f"(SELECT d.* FROM {table} d JOIN (SELECT DISTINCT doc_id FROM "
        f"({sql_term_doc_tf(table)}) WHERE term = '{term}') m ON d.doc_id = m.doc_id)"
    )
    return sql_facet_counts(facet_cols, match + " AS t")


def facet_numeric_buckets(docs: DataFrame, col: str, width: int) -> DataFrame:
    """(bucket, lo, cnt) fixed-width histogram of a numeric column; lo is
    the bucket's inclusive lower bound. Negative values floor correctly
    (integer FLOOR division, not truncation)."""
    b = F.floor(F.col(col) / F.lit(int(width))).cast("long")
    return docs.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias("cnt")
    ).select(
        "bucket", (F.col("bucket") * int(width)).alias("lo"), "cnt"
    )


def sql_facet_numeric_buckets(col: str, width: int, table: str = "documents") -> str:
    return (
        f"SELECT bucket, bucket * {width} AS lo, cnt FROM ("
        f"SELECT CAST(floor({col} / {width}.0) AS BIGINT) AS bucket, "
        f"count(*)::BIGINT AS cnt FROM {table} GROUP BY 1)"
    )


def facet_counts_for_phrase(
    spark: SparkSession, index, docs: DataFrame, phrase: str, facet_cols: list[str]
) -> DataFrame:
    """Facet distribution restricted to docs containing `phrase` as an
    exact token-adjacent match — facets-of-a-search composed over the
    positional layer. Work ∝ the phrase terms' posting sizes (the match
    set comes from the phrase kernel), then one doc_id equi-join."""
    from grenad_spark.query.phrase import phrase_matches

    # UNRANKED match set — a facet restriction needs membership, not the
    # top-k window/sort a ranked search would pay for
    matched = phrase_matches(spark, index, phrase)
    return facet_counts(docs.join(matched, "doc_id"), facet_cols)


def sql_facet_counts_for_phrase(
    facet_cols: list[str], phrase: str, table: str = "documents"
) -> str:
    import re

    from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE

    norm = " ".join(t for t in re.split(TOKEN_SPLIT_RE, phrase.lower()) if t)
    match = (
        f"(SELECT d.* FROM {table} d WHERE ' ' || array_to_string("
        f"list_filter(regexp_split_to_array(lower(d.text), '{TOKEN_SPLIT_RE}'), "
        f"x -> x <> ''), ' ') || ' ' LIKE '% {norm} %')"
    )
    return sql_facet_counts(facet_cols, match + " AS t")


def facet_counts_for_mixed(
    spark: SparkSession, index, docs: DataFrame, query: str, facet_cols: list[str]
) -> DataFrame:
    """Facet distribution restricted to a MIXED query's match set (quoted
    phrases constrain; a phrase-free query matches any doc holding >=1
    query term) — the facetDistribution shape for the full Meilisearch
    query language. Work ∝ the query terms' posting sizes."""
    from grenad_spark.query.phrase import mixed_matches

    matched = mixed_matches(spark, index, query)
    return facet_counts(docs.join(matched, "doc_id"), facet_cols)


def sql_facet_counts_for_mixed(
    facet_cols: list[str], query: str, table: str = "documents"
) -> str:
    import re

    from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE, sql_term_doc_tf
    from grenad_spark.query.phrase import parse_mixed_query

    phrases, free = parse_mixed_query(query)
    if phrases:
        conds = " AND ".join(
            "' ' || array_to_string(list_filter(regexp_split_to_array("
            f"lower(d.text), '{TOKEN_SPLIT_RE}'), x -> x <> ''), ' ') || ' ' "
            "LIKE '% " + " ".join(toks) + " %'"
            for toks in phrases
        )
        match = f"(SELECT d.* FROM {table} d WHERE {conds})"
    else:
        terms = sorted({t for t in free})
        vals = ", ".join(f"('{t}')" for t in terms)
        match = (
            f"(SELECT d.* FROM {table} d JOIN (SELECT DISTINCT doc_id FROM "
            f"({sql_term_doc_tf(table)}) WHERE term IN (SELECT term FROM "
            f"(VALUES {vals}) v(term))) m ON d.doc_id = m.doc_id)"
        )
    return sql_facet_counts(facet_cols, match + " AS t")


# ---------------------------------------------------------------------------
# facet-value search — Meilisearch POST /facet-search: find facet VALUES of
# one facet field that prefix-match facetQuery (normalized), each with its
# document count, optionally restricted to a search's match set; ordered
# count DESC then value ASC, limited (Meilisearch maxValuesPerFacet).
# ---------------------------------------------------------------------------

def facet_value_search(
    spark: SparkSession,
    index,
    docs: DataFrame,
    facet_col: str,
    facet_query: str,
    term: str | None = None,
    max_values: int = 100,
) -> DataFrame:
    """(value, cnt) facet values of `facet_col` starting with `facet_query`
    (case-insensitive), counted over all docs or — when `term` is given —
    over the docs matching the search term (posting-block decode, the same
    In(term)-pruned path as facet_counts_for_term).

    Scale: the prefix filter prunes BEFORE the count aggregation, so the
    shuffle carries only matching values; (cnt DESC, value ASC) is a total
    order, making the limit deterministic."""
    base = docs
    if term is not None:
        base = docs.join(matching_doc_ids(spark, index, term), "doc_id")
    fq = facet_query.lower()
    return (
        base.select(F.col(facet_col).cast("string").alias("value"))
        .filter(F.lower(F.col("value")).startswith(fq))
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(int(max_values))
    )


def facet_stats(
    spark: SparkSession,
    index,
    docs: DataFrame,
    numeric_cols: list[str],
    term: str | None = None,
) -> DataFrame:
    """(facet, vmin, vmax, cnt) — Meilisearch's `facetStats` response field:
    min/max of every NUMERIC facet over the match set (all docs, or the docs
    matching `term` via the same In(term)-pruned posting-block decode as
    facet_counts_for_term). One unpivot + one aggregate; the shuffle carries
    |facets| rows per partition after map-side combine."""
    base = docs
    if term is not None:
        base = docs.join(matching_doc_ids(spark, index, term), "doc_id")
    pairs = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in numeric_cols)
    unpivoted = base.selectExpr(
        f"stack({len(numeric_cols)}, {pairs}) AS (facet, value)"
    )
    return unpivoted.groupBy("facet").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("value").cast("long").alias("cnt"),
    )


def sql_facet_stats(
    numeric_cols: list[str], term: str | None = None, table: str = "documents"
) -> str:
    from grenad_spark.functions.tokenize import sql_term_doc_tf

    base = table
    if term is not None:
        base = (
            f"(SELECT d.* FROM {table} d JOIN (SELECT DISTINCT doc_id FROM "
            f"({sql_term_doc_tf(table)}) WHERE term = '{term}') m "
            f"ON d.doc_id = m.doc_id)"
        )
    parts = [
        f"SELECT '{c}' AS facet, min(CAST({c} AS DOUBLE)) AS vmin, "
        f"max(CAST({c} AS DOUBLE)) AS vmax, count({c})::BIGINT AS cnt "
        f"FROM {base} t"
        for c in numeric_cols
    ]
    return " UNION ALL ".join(parts)


def facet_distribution_capped(
    docs: DataFrame,
    facet_cols: list[str],
    max_values_per_facet: int = 100,
    sort_by: str = "count",
) -> DataFrame:
    """(facet, value, cnt) truncated to `max_values_per_facet` VALUES PER
    FACET under Meilisearch's sortFacetValuesBy setting: 'count' keeps the
    most-frequent values ((cnt DESC, value ASC) — the default dashboard
    shape), 'alpha' the lexicographically first. Both orders are total, so
    the cap is deterministic; the window runs on the already-aggregated
    (facet, value) rows — |distinct values|, never |docs|."""
    from pyspark.sql.window import Window

    if sort_by == "count":
        order = [F.desc("cnt"), F.asc("value")]
    elif sort_by == "alpha":
        order = [F.asc("value")]
    else:
        raise ValueError(f"sortFacetValuesBy must be 'count' or 'alpha', got {sort_by!r}")
    counts = facet_counts(docs, facet_cols)
    w = Window.partitionBy("facet").orderBy(*order)
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(max_values_per_facet))
        .select("facet", "value", "cnt")
    )


def sql_facet_distribution_capped(
    facet_cols: list[str],
    max_values_per_facet: int = 100,
    sort_by: str = "count",
    table: str = "documents",
) -> str:
    order = (
        "cnt DESC, value ASC" if sort_by == "count" else "value ASC"
    )
    return f"""
SELECT facet, value, cnt FROM (
  SELECT *, row_number() OVER (PARTITION BY facet ORDER BY {order}) AS rn
  FROM ({sql_facet_counts(facet_cols, table)})
) WHERE rn <= {int(max_values_per_facet)}
"""


def sql_facet_value_search(
    facet_col: str,
    facet_query: str,
    term: str | None = None,
    max_values: int = 100,
    table: str = "documents",
) -> str:
    from grenad_spark.functions.tokenize import sql_term_doc_tf

    base = table
    if term is not None:
        base = (
            f"(SELECT d.* FROM {table} d JOIN (SELECT DISTINCT doc_id FROM "
            f"({sql_term_doc_tf(table)}) WHERE term = '{term}') m "
            f"ON d.doc_id = m.doc_id)"
        )
    return f"""
SELECT CAST({facet_col} AS VARCHAR) AS value, count(*)::BIGINT AS cnt
FROM {base} t
WHERE starts_with(lower(CAST({facet_col} AS VARCHAR)), '{facet_query.lower()}')
GROUP BY 1
ORDER BY cnt DESC, value ASC
LIMIT {int(max_values)}
"""
