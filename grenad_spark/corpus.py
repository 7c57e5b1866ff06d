"""Corpus loading + canonical Common-Crawl-style shape.

input_hint shape: (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string). Driver testdata ships (doc_id, text, lang, source, n_chars);
`to_cc_shape` derives the canonical columns deterministically so both shapes
share one token stream, and `extract_text` is the deterministic extractor whose
output must be byte-identical per url (FIXTURES.md §1).

Scale note: `html` is ONLY touched by `extract_text`; every index-build path
selects (doc_id, text) first so Catalyst prunes the binary column out of the
parquet scan — at 100 TB the html bytes dominate the table and must never be
read by the build (verified in tests via the optimized plan's ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = "2024-01-01 00:00:00"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the driver-provided documents table (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def to_cc_shape(docs: DataFrame) -> DataFrame:
    """Deterministically lift testdata docs to the canonical CC shape.

    url is unique per doc; warc_ts = EPOCH + doc_id seconds; html wraps text so
    the extractor round-trips byte-identically.
    """
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit(EPOCH)) + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


TITLE_TOKENS = 5


def fielded_docs(docs: DataFrame, title_tokens: int = TITLE_TOKENS) -> DataFrame:
    """Deterministic MULTI-FIELD document shape for attribute-aware serving:
    (doc_id, title, body) where title = the first `title_tokens` tokens of
    text and body = the rest (re-joined with single spaces — tokens are
    [a-z0-9]+ so re-tokenizing each field reproduces the exact token
    streams). The two fields partition the original token stream, so dl,
    tf, df and therefore BM25 are IDENTICAL to the single-field corpus —
    only positions gain a field id."""
    from grenad_spark.functions.tokenize import tokens_col

    toks = tokens_col("text")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, title_tokens), " ").alias("title"),
        F.array_join(
            F.slice(toks, title_tokens + 1, 1 << 24), " "
        ).alias("body"),
    )


def assign_doc_ids(
    docs: DataFrame,
    url_col: str = "url",
    num_buckets: int = 1024,
    tiebreak: str | None = None,
) -> DataFrame:
    """Deterministic dense doc_id assignment for corpora keyed by url.

    monotonically_increasing_id() is partition-layout-dependent and a global
    row_number() is a single-task sort — both wrong at 10^12 docs. Instead
    (SURVEY §7.1): hash urls into num_buckets fixed buckets, row_number
    WITHIN each bucket ordered by url (bounded window), and add per-bucket
    offsets computed from a bucket-count collect (num_buckets rows on the
    driver). The (url → doc_id) map depends only on the data, never on
    partitioning, task order, or cluster size — the determinism the
    rank-identical / byte-identical invariants require.

    urls must be unique (doc identity); pass `tiebreak` (e.g. warc_ts) to
    disambiguate deliberate re-crawl duplicates.
    """
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    pid = F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_buckets)).cast("int")
    with_pid = docs.withColumn("_pid", pid)
    counts = {r["_pid"]: r["count"] for r in with_pid.groupBy("_pid").count().collect()}
    offsets, acc = [], 0
    for b in range(num_buckets):
        offsets.append((b, acc))
        acc += counts.get(b, 0)
    offs = spark.createDataFrame(offsets, "_pid int, _offset long")
    order_cols = [url_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(offs), "_pid")
        .withColumn("doc_id", (F.col("_rn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


def extract_text(cc: DataFrame) -> DataFrame:
    """The deterministic reference extractor: html bytes -> text.

    Pure JVM-side column expressions (decode + strip wrapper tags) so the
    per-url output is bit-reproducible across runs, partitionings, and cluster
    sizes — the byte-identical-per-url invariant from BASELINE.json input_hint.
    """
    stripped = F.regexp_replace(
        F.regexp_replace(F.decode(F.col("html"), "UTF-8"), r"^<html><body>", ""),
        r"</body></html>$",
        "",
    )
    return cc.withColumn("extracted_text", stripped)
