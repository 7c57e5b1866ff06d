"""Registry of driver-contract queries + DuckDB oracles.

Each query is a (spark, sf_dir) -> DataFrame callable mirroring one operator
from SURVEY.md §2; its oracle is ANSI SQL DuckDB runs over the same parquet
views. Column names are aliased identically on both sides (driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grenad_spark import corpus
from grenad_spark.functions.tokenize import (
    TOKEN_SPLIT_RE,
    sql_term_doc_tf,
    term_doc_tf,
    tokens_col,
)
from grenad_spark.index import stats as istats
from grenad_spark.query import bm25

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.load_documents(spark, sf_dir)


# ---------------------------------------------------------------------------
# Index-build stream: tokenizer + (term, doc_id, tf) — Sorter input
# (reference src/sorter.rs:478-498: arbitrary-order inserts; here the token
# stream before the range shuffle).
# ---------------------------------------------------------------------------

@register("term_doc_tf", f"SELECT term, doc_id, tf FROM ({sql_term_doc_tf('documents')})")
def q_term_doc_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_doc_tf(_docs(spark, sf_dir)).select("term", "doc_id", "tf")


@register(
    "term_stats",
    f"SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf "
    f"FROM ({sql_term_doc_tf('documents')}) GROUP BY term",
)
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return istats.term_stats(term_doc_tf(_docs(spark, sf_dir)))


@register(
    "doc_lengths",
    "SELECT doc_id, len(list_filter(regexp_split_to_array(lower(text), "
    f"'{TOKEN_SPLIT_RE}'), x -> x <> ''))::INT AS dl FROM documents",
)
def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return istats.doc_lengths(_docs(spark, sf_dir)).select(
        "doc_id", F.col("dl").cast("int").alias("dl")
    )


@register(
    "corpus_stats",
    "SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl FROM ("
    "SELECT len(list_filter(regexp_split_to_array(lower(text), "
    f"'{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl FROM documents)",
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dl = istats.doc_lengths(_docs(spark, sf_dir))
    return dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )


# ---------------------------------------------------------------------------
# Posting lists as ordered arrays — Writer::insert ordering invariant
# (reference src/block_writer.rs:109 asserts strictly-increasing keys; our
# postings are doc_id-ascending per term, serialized to a string for the
# cross-engine hash).
# ---------------------------------------------------------------------------

@register(
    "postings",
    "SELECT term, string_agg(doc_id::VARCHAR || ':' || tf::VARCHAR, ',' ORDER BY doc_id) "
    f"AS posting FROM ({sql_term_doc_tf('documents')}) GROUP BY term",
)
def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    tdt = term_doc_tf(_docs(spark, sf_dir))
    return tdt.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: F.concat_ws(":", s["doc_id"].cast("string"), s["tf"].cast("string")),
            ),
            ",",
        ).alias("posting")
    )


# ---------------------------------------------------------------------------
# Reader/cursor analogs (reference src/reader/reader_cursor.rs,
# prefix_iter.rs, range_iter.rs) — point/seek/prefix/range over the sorted
# term dictionary. Catalyst turns these into pruned scans; at scale the
# range-partitioned segment layout makes them partition-pruned.
# ---------------------------------------------------------------------------

@register(
    "point_lookup",
    f"SELECT term, doc_id, tf FROM ({sql_term_doc_tf('documents')}) WHERE term = 'spark'",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # move_on_key_equal_to (src/reader/reader_cursor.rs:211-219)
    tdt = term_doc_tf(_docs(spark, sf_dir))
    return tdt.filter(F.col("term") == "spark").select("term", "doc_id", "tf")


@register(
    "seek_gte",
    "SELECT term, df FROM (SELECT term, count(*)::BIGINT AS df FROM ("
    + sql_term_doc_tf("documents")
    + ") GROUP BY term) WHERE term >= 'v' ORDER BY term LIMIT 1",
)
def q_seek_gte(spark: SparkSession, sf_dir: str) -> DataFrame:
    # move_on_key_greater_than_or_equal_to (src/reader/reader_cursor.rs:184-209)
    ts = istats.term_stats(term_doc_tf(_docs(spark, sf_dir)))
    return ts.filter(F.col("term") >= "v").orderBy("term").limit(1).select("term", "df")


@register(
    "seek_lte",
    "SELECT term, df FROM (SELECT term, count(*)::BIGINT AS df FROM ("
    + sql_term_doc_tf("documents")
    + ") GROUP BY term) WHERE term <= 'candle' ORDER BY term DESC LIMIT 1",
)
def q_seek_lte(spark: SparkSession, sf_dir: str) -> DataFrame:
    # move_on_key_lower_than_or_equal_to (src/reader/reader_cursor.rs:167-182)
    ts = istats.term_stats(term_doc_tf(_docs(spark, sf_dir)))
    return ts.filter(F.col("term") <= "candle").orderBy(F.desc("term")).limit(1).select("term", "df")


@register(
    "prefix_scan",
    "SELECT term, df, cf FROM (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf "
    f"FROM ({sql_term_doc_tf('documents')}) GROUP BY term) WHERE term LIKE 's%'",
)
def q_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PrefixIter (src/reader/prefix_iter.rs:8-94): startswith ⇒ range
    # [p, successor(p)) so a range-partitioned dictionary prunes partitions.
    ts = istats.term_stats(term_doc_tf(_docs(spark, sf_dir)))
    return ts.filter(F.col("term").startswith("s"))


@register(
    "range_scan",
    "SELECT term, df, cf FROM (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf "
    f"FROM ({sql_term_doc_tf('documents')}) GROUP BY term) "
    "WHERE term >= 'm' AND term < 'sp'",
)
def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RangeIter with Included/Excluded bounds (src/reader/range_iter.rs:8-106)
    ts = istats.term_stats(term_doc_tf(_docs(spark, sf_dir)))
    return ts.filter((F.col("term") >= "m") & (F.col("term") < "sp"))


@register(
    "first_last_key",
    "SELECT min(term) AS first_term, max(term) AS last_term, count(*)::BIGINT AS n_terms "
    f"FROM (SELECT DISTINCT term FROM ({sql_term_doc_tf('documents')}))",
)
def q_first_last_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # move_on_first / move_on_last (src/reader/reader_cursor.rs:91-129) +
    # Reader::len (src/reader/mod.rs:62-105)
    tdt = term_doc_tf(_docs(spark, sf_dir)).select("term").distinct()
    return tdt.agg(
        F.min("term").alias("first_term"),
        F.max("term").alias("last_term"),
        F.count("*").cast("long").alias("n_terms"),
    )


# ---------------------------------------------------------------------------
# Flagship: BM25 top-k (exhaustive path; rank-identical to the WAND path,
# asserted in tests/test_wand.py).
# ---------------------------------------------------------------------------

@register("bm25_topk", bm25.bm25_oracle_sql())
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.bm25_topk(spark, _docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Index-backed search: the full build pipeline (shard → encode → segment
# parquet → pruned scan → decode/WAND) gated by the SAME BM25 oracle — this
# checks the entire Sorter/Writer/Merger/Reader chain end to end.
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, object] = {}


def build_or_get_index(spark: SparkSession, sf_dir: str):
    from grenad_spark.index.build import build_index

    key = sf_dir.rstrip("/").replace("/", "_")
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_index(
            spark, _docs(spark, sf_dir), f"/tmp/grenad_index{key}", n_shards=4, overwrite=True
        )
    return _INDEX_CACHE[key]


@register("bm25_topk_indexed", bm25.bm25_oracle_sql())
def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grenad_spark.query.search import search_topk

    idx = build_or_get_index(spark, sf_dir)
    return search_topk(spark, idx, bm25.REFERENCE_QUERIES, k=10, mode="exhaustive")


@register("bm25_topk_wand", bm25.bm25_oracle_sql())
def q_bm25_topk_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grenad_spark.query.search import search_topk

    idx = build_or_get_index(spark, sf_dir)
    return search_topk(spark, idx, bm25.REFERENCE_QUERIES, k=10, mode="wand")


# ---------------------------------------------------------------------------
# Training-data pipeline: dedup family
# ---------------------------------------------------------------------------

from grenad_spark.operators import ann, dedup  # noqa: E402
from grenad_spark.functions import textstats  # noqa: E402


@register("dedup_exact_groups", dedup.SQL_EXACT_DEDUP)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(_docs(spark, sf_dir))


@register("dedup_exact_keep_first", dedup.SQL_EXACT_KEEP_FIRST)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_keep_first(_docs(spark, sf_dir))


@register("dedup_ngram_jaccard", dedup.sql_ngram_jaccard(0.8))
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), 0.8)


@register("dedup_minhash_lsh", dedup.sql_minhash_lsh(0.5))
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), 0.5)


@register("dedup_simhash", dedup.sql_simhash())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


@register("dedup_embedding_cosine", dedup.sql_embedding_dups(0.45))
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 0.45 chosen to yield a nonzero pair set on the synthetic embeddings
    # (max pairwise cosine there is ~0.51)
    from grenad_spark.corpus import load_embeddings

    return dedup.embedding_dup_pairs(load_embeddings(spark, sf_dir), 0.45)


@register("dedup_prefix_groups", dedup.sql_prefix_dedup(8))
def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.prefix_dedup_groups(_docs(spark, sf_dir), 8)


# ---------------------------------------------------------------------------
# Similarity search (ANN)
# ---------------------------------------------------------------------------

@register("ann_bruteforce_topk", ann.sql_brute_force_topk())
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grenad_spark.corpus import load_embeddings

    return ann.brute_force_topk(load_embeddings(spark, sf_dir))


@register("ann_lsh_topk")  # seeded hyperplanes are engine-local → rows-only;
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recall vs brute force asserted in tests/test_ann.py
    from grenad_spark.corpus import load_embeddings

    return ann.lsh_topk(load_embeddings(spark, sf_dir))


@register("ann_ivf_topk")  # rows-only; recall asserted in tests/test_ann.py
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grenad_spark.corpus import load_embeddings

    return ann.ivf_topk(load_embeddings(spark, sf_dir))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register("text_token_count", textstats.SQL_TOKEN_COUNT)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count(_docs(spark, sf_dir))


@register("text_quality_score", textstats.sql_quality_score())
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_score(_docs(spark, sf_dir))


@register("text_lang_id", textstats.sql_lang_id())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(_docs(spark, sf_dir))


@register("text_fingerprint", textstats.SQL_FINGERPRINT)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_docs(spark, sf_dir))


@register(
    "term_dict",
    "SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf "
    f"FROM ({sql_term_doc_tf('documents')}) GROUP BY term",
)
def q_term_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term_dict read back from the persisted index must equal the direct
    aggregation — validates the encode→segment→aggregate roundtrip."""
    idx = build_or_get_index(spark, sf_dir)
    return idx.term_dict(spark).select("term", "df", "cf")
