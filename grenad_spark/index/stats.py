"""Corpus + term statistics for BM25 (df, cf, N, dl, avgdl).

Pure groupBy().agg() — Spark's partial+final aggregation is grenad's
write_chunk (partial, reference src/sorter.rs:509-574) + MergerIter (final,
src/merger.rs:144-196) done by Tungsten. At 100 TB these are single-shuffle
jobs keyed on term (bounded output: vocabulary-sized, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grenad_spark.functions.tokenize import tokens_col


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    tokens_fn=None,
) -> DataFrame:
    """(doc_id, dl) token count per document — computed without a shuffle
    (size() over the token array, no explode). tokens_fn overrides the
    tokenizer (custom TokenizerSettings builds)."""
    tk = tokens_fn or tokens_col
    return docs.select(F.col(id_col), F.size(tk(text_col)).alias("dl"))


def term_stats(tdt: DataFrame) -> DataFrame:
    """(term, df, cf) from the (term, doc_id, tf) stream."""
    return tdt.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def corpus_stats(dl: DataFrame) -> DataFrame:
    """One row: (n_docs, avgdl). Tiny — collected/broadcast by callers."""
    return dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
