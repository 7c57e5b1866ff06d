"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship BM25 top-k on sf0.001.
queries()       — one callable per implemented operator (SURVEY.md §2).
oracle_sql()    — DuckDB-equivalent SQL per query (same column names/aliases).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from grenad_spark import entrypoints as E


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: full pipeline — build the sharded
    varbyte index, answer the reference query set via block-max WAND."""
    return E.q_bm25_topk_wand(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return E.QUERIES


def oracle_sql() -> dict[str, str]:
    return E.ORACLES
