"""Custom stateful streaming operator: incremental term statistics.

Maintains cumulative (df, cf) per term across micro-batches with
applyInPandasWithState — the streaming counterpart of the term_dict
aggregation, and the engine's demonstration of arbitrary stateful operators
(grenad has no streaming; this is the capability a continuously-crawling
pipeline needs to keep BM25 idf fresh without rebuilding).

State per term is two longs — state store size is vocabulary-bounded, not
corpus-bounded, so this runs indefinitely at web scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from grenad_spark.functions.tokenize import tokens_col

OUTPUT_SCHEMA = "term string, df long, cf long"
STATE_SCHEMA = "df long, cf long"


def _update_term_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    df0, cf0 = state.get if state.exists else (0, 0)
    # accumulate doc_ids across ALL Arrow chunks before the unique count: a
    # hot term's postings span multiple chunks (arrow.maxRecordsPerBatch), and
    # summing per-chunk nunique() double-counts a doc straddling a boundary
    doc_parts = []
    cf_add = 0
    for pdf in pdfs:
        doc_parts.append(pdf["doc_id"].to_numpy())
        cf_add += len(pdf)
    import numpy as np

    df_add = int(np.unique(np.concatenate(doc_parts)).size) if doc_parts else 0
    state.update((df0 + df_add, cf0 + cf_add))
    yield pd.DataFrame({"term": [key[0]], "df": [df0 + df_add], "cf": [cf0 + cf_add]})


def streaming_term_stats(docs_stream: DataFrame):
    """(streaming docs with doc_id/text) -> updating (term, df, cf) stream.

    NOTE df counts doc occurrences per batch; a doc split across batches for
    the same term would double-count — upstream batching is per-crawl-file,
    where a doc appears exactly once (the CC ingestion contract).
    """
    toks = docs_stream.select(
        "doc_id", F.explode(tokens_col("text")).alias("term")
    )
    return toks.groupBy("term").applyInPandasWithState(
        _update_term_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
