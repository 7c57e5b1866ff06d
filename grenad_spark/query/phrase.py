"""Phrase search — exact token-adjacency top-k over the positional index.

Semantics (the Meilisearch "phrase query" / double-quoted search, served in
the reference stack from grenad word-position databases): a document matches
the phrase t_0 t_1 ... t_{m-1} iff some position p has t_i at p+i for every
i. Matching docs are ranked by ordinary BM25 over the phrase's DISTINCT
terms (conjunctive-and-then-score, like the AND path, plus adjacency).

Plan shape = the house single-exchange serving plan: pruned positions scan
(In(term, ...) pushed to parquet), broadcast of the driver-computed
(query_id, term, idf) rows, ONE hash exchange into a per-(query_id, shard)
Arrow kernel, then the global top-k window. Shards are doc-disjoint, so
per-shard phrase matching is exact and the union is the global match set —
identical scaling story to ordinary top-k: candidates ∝ posting sizes of the
phrase terms, never ∝ corpus.

Kernel internals are fully vectorized: each term's blocks decode in one
varbyte pass; the offset-chain intersection packs (doc, pos - i) into one
int64 key per occurrence (doc * 2^POS_BITS + adjusted position) and chains
np.intersect1d — m-1 sorted-set intersections per (query, shard), no per-doc
Python. Duplicate terms in a phrase ("buffalo buffalo") cost nothing extra:
each OFFSET contributes its own adjusted key set from the same decoded
arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE
from grenad_spark.index.positions import POS_BITS, decode_position_blocks
from grenad_spark.query.bm25 import SCORE_DECIMALS
from grenad_spark.query.search import _driver_idf, _idf, _tfpart

_OUT_SCHEMA = "query_id int, doc_id long, score double"


def _tokenize_phrases(queries: list[tuple[int, str]]) -> dict[int, list[str]]:
    """query_id -> ORDERED token list (duplicates and order preserved —
    adjacency is positional, unlike the bag-of-words paths)."""
    import re

    out: dict[int, list[str]] = {}
    for qid, q in queries:
        toks = [t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t]
        out[qid] = toks
    return out


def _make_phrase_kernel(phrases: dict[int, list[str]], avgdl: float, codec: str):
    """applyInPandas kernel over one (query_id, shard) group of position
    blocks (term, idf, n, header, positions)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int32"),
                "doc_id": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            }
        )
        qid = int(pdf["query_id"].iloc[0])
        toks = phrases[qid]
        # decode each distinct term once
        decoded: dict[str, tuple] = {}
        idfs: dict[str, float] = {}
        for (term, idf), g in pdf.groupby(["term", "idf"], sort=False):
            decoded[term] = decode_position_blocks(
                list(g["header"]), list(g["positions"]), g["n"].to_numpy(), codec
            )
            idfs[term] = float(idf)
        if any(t not in decoded for t in toks):
            return empty  # a phrase term absent from this shard => no match here
        # offset-chain intersection on packed (doc, pos - i) keys
        keys = None
        for i, t in enumerate(toks):
            d, tf, _dl, pos, _occ = decoded[t]
            dk = np.repeat(d, tf) << np.int64(POS_BITS)
            adj = pos - i
            k = (dk + adj)[adj >= 0]
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=False)
            if keys.size == 0:
                return empty
        matched = np.unique(keys >> np.int64(POS_BITS))
        # BM25 over distinct phrase terms, restricted to matched docs
        uniq_terms = list(dict.fromkeys(toks))
        scores = np.zeros(matched.size, dtype=np.float64)
        for t in uniq_terms:
            d, tf, dl, _pos, _occ = decoded[t]
            sel = np.searchsorted(d, matched)
            # matched ⊆ d for every phrase term (conjunctive), so sel is exact
            scores += idfs[t] * _tfpart(
                tf[sel].astype(np.float64), dl[sel].astype(np.float64), avgdl
            )
        return pd.DataFrame({"query_id": qid, "doc_id": matched, "score": scores})

    return fn


def search_topk_phrase(
    spark: SparkSession,
    index,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 over docs containing each query as an EXACT phrase.
    (query_id, doc_id, score); queries whose tokens include an
    out-of-vocabulary term return no rows (a phrase can't match)."""
    phrases = _tokenize_phrases(queries)
    n_docs = float(index.n_docs)
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    dfm = index.df_map(spark)
    pairs: list[tuple[int, str, float]] = []
    for qid, toks in phrases.items():
        if not toks:
            continue
        if dfm is not None:
            if any(t not in dfm for t in toks):
                continue  # OOV term => phrase cannot match anywhere
            pairs.extend((qid, t, _driver_idf(n_docs, dfm[t])) for t in set(toks))
        else:
            pairs.extend((qid, t, float("nan")) for t in set(toks))
    if not pairs:
        return spark.createDataFrame([], _OUT_SCHEMA)
    terms = sorted({t for _, t, _ in pairs})
    pos_tbl = index.positions(spark).filter(F.col("term").isin(terms))
    if dfm is not None:
        qt = spark.createDataFrame(pairs, "query_id int, term string, idf double")
        blocks = pos_tbl.join(F.broadcast(qt), "term")
    else:
        # vocabulary too large for a driver df map: broadcast-join term_dict
        qt = spark.createDataFrame(
            [(q, t) for q, t, _ in pairs], "query_id int, term string"
        )
        td = index.term_dict(spark).filter(F.col("term").isin(terms)).select("term", "df")
        blocks = (
            pos_tbl.join(F.broadcast(td), "term")
            .join(F.broadcast(qt), "term")
            .withColumn("idf", _idf(n_docs, F.col("df")))
        )
    per_shard = blocks.select(
        "query_id", "shard", "term", "idf", "n", "header", "positions"
    ).groupBy("query_id", "shard").applyInPandas(
        _make_phrase_kernel(phrases, avgdl, codec), _OUT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "score")
    )
