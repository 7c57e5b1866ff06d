"""r6 session-2: positions build — pack per-(term, doc) position arrays in a
JVM projection before the placement shuffle (one row per (term, doc) with an
array<int> instead of one row per occurrence). Fewer rows, fewer repeated
key bytes through the exchange; the encode kernel flattens the arrays.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import bench
from grenad_spark.functions.tokenize import tokens_col
from grenad_spark.index.positions import (
    POSITIONS_SCHEMA,
    _encode_positions_stream,
    encode_position_blocks,
    tokens_with_pos,
)
from grenad_spark.session import get_spark

PARTS = 64


def tokens_with_posarray(docs):
    """(term, doc_id, dl, tf, pos0, poss) — one row per (term, doc); poss is
    the sorted in-doc position array of the term."""
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    srt = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.expr(
            "array_sort(transform(toks, (t, i) -> struct(t AS term, i AS p)))"
        ).alias("ps"),
    )
    stage = srt.select(
        "doc_id",
        "dl",
        "ps",
        F.expr(
            "filter(sequence(1, size(ps)), i -> i = 1 OR ps[i-1].term != ps[i-2].term)"
        ).alias("st"),
    )
    rows = stage.select(
        "doc_id",
        "dl",
        F.explode(
            F.expr(
                "transform(sequence(1, size(st)), j -> struct("
                "ps[st[j-1]-1].term AS term, "
                "transform(slice(ps, st[j-1], "
                "(CASE WHEN j = size(st) THEN size(ps)+1 ELSE st[j] END) - st[j-1]"
                "), x -> x.p) AS poss))"
            )
        ).alias("e"),
    )
    return rows.select(
        F.col("e.term").alias("term"),
        "doc_id",
        "dl",
        F.col("e.poss").alias("poss"),
    )


def _encode_posarray_stream(batches, payload_codec="none", block_size=None):
    from grenad_spark.functions.varbyte import compress_payload

    pdfs = [p for p in batches]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    if len(pdf) == 0:
        return
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    doc = pdf["doc_id"].to_numpy()
    dl = pdf["dl"].to_numpy()
    poss = pdf["poss"].to_numpy()
    change = np.flatnonzero((terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(pdf)]))
    rows = []
    bs = block_size
    for s, e in zip(starts, ends):
        d = doc[s:e]  # one row per doc already (pre-packed)
        tf = np.fromiter((len(p) for p in poss[s:e]), dtype=np.int64, count=e - s)
        flat = np.concatenate(poss[s:e]) if e > s else np.empty(0, dtype=np.int64)
        for block_id, (n, first, last, header, ppay) in enumerate(
            encode_position_blocks(
                d, tf, dl[s:e], flat.astype(np.int64), bs or 128
            )
        ):
            if payload_codec != "none":
                header = compress_payload(header, payload_codec)
                ppay = compress_payload(ppay, payload_codec)
            rows.append(
                (terms[s], int(shards[s]), block_id, n, first, last, header, ppay)
            )
    yield pd.DataFrame(
        rows,
        columns=[
            "term", "shard", "block_id", "n", "first_doc", "last_doc",
            "header", "positions",
        ],
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.2f}s", flush=True)
    return best


def main():
    from grenad_spark.functions.varbyte import BLOCK_SIZE

    spark = get_spark("opt-pospack", cpus=16, shuffle_partitions=PARTS)
    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", 128)
    docs = docs.cache()
    docs.count()
    print(f"n_docs={n_docs}")
    n_shards = 128
    doc_space = n_docs

    def shard_col():
        return F.expr(
            f"CAST((doc_id * CAST({n_shards} AS BIGINT)) DIV "
            f"CAST({doc_space} AS BIGINT) AS INT)"
        )

    def current():
        stream = tokens_with_pos(docs).withColumn("shard", shard_col())
        return (
            stream.repartition(PARTS, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id", "pos")
            .mapInPandas(lambda it: _encode_positions_stream(it), POSITIONS_SCHEMA)
        )

    def packed():
        stream = tokens_with_posarray(docs).withColumn("shard", shard_col())
        return (
            stream.repartition(PARTS, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInPandas(lambda it: _encode_posarray_stream(it), POSITIONS_SCHEMA)
        )

    # correctness: identical block rows on a small corpus
    sdocs, sn = bench.replicated_docs(spark, "/root/testdata/sf0.1", 2)

    def rows_of(df):
        return sorted(
            (r["term"], r["shard"], r["block_id"], r["n"], r["first_doc"],
             r["last_doc"], bytes(r["header"]), bytes(r["positions"]))
            for r in df.collect()
        )

    s_cur = tokens_with_pos(sdocs).withColumn(
        "shard", F.expr(f"CAST((doc_id * 4) DIV CAST({sn} AS BIGINT) AS INT)")
    )
    s_pak = tokens_with_posarray(sdocs).withColumn(
        "shard", F.expr(f"CAST((doc_id * 4) DIV CAST({sn} AS BIGINT) AS INT)")
    )
    a = rows_of(
        s_cur.repartition(8, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id", "pos")
        .mapInPandas(lambda it: _encode_positions_stream(it), POSITIONS_SCHEMA)
    )
    b = rows_of(
        s_pak.repartition(8, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(lambda it: _encode_posarray_stream(it), POSITIONS_SCHEMA)
    )
    assert a == b, f"block rows differ: {len(a)} vs {len(b)}"
    print("block rows identical on 10k-doc sample")

    timed("positions_current_noop", lambda: noop(current()))
    timed("positions_packed_noop", lambda: noop(packed()))
    spark.stop()


if __name__ == "__main__":
    main()
