"""r6 scratch: pair-stream plan variants (noop sinks)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import bench
from grenad_spark.functions.tokenize import tokens_col
from grenad_spark.functions.varbyte import encode_posting_blocks
from grenad_spark.index.build import SEGMENT_SCHEMA, build_segments
from grenad_spark.index.pairprox import MAX_PAIR_DIST, pair_stream
from grenad_spark.session import get_spark

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 32
PARTS = 64
N_SHARDS = 32


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


def raw_pairs(docs):
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    return toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(
            F.expr(
                "flatten(transform(toks, (w, i) -> "
                f"transform(slice(toks, i + 2, {MAX_PAIR_DIST}), "
                "(v, j) -> struct("
                "CASE WHEN w <= v THEN w ELSE v END AS t1, "
                "CASE WHEN w <= v THEN v ELSE w END AS t2, "
                "j + 1 AS d))))"
            )
        ).alias("p"),
    ).select(
        F.concat_ws(" ", "p.t1", "p.t2").alias("term"),
        "doc_id", "dl", F.col("p.d").alias("tf"),
    )


def _encode_min_stream(batches):
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
    tf_col = pdf["tf"].to_numpy()
    change = np.flatnonzero((terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(pdf)]))
    rows = []
    for s, e in zip(starts, ends):
        d = doc[s:e]
        run_bounds = np.flatnonzero(d[1:] != d[:-1]) + 1
        first_idx = np.concatenate(([0], run_bounds))
        uniq_docs = d[first_idx]
        tf = np.minimum.reduceat(tf_col[s:e], first_idx)
        for block_id, (
            n, first, last, max_tf, min_dl, min_tf, max_dl, sum_tf, payload
        ) in enumerate(encode_posting_blocks(uniq_docs, tf, dl[s:e][first_idx])):
            rows.append(
                (terms[s], int(shards[s]), block_id, n, first, last,
                 max_tf, min_dl, min_tf, max_dl, sum_tf, payload)
            )
    yield pd.DataFrame(
        rows,
        columns=[
            "term", "shard", "block_id", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "min_tf", "max_dl", "sum_tf", "payload",
        ],
    )


def main():
    spark = get_spark("opt-pair2", cpus=16, shuffle_partitions=16)
    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", REPL)
    docs = docs.cache()
    docs.count()
    doc_space = n_docs
    sc = spark.sparkContext

    sc.setJobDescription("raw pair explode noop")
    timed("raw_pairs_noop", lambda: noop(raw_pairs(docs)))

    sc.setJobDescription("pair single-exchange min encode noop")

    def single_exchange():
        sharded = raw_pairs(docs).withColumn(
            "shard",
            F.expr(
                f"CAST((doc_id * CAST({N_SHARDS} AS BIGINT)) DIV "
                f"CAST({doc_space} AS BIGINT) AS INT)"
            ),
        )
        return (
            sharded.repartition(PARTS, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInPandas(lambda it: _encode_min_stream(it), SEGMENT_SCHEMA)
        )

    timed("pair_single_exchange_noop", lambda: noop(single_exchange()))

    sc.setJobDescription("pair current (agg + build_segments) noop")
    timed(
        "pair_current_noop",
        lambda: noop(build_segments(pair_stream(docs), doc_space, N_SHARDS, PARTS)),
    )
    sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
