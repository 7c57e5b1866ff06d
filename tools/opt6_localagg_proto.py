"""r6 session-2: prototype — replace tokens_with_dl's groupBy (one full
shuffle of the aggregated token stream) with a per-doc JVM run-length
(array_sort + boundary filter inside one projection). Duplicate (term, doc)
rows only exist WITHIN a document, so the per-doc reduction is exactly the
global aggregation — no exchange needed.

Measures: noop of the aggregated stream both ways + full segments pipeline
both ways, and asserts identical (term, doc_id, dl, tf) rows.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import bench
from grenad_spark.functions.tokenize import tokens_col
from grenad_spark.index.build import build_segments, tokens_with_dl
from grenad_spark.session import get_spark

PARTS = 64


def tokens_with_dl_localagg2(docs, tokens_fn=None):
    tk = tokens_fn or tokens_col
    toks = docs.select("doc_id", tk("text").alias("toks"))
    srt = toks.select(
        "doc_id", F.size("toks").alias("dl"), F.array_sort("toks").alias("ts")
    )
    stage = srt.select(
        "doc_id",
        "dl",
        "ts",
        F.expr(
            "filter(sequence(1, size(ts)), i -> i = 1 OR ts[i-1] != ts[i-2])"
        ).alias("st"),
    )
    pairs = stage.select(
        "doc_id",
        "dl",
        F.explode(
            F.expr(
                "transform(sequence(1, size(st)), j -> struct("
                "ts[st[j-1]-1] AS term, "
                "CAST((CASE WHEN j = size(st) THEN size(ts)+1 ELSE st[j] END) - st[j-1] AS INT) AS tf))"
            )
        ).alias("p"),
    )
    return pairs.select(F.col("p.term").alias("term"), "doc_id", "dl", F.col("p.tf").alias("tf"))


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
    spark = get_spark("opt-localagg", cpus=16, shuffle_partitions=PARTS)
    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", 128)
    docs = docs.cache()
    docs.count()
    print(f"n_docs={n_docs}")

    # correctness: identical rows on a sample corpus slice
    small, _ = bench.replicated_docs(spark, "/root/testdata/sf0.1", 2)
    a = sorted(map(tuple, tokens_with_dl(small).collect()))
    b = sorted(map(tuple, tokens_with_dl_localagg2(small).collect()))
    assert a == b, f"row mismatch: {len(a)} vs {len(b)}"
    print("rows identical on 10k-doc sample")

    timed("agg_groupby_noop", lambda: noop(tokens_with_dl(docs)))
    timed("agg_localjvm_noop", lambda: noop(tokens_with_dl_localagg2(docs)))

    n_shards = 128
    timed(
        "segments_groupby_noop",
        lambda: noop(build_segments(tokens_with_dl(docs), n_docs, n_shards, PARTS)),
    )
    timed(
        "segments_localjvm_noop",
        lambda: noop(
            build_segments(tokens_with_dl_localagg2(docs), n_docs, n_shards, PARTS)
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
