"""r6 session-2: pair_stream local-agg prototype — per-doc min distance per
pair via array_sort + run starts (d ascends within a (t1,t2) run, so the run
start carries the min), replacing the groupBy exchange."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import bench
from grenad_spark.functions.tokenize import tokens_col
from grenad_spark.index.build import build_segments
from grenad_spark.index.pairprox import MAX_PAIR_DIST, pair_stream
from grenad_spark.session import get_spark

PARTS = 64


def pair_stream_local(docs):
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    pairs = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.expr(
            "array_sort(flatten(transform(toks, (w, i) -> "
            f"transform(slice(toks, i + 2, {MAX_PAIR_DIST}), "
            "(v, j) -> struct("
            "CASE WHEN w <= v THEN w ELSE v END AS t1, "
            "CASE WHEN w <= v THEN v ELSE w END AS t2, "
            "j + 1 AS d)))))"
        ).alias("ps"),
    )
    return (
        pairs.select(
            "doc_id",
            "dl",
            F.explode(
                F.expr(
                    "filter(ps, (p, i) -> i = 0 OR ps[i-1].t1 != p.t1 OR ps[i-1].t2 != p.t2)"
                )
            ).alias("p"),
        )
        .select(
            F.concat_ws(" ", "p.t1", "p.t2").alias("term"),
            "doc_id",
            "dl",
            F.col("p.d").cast("int").alias("tf"),
        )
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
    spark = get_spark("opt-pairagg", cpus=16, shuffle_partitions=PARTS)
    # bench pair leg shape: repl // 4
    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", 32)
    docs = docs.cache()
    docs.count()
    print(f"n_docs={n_docs}")

    small, _ = bench.replicated_docs(spark, "/root/testdata/sf0.1", 2)
    a = sorted(map(tuple, pair_stream(small).collect()))
    b = sorted(map(tuple, pair_stream_local(small).collect()))
    assert a == b, f"row mismatch: {len(a)} vs {len(b)}"
    print("rows identical on 10k-doc sample")

    timed("pair_groupby_noop", lambda: noop(pair_stream(docs)))
    timed("pair_localjvm_noop", lambda: noop(pair_stream_local(docs)))

    n_shards = 128
    timed(
        "pairseg_groupby_noop",
        lambda: noop(build_segments(pair_stream(docs), n_docs, n_shards, PARTS)),
    )
    timed(
        "pairseg_localjvm_noop",
        lambda: noop(build_segments(pair_stream_local(docs), n_docs, n_shards, PARTS)),
    )
    spark.stop()


if __name__ == "__main__":
    main()
