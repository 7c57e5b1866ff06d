"""r6 session-2: A/B the bench serving legs with/without the native codec.

Runs the bench-shape serving workloads (12-query wand batch, shared batch,
single queries, seek batch) on an existing index and prints best-of-N
timings. Toggle via GRENAD_SPARK_NO_NATIVE=1 in the environment.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from grenad_spark.index.build import IndexHandle
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import search_topk, search_topk_shared
from grenad_spark.operators.seek import seek_gte_postings
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_idx_large"
N_SEEKS = 639


def timed(name, fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.0f}ms", flush=True)
    return best


def main():
    print("native disabled:", bool(os.environ.get("GRENAD_SPARK_NO_NATIVE")))
    spark = get_spark(
        "opt-ab", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    qs = REFERENCE_QUERIES
    for mode in ("wand", "exhaustive"):
        for qid, q in qs[:6]:
            search_topk(spark, idx, [(qid, q)], k=10, mode=mode).collect()
    search_topk_shared(spark, idx, qs, k=10).collect()

    # single-query latency (sum over 12 queries, min-of-3 each)
    for mode in ("wand", "exhaustive"):
        tot = 0.0
        for qid, q in qs:
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                search_topk(spark, idx, [(qid, q)], k=10, mode=mode).collect()
                best = min(best, time.time() - t0)
            tot += best
        print(f"singles_{mode}_sum12: {tot*1000:.0f}ms", flush=True)

    timed("wand_batch_all", lambda: search_topk(spark, idx, qs, k=10, mode="wand").collect())
    timed("shared_batch_all", lambda: search_topk_shared(spark, idx, qs, k=10).collect())

    dfm = idx.df_map(spark)
    terms = sorted(dfm)
    doc_space = idx.manifest["max_doc"] + 1
    seek_keys = [(i, terms[i % len(terms)], (i * 9973) % doc_space) for i in range(N_SEEKS)]
    seek_gte_postings(spark, idx, seek_keys).collect()
    timed("seek_batch_639", lambda: seek_gte_postings(spark, idx, seek_keys).collect(), reps=3)
    spark.stop()


if __name__ == "__main__":
    main()
