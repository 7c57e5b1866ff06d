"""r6 scratch: phrase + proximity batch timing (bench leg shapes)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from grenad_spark.index.build import IndexHandle
from grenad_spark.query.phrase import (
    search_topk_phrase,
    search_topk_phrase_shared,
    search_topk_proximity,
)
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_idx_large"

phrase_qs = [
    (1, "merge sort"), (2, "the fast"), (3, "key value stream"),
    (4, "dup"), (5, "data batch data"), (6, "hash join"),
    (7, "sort table scan"), (8, "group query row"), (9, "stream batch"),
    (10, "window small"), (11, "customer line"), (12, "slow customer line"),
]
prox_qs = [
    (1, "merge sort"), (2, "the join"), (3, "key value stream"),
    (4, "dup spark"), (5, "data stream"), (6, "hash join"),
    (7, "group query row"), (8, "window the batch"),
]


def timed(name, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.0f}ms", flush=True)
    return best


def main():
    spark = get_spark(
        "opt-phrase", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    search_topk_phrase(spark, idx, phrase_qs[:4], k=10).collect()
    search_topk_phrase_shared(spark, idx, phrase_qs[:4], k=10).collect()
    search_topk_proximity(spark, idx, prox_qs[:2], k=10).collect()

    r_p = r_n = r_s = None
    def run_p():
        nonlocal r_p
        r_p = sorted(map(tuple, search_topk_phrase(spark, idx, phrase_qs, k=10, prune_shards=True).collect()))
    def run_n():
        nonlocal r_n
        r_n = sorted(map(tuple, search_topk_phrase(spark, idx, phrase_qs, k=10, prune_shards=False).collect()))
    def run_s():
        nonlocal r_s
        r_s = sorted(map(tuple, search_topk_phrase_shared(spark, idx, phrase_qs, k=10).collect()))
    timed("phrase_batch_12_pruned", run_p)
    timed("phrase_batch_12_noprune", run_n)
    timed("phrase_batch_12_shared", run_s)
    assert r_p == r_n == r_s, "phrase plans diverged"
    timed("proximity_batch_8_positions", lambda: search_topk_proximity(spark, idx, prox_qs, k=10).collect())
    spark.stop()


if __name__ == "__main__":
    main()
