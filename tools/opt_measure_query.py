"""r6 scratch: single-query serving latency breakdown on the 640k index."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from grenad_spark.index.build import IndexHandle
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import (
    _group_params,
    _make_wand_batched,
    _query_blocks_from_pairs,
    _rank_topk,
    _tokenize_queries,
    search_topk,
)
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_idx_h_large"


def timed(name, fn, reps=7):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.0f}ms", flush=True)
    return best


def main():
    spark = get_spark(
        "opt-query", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    q = REFERENCE_QUERIES[2:3]
    print("query:", q)
    # warm
    for _ in range(3):
        search_topk(spark, idx, q, k=10, mode="wand").collect()

    pairs = _tokenize_queries(q)

    timed("full_wand", lambda: search_topk(spark, idx, q, k=10, mode="wand").collect())

    # piece 1: driver-side plan construction only (no action)
    timed("plan_only", lambda: search_topk(spark, idx, q, k=10, mode="wand"))

    # piece 2: scan+broadcast join, count only (no python, no repartition)
    def scan_count():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        blocks.select("query_id").count()

    timed("scan_join_count", scan_count)

    # piece 2b: scan+join incl payload, noop sink
    def scan_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        blocks.write.format("noop").mode("overwrite").save()

    timed("scan_join_payload_noop", scan_noop)

    # piece 3: + repartition, noop
    def repart_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        g, n_groups, _ = _group_params(spark, idx, 1)
        blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).repartition(n_groups, "query_id", "qshard").write.format("noop").mode(
            "overwrite"
        ).save()

    timed("repartition_noop", repart_noop)

    # piece 4: + applyInPandas, noop (skip final rank)
    def apply_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        g, n_groups, _ = _group_params(spark, idx, 1)
        per_shard = blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).repartition(n_groups, "query_id", "qshard").groupBy(
            "query_id", "qshard"
        ).applyInPandas(
            _make_wand_batched(float(idx.avgdl), 10, idx.payload_codec),
            "query_id int, doc_id long, score double",
        )
        per_shard.write.format("noop").mode("overwrite").save()

    timed("apply_noop", apply_noop)

    # batch of all reference queries (for comparison)
    timed(
        "full_wand_batch12",
        lambda: search_topk(spark, idx, REFERENCE_QUERIES, k=10, mode="wand").collect(),
        reps=3,
    )
    spark.stop()


if __name__ == "__main__":
    main()
