"""r6 scratch: batch serving breakdown (12-query wand batch + shared)."""
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
    _tokenize_queries,
    search_topk,
    search_topk_shared,
)
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_idx_large"


def timed(name, fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.0f}ms", flush=True)
    return best


def main():
    spark = get_spark(
        "opt-batch", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    qs = REFERENCE_QUERIES
    print(f"{len(qs)} queries")
    pairs = _tokenize_queries(qs)
    for _ in range(2):
        search_topk(spark, idx, qs, k=10, mode="wand").collect()
        search_topk_shared(spark, idx, qs, k=10).collect()

    timed("batch_wand_full", lambda: search_topk(spark, idx, qs, k=10, mode="wand").collect())
    timed("batch_shared_full", lambda: search_topk_shared(spark, idx, qs, k=10).collect())

    def blocks_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        blocks.write.format("noop").mode("overwrite").save()

    timed("batch_blocks_noop", blocks_noop)

    g, n_groups, _ = _group_params(spark, idx, len(qs))
    print(f"g={g} n_groups={n_groups}")

    def repart_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).repartition(n_groups, "query_id", "qshard").write.format("noop").mode("overwrite").save()

    timed("batch_repart_noop", repart_noop)

    def apply_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).repartition(n_groups, "query_id", "qshard").groupBy(
            "query_id", "qshard"
        ).applyInPandas(
            _make_wand_batched(float(idx.avgdl), 10, idx.payload_codec),
            "query_id int, doc_id long, score double",
        ).write.format("noop").mode("overwrite").save()

    timed("batch_apply_noop", apply_noop)
    spark.stop()


if __name__ == "__main__":
    main()
