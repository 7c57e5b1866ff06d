"""r6 scratch: fielded positions build + ranked/attr batch timing."""
from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from grenad_spark.corpus import fielded_docs
from grenad_spark.index.build import IndexHandle, build_index
from grenad_spark.index.positions import build_positions
from grenad_spark.query.ranked import search_topk_attr_rule, search_topk_ranked
from grenad_spark.session import get_spark

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 32
OUT = "/tmp/opt_idx_fielded"

ranked_qs = [
    (1, "data stream"), (2, "merge sort"), (3, "the fast join"),
    (4, "spark window"), (5, "big table"), (6, "key value"),
    (7, "hash join order"), (8, "filter column row"),
]


def main():
    spark = get_spark(
        "opt-ranked", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", REPL)
    shutil.rmtree(OUT, ignore_errors=True)
    build_index(spark, docs, OUT, overwrite=True, partitions=64, docs_per_shard=5000)
    t0 = time.time()
    build_positions(spark, fielded_docs(docs), OUT, partitions=64,
                    fields=["title", "body"])
    print(f"fielded positions build: {time.time()-t0:.2f}s ({n_docs} docs)")
    idx = IndexHandle(OUT)
    search_topk_ranked(spark, idx, ranked_qs[:2], k=10).collect()
    search_topk_attr_rule(spark, idx, ranked_qs[:2], k=10).collect()
    for name, fn in [
        ("ranked_batch_8", lambda: search_topk_ranked(spark, idx, ranked_qs, k=10).collect()),
        ("attr_batch_8", lambda: search_topk_attr_rule(spark, idx, ranked_qs, k=10).collect()),
    ]:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name}: {best*1000:.0f}ms", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
