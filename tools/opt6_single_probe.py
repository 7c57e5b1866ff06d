"""r6 session-2: single-query latency breakdown on the bench-shape index.

Pieces, each min-of-7 on a warm session:
  plan      — build the DataFrame + force analysis (schema access)
  scan_noop — pruned segment scan (payload incl.) to noop
  blocks_noop — scan + literal-map attach (explode) to noop
  coalesce_noop — + coalesce/repartition into scoring groups
  kernel_local — the scoring kernel on the pre-collected pandas input
  full      — search_topk(...).collect()
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from grenad_spark.index.build import IndexHandle
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import (
    _est_postings,
    _group_params,
    _make_per_query,
    _make_wand_batched,
    _query_blocks_from_pairs,
    _tokenize_queries,
    search_topk,
)
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_idx_nat"


def timed(name, fn, reps=7):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.0f}ms", flush=True)
    return best


def main():
    spark = get_spark(
        "opt-single", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    q = REFERENCE_QUERIES[0]
    pairs = _tokenize_queries([q])
    print("query:", q)
    for _ in range(3):
        search_topk(spark, idx, [q], k=10, mode="wand").collect()

    timed("plan", lambda: _query_blocks_from_pairs(spark, idx, pairs)[0].schema)

    def scan_noop():
        terms = sorted({t for _, t in pairs})
        idx.segments(spark).filter(F.col("term").isin(terms)).write.format(
            "noop"
        ).mode("overwrite").save()

    timed("scan_noop", scan_noop)

    def blocks_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        blocks.write.format("noop").mode("overwrite").save()

    timed("blocks_noop", blocks_noop)

    g, n_groups, n_qshards = _group_params(
        spark, idx, 1, _est_postings(spark, idx, pairs)
    )
    print(f"g={g} n_groups={n_groups} n_qshards={n_qshards}")

    def sel(blocks):
        return blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        )

    def coalesce_noop():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        s = sel(blocks)
        n_part = min(n_groups, n_qshards)
        part = s.coalesce(1) if n_part == 1 else s.repartition(n_part, "qshard")
        part.write.format("noop").mode("overwrite").save()

    timed("coalesce_noop", coalesce_noop)

    def identity_apply():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        s = sel(blocks)
        n_part = min(n_groups, n_qshards)
        part = s.coalesce(1) if n_part == 1 else s.repartition(n_part, "qshard")
        part.groupBy("qshard").applyInPandas(
            lambda pdf: pd.DataFrame(
                {"query_id": [0], "doc_id": [0], "score": [0.0]}
            ),
            "query_id int, doc_id long, score double",
        ).write.format("noop").mode("overwrite").save()

    timed("identity_apply_noop", identity_apply)

    blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
    local = sel(blocks).toPandas()
    print(f"local input: {len(local)} block rows, "
          f"{local['payload'].map(len).sum()/1e6:.1f} MB payload")
    kern = _make_per_query(_make_wand_batched(float(idx.avgdl), 10, idx.payload_codec))
    timed("kernel_local", lambda: kern(local))

    timed("full_wand", lambda: search_topk(spark, idx, [q], k=10, mode="wand").collect())
    timed("full_exh", lambda: search_topk(spark, idx, [q], k=10, mode="exhaustive").collect())
    spark.stop()


if __name__ == "__main__":
    main()
