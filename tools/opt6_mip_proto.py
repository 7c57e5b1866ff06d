"""r6 session-2: full wand single + 12-query batch via mapInPandas instead
of groupBy(qshard).applyInPandas — results asserted identical."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from grenad_spark.index.build import IndexHandle
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import (
    _OUT_SCHEMA,
    _est_postings,
    _group_params,
    _make_per_query,
    _make_wand_batched,
    _query_blocks_from_pairs,
    _rank_topk,
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


def search_topk_mip(spark, index, queries, k=10):
    pairs = _tokenize_queries(queries)
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    n_queries = len({q for q, _ in pairs})
    g, n_groups, n_qshards = _group_params(
        spark, index, n_queries, _est_postings(spark, index, pairs)
    )
    sel = blocks.select(
        "query_id",
        (F.col("shard") / g).cast("int").alias("qshard"),
        "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    )
    n_part = min(n_groups, n_qshards)
    part = sel.coalesce(1) if n_part == 1 else sel.repartition(n_part, "qshard")
    fn = _make_per_query(_make_wand_batched(float(index.avgdl), int(k), index.payload_codec))

    def mfn(it):
        pdfs = [p for p in it]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if len(pdf):
            yield fn(pdf)

    per_shard = part.mapInPandas(mfn, _OUT_SCHEMA)
    return _rank_topk(per_shard, n_queries, int(k))


def main():
    spark = get_spark(
        "opt-mip", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    qs = REFERENCE_QUERIES
    q = qs[0]
    for _ in range(2):
        search_topk(spark, idx, [q], k=10, mode="wand").collect()
        search_topk_mip(spark, idx, [q], k=10).collect()
        search_topk(spark, idx, qs, k=10, mode="wand").collect()
        search_topk_mip(spark, idx, qs, k=10).collect()

    a = sorted(map(tuple, search_topk(spark, idx, qs, k=10, mode="wand").collect()))
    b = sorted(map(tuple, search_topk_mip(spark, idx, qs, k=10).collect()))
    assert a == b, "batch results diverged"
    a1 = sorted(map(tuple, search_topk(spark, idx, [q], k=10, mode="wand").collect()))
    b1 = sorted(map(tuple, search_topk_mip(spark, idx, [q], k=10).collect()))
    assert a1 == b1, "single results diverged"
    print("results identical (single + batch)")

    timed("single_apply", lambda: search_topk(spark, idx, [q], k=10, mode="wand").collect())
    timed("single_mip  ", lambda: search_topk_mip(spark, idx, [q], k=10).collect())
    timed("batch_apply ", lambda: search_topk(spark, idx, qs, k=10, mode="wand").collect(), reps=5)
    timed("batch_mip   ", lambda: search_topk_mip(spark, idx, qs, k=10).collect(), reps=5)
    spark.stop()


if __name__ == "__main__":
    main()
