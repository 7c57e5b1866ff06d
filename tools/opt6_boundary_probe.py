"""r6 session-2: which part of the Python boundary costs ~200ms on a
single-query plan? identity UDFs over the same coalesced input via
applyInPandas (grouped) vs mapInPandas vs mapInArrow."""
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
    _query_blocks_from_pairs,
    _tokenize_queries,
)
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_idx_nat"
OUT = "query_id int, doc_id long, score double"


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
        "opt-boundary", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    q = REFERENCE_QUERIES[0]
    pairs = _tokenize_queries([q])
    g, n_groups, n_qshards = _group_params(spark, idx, 1, _est_postings(spark, idx, pairs))

    def part():
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        return blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).coalesce(1)

    tiny = pd.DataFrame({"query_id": [0], "doc_id": [0], "score": [0.0]})

    def apply_identity():
        part().groupBy("qshard").applyInPandas(lambda pdf: tiny, OUT).write.format(
            "noop"
        ).mode("overwrite").save()

    def mip_identity():
        def fn(it):
            for pdf in it:
                pass
            yield tiny

        part().mapInPandas(fn, OUT).write.format("noop").mode("overwrite").save()

    def mia_identity():
        import pyarrow as pa

        out_tbl = pa.table(
            {"query_id": pa.array([0], pa.int32()),
             "doc_id": pa.array([0], pa.int64()),
             "score": pa.array([0.0], pa.float64())}
        )

        def fn(it):
            for b in it:
                pass
            yield from out_tbl.to_batches()

        part().mapInArrow(fn, OUT).write.format("noop").mode("overwrite").save()

    def mia_topandas():
        import pyarrow as pa

        out_tbl = pa.table(
            {"query_id": pa.array([0], pa.int32()),
             "doc_id": pa.array([0], pa.int64()),
             "score": pa.array([0.0], pa.float64())}
        )

        def fn(it):
            tbl = pa.Table.from_batches(list(it))
            pdf = tbl.to_pandas()  # same conversion applyInPandas does
            yield from out_tbl.to_batches()

        part().mapInArrow(fn, OUT).write.format("noop").mode("overwrite").save()

    # warm all paths (worker import cost etc.)
    for f in (apply_identity, mip_identity, mia_identity, mia_topandas):
        f()

    timed("coalesce_noop", lambda: part().write.format("noop").mode("overwrite").save())
    timed("applyInPandas_identity", apply_identity)
    timed("mapInPandas_identity", mip_identity)
    timed("mapInArrow_identity", mia_identity)
    timed("mapInArrow_topandas", mia_topandas)
    spark.stop()


if __name__ == "__main__":
    main()
