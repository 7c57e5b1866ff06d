"""r6 scratch: apportion the Python-stage cost of single-query serving."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from grenad_spark.index.build import IndexHandle
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import (
    _group_params,
    _make_wand_batched,
    _query_blocks_from_pairs,
    _tokenize_queries,
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
        "opt-query2", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    q = REFERENCE_QUERIES[2:3]
    pairs = _tokenize_queries(q)
    avgdl = float(idx.avgdl)
    g, n_groups, _ = _group_params(spark, idx, 1)

    def base(n_grp):
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        return blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).repartition(n_grp, "query_id", "qshard")

    def identity(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"query_id": [int(pdf["query_id"].iloc[0])], "doc_id": [0], "score": [0.0]}
        )

    sch = "query_id int, doc_id long, score double"
    wand = _make_wand_batched(avgdl, 10, idx.payload_codec)

    # warm everything
    for _ in range(2):
        base(n_groups).groupBy("query_id", "qshard").applyInPandas(wand, sch).write.format("noop").mode("overwrite").save()
        base(n_groups).groupBy("query_id", "qshard").applyInPandas(identity, sch).write.format("noop").mode("overwrite").save()

    timed("apply_identity_16", lambda: base(16).groupBy("query_id", "qshard").applyInPandas(identity, sch).write.format("noop").mode("overwrite").save())
    timed("apply_wand_16", lambda: base(16).groupBy("query_id", "qshard").applyInPandas(wand, sch).write.format("noop").mode("overwrite").save())
    timed("apply_wand_8", lambda: base(8).groupBy("query_id", "qshard").applyInPandas(wand, sch).write.format("noop").mode("overwrite").save())
    timed("apply_wand_4", lambda: base(4).groupBy("query_id", "qshard").applyInPandas(wand, sch).write.format("noop").mode("overwrite").save())

    # drop unused meta columns from the python input (narrower arrow)
    def slim(n_grp):
        blocks, _ = _query_blocks_from_pairs(spark, idx, pairs)
        return blocks.select(
            "query_id", (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).repartition(n_grp, "qshard")

    timed("apply_wand_16_repart_qshard_only", lambda: slim(16).groupBy("query_id", "qshard").applyInPandas(wand, sch).write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
