"""r6 scratch: mapInArrow vs mapInPandas for the segments encode."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F

import bench
from grenad_spark.functions.varbyte import encode_posting_blocks
from grenad_spark.index.build import SEGMENT_SCHEMA, build_segments, tokens_with_dl
from grenad_spark.session import get_spark

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 128
PARTS = 64
N_SHARDS = 128

_OUT_FIELDS = [
    ("term", pa.string()), ("shard", pa.int32()), ("block_id", pa.int32()),
    ("n", pa.int32()), ("first_doc", pa.int64()), ("last_doc", pa.int64()),
    ("max_tf", pa.int32()), ("min_dl", pa.int32()), ("min_tf", pa.int32()),
    ("max_dl", pa.int32()), ("sum_tf", pa.int64()), ("payload", pa.binary()),
]
_OUT_PA_SCHEMA = pa.schema(_OUT_FIELDS)


def _encode_arrow(batches):
    tbls = [pa.Table.from_batches([b]) for b in batches]
    if not tbls:
        return
    tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
    if tbl.num_rows == 0:
        return
    tbl = tbl.combine_chunks()
    import pyarrow.compute as pc

    terms = tbl.column("term").combine_chunks()
    n = tbl.num_rows
    shards = tbl.column("shard").to_numpy()
    doc = tbl.column("doc_id").to_numpy()
    dl = tbl.column("dl").to_numpy()
    tf_col = tbl.column("tf").to_numpy() if "tf" in tbl.schema.names else None
    if n > 1:
        neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        change = np.flatnonzero(neq | (shards[1:] != shards[:-1])) + 1
    else:
        change = np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    cols = {k: [] for k, _ in _OUT_FIELDS}
    for s, e in zip(starts, ends):
        d = doc[s:e]
        run_bounds = np.flatnonzero(d[1:] != d[:-1]) + 1
        first_idx = np.concatenate(([0], run_bounds))
        uniq_docs = d[first_idx]
        if tf_col is None:
            tf = np.diff(np.concatenate((first_idx, [d.size])))
        else:
            tf = np.add.reduceat(tf_col[s:e], first_idx)
        t = terms[int(s)].as_py()
        sh = int(shards[s])
        for block_id, (
            bn, first, last, max_tf, min_dl, min_tf, max_dl, sum_tf, payload
        ) in enumerate(encode_posting_blocks(uniq_docs, tf, dl[s:e][first_idx])):
            cols["term"].append(t)
            cols["shard"].append(sh)
            cols["block_id"].append(block_id)
            cols["n"].append(bn)
            cols["first_doc"].append(first)
            cols["last_doc"].append(last)
            cols["max_tf"].append(max_tf)
            cols["min_dl"].append(min_dl)
            cols["min_tf"].append(min_tf)
            cols["max_dl"].append(max_dl)
            cols["sum_tf"].append(sum_tf)
            cols["payload"].append(payload)
    yield pa.RecordBatch.from_arrays(
        [pa.array(cols[k], type=t) for k, t in _OUT_FIELDS], schema=_OUT_PA_SCHEMA
    )


def main():
    spark = get_spark("opt-arrow", cpus=16, shuffle_partitions=16)
    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", REPL)
    docs = docs.cache()
    docs.count()
    doc_space = n_docs

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def arrow_plan():
        stream = tokens_with_dl(docs).withColumn(
            "shard",
            F.expr(
                f"CAST((doc_id * CAST({N_SHARDS} AS BIGINT)) DIV "
                f"CAST({doc_space} AS BIGINT) AS INT)"
            ),
        )
        return (
            stream.repartition(PARTS, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInArrow(_encode_arrow, SEGMENT_SCHEMA)
        )

    def timed(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.2f}s", flush=True)

    timed("segments_pandas_noop", lambda: noop(
        build_segments(tokens_with_dl(docs), doc_space, N_SHARDS, PARTS)))
    timed("segments_arrow_noop", lambda: noop(arrow_plan()))
    # equality
    a = build_segments(tokens_with_dl(docs), doc_space, N_SHARDS, PARTS) \
        .select("term", "shard", "block_id", "n", "first_doc", "sum_tf") \
        .orderBy("term", "shard", "block_id").collect()
    b = arrow_plan().select("term", "shard", "block_id", "n", "first_doc", "sum_tf") \
        .orderBy("term", "shard", "block_id").collect()
    print("equal:", a == b)
    spark.stop()


if __name__ == "__main__":
    main()
