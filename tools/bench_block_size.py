"""Block-size vs seek-throughput tradeoff — the benches/index-levels.rs
analog (reference sweeps index_levels 0-5 over 1M entries with 639
gte-seeks/iteration; src/writer.rs:72-83 documents the depth knob).

This engine's metadata hierarchy is parquet file/row-group stats + the
per-block sparse footer, so the tunable depth analog is BLOCK SIZE
(postings per block, WriterBuilder::block_size analog): smaller blocks →
more metadata rows and finer seek granularity (less over-decode per seek)
but a bigger block index; larger blocks amortize metadata at the cost of
decoding more postings per landed seek.

Run on demand (not part of the driver bench — results go to BASELINE.md):
    python tools/bench_block_size.py [repl]
Prints one JSON line per block size: {block_size, build_sec, segment_mb,
block_rows, seeks_per_sec_batched, single_seek_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SEEKS = 639  # benches/index-levels.rs:23
BLOCK_SIZES = (32, 128, 512)


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import bench
    from grenad_spark.index.build import IndexHandle, build_index
    from grenad_spark.operators.seek import seek_gte_postings
    from grenad_spark.session import get_spark

    spark = get_spark(
        "bench-block-size", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    docs, n_docs = bench.replicated_docs(spark, bench.SF_DIR, repl)
    docs = docs.cache()
    docs.count()
    for bs in BLOCK_SIZES:
        out = f"/tmp/bench_blocksize_{bs}"
        t0 = time.time()
        build_index(
            spark, docs, out, overwrite=True, partitions=32,
            docs_per_shard=20_000, block_size=bs,
        )
        build_sec = time.time() - t0
        idx = IndexHandle(out)
        seg_mb = sum(f["bytes"] for f in idx.manifest["segment_files"]) / 1e6
        block_rows = idx.segments(spark).count()
        dfm = idx.df_map(spark)
        terms = sorted(dfm)
        doc_space = idx.manifest["max_doc"] + 1
        keys = [
            (i, terms[i % len(terms)], (i * 9973) % doc_space)
            for i in range(N_SEEKS)
        ]
        seek_gte_postings(spark, idx, keys).collect()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            seek_gte_postings(spark, idx, keys).collect()
            best = min(best, time.time() - t0)
        t0 = time.time()
        seek_gte_postings(spark, idx, keys[:1]).collect()
        single = time.time() - t0
        print(
            json.dumps(
                {
                    "block_size": bs,
                    "n_docs": n_docs,
                    "build_sec": round(build_sec, 2),
                    "segment_mb": round(seg_mb, 2),
                    "block_rows": int(block_rows),
                    "seeks_per_sec_batched": round(N_SEEKS / best, 1),
                    "single_seek_sec": round(single, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
