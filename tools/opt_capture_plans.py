"""r6: capture explain('formatted') for every touched query path.

Usage: python tools/opt_capture_plans.py <repo_root> <suffix> <out_dir>
Run once with the round-start worktree (suffix 'before') and once with the
current tree (suffix 'after'); indexes under /tmp are shared.
"""
from __future__ import annotations

import os
import sys

REPO = sys.argv[1]
SUFFIX = sys.argv[2]
OUT = sys.argv[3]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from grenad_spark.session import get_spark  # noqa: E402


def dump(name: str, df) -> None:
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"wrote {path} ({len(txt)} bytes)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(
        f"plans-{SUFFIX}", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    from grenad_spark.index.build import IndexHandle, build_segments, tokens_with_dl
    from grenad_spark.index.pairprox import pair_stream, search_topk_proximity_db
    from grenad_spark.operators.seek import seek_gte_postings
    from grenad_spark.query.bm25 import REFERENCE_QUERIES
    from grenad_spark.query.phrase import (
        search_topk_phrase,
        search_topk_phrase_shared,
        search_topk_proximity,
    )
    from grenad_spark.query.search import search_topk, search_topk_shared

    idx = IndexHandle("/tmp/bench_idx_h_large")
    pidx = IndexHandle("/tmp/bench_idx_pairprox")

    q1 = REFERENCE_QUERIES[2:3]
    dump("bm25_wand_single", search_topk(spark, idx, q1, k=10, mode="wand"))
    dump("bm25_wand_batch12", search_topk(spark, idx, REFERENCE_QUERIES, k=10, mode="wand"))
    dump("bm25_shared_batch12", search_topk_shared(spark, idx, REFERENCE_QUERIES, k=10))
    dump("bm25_wand_pruned_batch12", search_topk(spark, idx, REFERENCE_QUERIES, k=10, mode="wand_pruned"))

    dfm = idx.df_map(spark)
    terms = sorted(dfm)
    doc_space = idx.manifest["max_doc"] + 1
    keys = [(i, terms[i % len(terms)], (i * 9973) % doc_space) for i in range(639)]
    dump("seek_gte_batch639", seek_gte_postings(spark, idx, keys))

    phrase_qs = [
        (1, "merge sort"), (2, "the fast"), (3, "key value stream"),
        (4, "dup"), (5, "data batch data"), (6, "hash join"),
        (7, "sort table scan"), (8, "group query row"), (9, "stream batch"),
        (10, "window small"), (11, "customer line"), (12, "slow customer line"),
    ]
    dump("phrase_batch12", search_topk_phrase(spark, idx, phrase_qs, k=10))
    dump("phrase_shared_batch12", search_topk_phrase_shared(spark, idx, phrase_qs, k=10))

    prox_qs = [
        (1, "merge sort"), (2, "the join"), (3, "key value stream"),
        (4, "dup spark"), (5, "data stream"), (6, "hash join"),
        (7, "group query row"), (8, "window the batch"),
    ]
    dump("proximity_positions_batch8", search_topk_proximity(spark, pidx, prox_qs, k=10))
    dump("proximity_pairdb_batch8", search_topk_proximity_db(spark, pidx, prox_qs, k=10))

    fidx_path = "/tmp/bench_idx_fielded"
    if os.path.exists(os.path.join(fidx_path, "manifest.json")):
        from grenad_spark.query.ranked import search_topk_ranked

        fidx = IndexHandle(fidx_path)
        ranked_qs = [
            (1, "data stream"), (2, "merge sort"), (3, "the fast join"),
            (4, "spark window"), (5, "big table"), (6, "key value"),
            (7, "hash join order"), (8, "filter column row"),
        ]
        dump("ranked_batch8", search_topk_ranked(spark, fidx, ranked_qs, k=10))

    # build-side plans (pre-write pipelines)
    import bench  # noqa: E402

    docs, n_docs = bench.replicated_docs(spark, "/root/testdata/sf0.1", 8)
    dump("build_segments_encode", build_segments(tokens_with_dl(docs), n_docs, 32, 64))
    dump("pair_stream_agg", pair_stream(docs))
    spark.stop()


if __name__ == "__main__":
    main()
