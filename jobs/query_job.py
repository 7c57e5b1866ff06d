"""spark-submit entry point for BM25 top-k queries against a built index.

Usage:
  spark-submit --py-files grenad_spark.zip jobs/query_job.py \
      --index /path/to/index --query "spark window" [--k 10] [--mode wand]

Multiple --query flags run as ONE batched Spark job (the serving shape:
per-query overhead amortizes across the batch).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--mode",
        default="wand",
        choices=[
            "wand", "wand_pruned", "exhaustive", "wand_cursor",
            "shared", "shared_pruned", "auto",
            "fuzzy", "fuzzy2", "prefix", "and",
        ],
        help="wand_pruned = two-pass metadata prune (shuffle ∝ surviving "
        "blocks — pick when the exchange is network-bound); shared[_pruned] "
        "= decode-once-score-many batch; auto = per-batch gate on the "
        "measured survivor ratio; fuzzy/fuzzy2 = typo-tolerant "
        "(Levenshtein ≤ 1/2 via the persisted typo tables); prefix = "
        "trailing-* expansion; and = conjunctive",
    )
    ap.add_argument(
        "--max-expansions", type=int, default=None,
        help="prefix mode: cap each prefix to its top-df expansions "
        "(default exhaustive; serving tiers facing web vocabularies "
        "should set one, e.g. 128)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("grenad-query").getOrCreate()
    from grenad_spark.index.build import IndexHandle
    from grenad_spark.query.search import search_topk

    idx = IndexHandle(args.index)
    queries = list(enumerate(args.query, start=1))
    if args.mode in ("shared", "shared_pruned"):
        # decode-once-score-many: best shape for multi-query batches
        from grenad_spark.query.search import search_topk_shared

        res = search_topk_shared(
            spark, idx, queries, k=args.k, prune=args.mode == "shared_pruned"
        )
    elif args.mode == "auto":
        res = idx.search_auto(spark, queries, k=args.k)
    elif args.mode in ("fuzzy", "fuzzy2"):
        res = idx.search_fuzzy(
            spark, queries, k=args.k, max_edits=1 if args.mode == "fuzzy" else 2
        )
    elif args.mode == "prefix":
        res = idx.search_prefix(
            spark, queries, k=args.k, max_expansions=args.max_expansions
        )
    elif args.mode == "and":
        res = idx.search_and(spark, queries, k=args.k)
    else:
        res = search_topk(spark, idx, queries, k=args.k, mode=args.mode)
    for row in res.collect():
        print(f"q{row['query_id']}\t{row['doc_id']}\t{row['score']:.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
