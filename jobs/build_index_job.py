"""spark-submit entry point for the index build (north_rule: the build runs
via `spark-submit --py-files` on a multi-executor cluster).

Usage:
  spark-submit --py-files grenad_spark.zip jobs/build_index_job.py \
      --input /path/to/documents.parquet --output /path/to/index \
      [--docs-per-shard 2000000] [--partitions 256] [--compression zstd]

On a cluster, master/executor settings come from spark-submit; locally the
session factory fills in local[*]. The build is checkpoint-resumable: re-run
the same command after a failure and completed stages are skipped.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--docs-per-shard", type=int, default=2_000_000)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--compression", default="zstd")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument(
        "--positions", action="store_true",
        help="also build the positional table (phrase/proximity/mixed/"
        "snippet serving; ~doubles build cost)",
    )
    ap.add_argument(
        "--position-fields", default=None,
        help="comma-separated text columns for FIELD-AWARE positions "
        "(attribute/exactness rules; e.g. 'title,body'); implies --positions",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("grenad-index-build").getOrCreate()
    from grenad_spark.index.build import build_index

    docs = spark.read.parquet(args.input)
    idx = build_index(
        spark,
        docs,
        args.output,
        partitions=args.partitions,
        docs_per_shard=args.docs_per_shard,
        overwrite=args.overwrite,
        compression=args.compression,
    )
    if args.positions or args.position_fields:
        from grenad_spark.index.build import IndexHandle
        from grenad_spark.index.positions import build_positions

        fields = (
            [f.strip() for f in args.position_fields.split(",") if f.strip()]
            if args.position_fields
            else None
        )
        build_positions(
            spark, docs, args.output, partitions=args.partitions, fields=fields
        )
        idx = IndexHandle(args.output)  # manifest picks up the stage
    print(json.dumps({k: v for k, v in idx.manifest.items() if k != "segment_files"}))


if __name__ == "__main__":
    main(sys.argv[1:])
