"""Segment-generation compaction — grenad's Merger over existing files.

Reference: Sorter::merge_chunks (src/sorter.rs:576-634) re-merges up to
max_nb_chunks (25, src/sorter.rs:21) spill files into one; MergerIter
(src/merger.rs:126-196) yields one merge call per key with values in
source-index order — keep-newest per doc is our MergeFunction (re-crawl
replaces a page).

Dataflow (all shuffles bounded, reuses the build's sharded encode):

  union(segments × generations)                [block rows, compressed]
    → mapInPandas vectorized decode           [(term, doc_id, tf, dl, gen)]
    → join broadcast(live map: doc → newest   [doc-level tombstones: a doc
      generation containing it)]               present in gen g but absent
    → filter gen == live_gen                   from newer gens keeps ONLY its
                                               newest postings — terms the
                                               newer crawl dropped disappear]
    → build_segments(...)                      [the standard sharded encode]

The live map comes from each generation's persisted docs table (doc_id, dl) —
the membership record that makes deletion expressible (grenad: deletion =
write a new file without the key, src/lib.rs:9-10).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grenad_spark.functions.varbyte import decode_block_rows, decompress_payloads
from grenad_spark.index.build import (
    SEGMENT_SCHEMA,
    IndexHandle,
    build_segments,
    term_dict_from_segments,
)

MAX_GENERATIONS = 25  # grenad max_nb_chunks default (src/sorter.rs:21)

_DECODED_SCHEMA = "term string, doc_id long, tf int, dl int, gen int"


def _make_decode_partition(codec: str):
    def fn(batches):
        return _decode_partition(batches, codec)
    return fn


def _decode_partition(batches: Iterator[pd.DataFrame], codec: str = "none") -> Iterator[pd.DataFrame]:
    """Vectorized block decode: one varbyte pass per (term, gen) run."""
    for pdf in batches:
        out_term, out_doc, out_tf, out_dl, out_gen = [], [], [], [], []
        for (term, gen), g in pdf.groupby(["term", "gen"], sort=False):
            g = g.sort_values(["shard", "block_id"], kind="stable")
            d, tf, dl = decode_block_rows(decompress_payloads(list(g["payload"]), codec), g["n"].to_numpy())
            out_term.append(np.full(d.size, term, dtype=object))
            out_doc.append(d)
            out_tf.append(tf)
            out_dl.append(dl)
            out_gen.append(np.full(d.size, gen, dtype=np.int32))
        if not out_doc:
            continue
        yield pd.DataFrame(
            {
                "term": np.concatenate(out_term),
                "doc_id": np.concatenate(out_doc),
                "tf": np.concatenate(out_tf).astype(np.int32),
                "dl": np.concatenate(out_dl).astype(np.int32),
                "gen": np.concatenate(out_gen),
            }
        )


def compact_indexes(
    spark: SparkSession,
    index_paths: list[str],
    out_dir: str,
    partitions: int | None = None,
    docs: DataFrame | None = None,
) -> IndexHandle:
    """Merge N generation indexes (oldest→newest, newest-wins per doc)."""
    assert 1 <= len(index_paths) <= MAX_GENERATIONS
    handles = [IndexHandle(p) for p in index_paths]
    partitions = partitions or spark.sparkContext.defaultParallelism
    doc_space = max(h.manifest["max_doc"] for h in handles) + 1
    n_shards = max(h.n_shards for h in handles)

    seg_union = None
    docs_union = None
    for i, h in enumerate(handles):
        s = h.segments(spark).withColumn("gen", F.lit(i))
        d = h.docs(spark).withColumn("gen", F.lit(i))
        seg_union = s if seg_union is None else seg_union.unionByName(s)
        docs_union = d if docs_union is None else docs_union.unionByName(d)

    # doc-level tombstones: newest generation containing each doc wins
    live = docs_union.groupBy("doc_id").agg(F.max("gen").alias("live_gen"))
    live_docs = (
        docs_union.join(live, "doc_id")
        .filter(F.col("gen") == F.col("live_gen"))
        .select("doc_id", "dl")
    )

    decoded = seg_union.select("term", "gen", "shard", "block_id", "n", "payload").mapInPandas(
        _make_decode_partition(handles[0].payload_codec), _DECODED_SCHEMA
    )
    # doc-keyed equi-join; AQE picks broadcast when the live map is small —
    # at web scale both sides shuffle-partition on doc_id (co-partitionable)
    tdt = (
        decoded.join(live, "doc_id")
        .filter(F.col("gen") == F.col("live_gen"))
        .select("term", "doc_id", "tf", "dl")
    )

    segments = build_segments(tdt, doc_space, n_shards, partitions)
    os.makedirs(out_dir, exist_ok=True)
    seg_path = os.path.join(out_dir, "segments")
    (
        segments.repartitionByRange(partitions, "term", "shard", "block_id")
        .sortWithinPartitions("term", "shard", "block_id")
        .write.mode("overwrite")
        .parquet(seg_path)
    )
    segments = spark.read.parquet(seg_path)
    term_dict_from_segments(segments).write.mode("overwrite").parquet(
        os.path.join(out_dir, "term_dict")
    )
    live_docs.repartition(max(1, partitions // 8)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "docs")
    )
    st = spark.read.parquet(os.path.join(out_dir, "docs")).agg(
        F.count("*").cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).first()

    manifest = {
        "format_version": 1,
        "n_docs": int(st["n_docs"]),
        "avgdl": float(st["avgdl"]),
        "max_doc": int(doc_space - 1),
        "n_shards": int(n_shards),
        "docs_per_shard": handles[-1].manifest.get("docs_per_shard"),
        "partitions": partitions,
        "compacted_from": [os.path.abspath(p) for p in index_paths],
        "segment_files": [
            {"file": f, "bytes": os.path.getsize(os.path.join(seg_path, f))}
            for f in sorted(os.listdir(seg_path))
            if f.endswith(".parquet")
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return IndexHandle(out_dir)
