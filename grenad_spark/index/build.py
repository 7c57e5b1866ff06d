"""Index build — grenad's Sorter/Writer pipeline as a Spark job.

Pipeline (reference trace src/sorter.rs:478-498 insert → :509-574 write_chunk
→ :576-634 merge_chunks → src/writer.rs:164-297 Writer):

  documents (doc_id, text)                     [scan: all other cols pruned]
    → tokenize + (term, doc_id, tf, dl)        [explode + partial-agg groupBy]
    → shard = doc_id * n_shards // n_docs      [global doc-range sharding]
    → groupBy(term, shard).applyInPandas       [Sorter::write_chunk: sort the
        encode_posting_blocks                   group, delta+varbyte blocks
                                                with block-max metadata]
    → window renumber block_id per term        [Merger: shards cover DISJOINT
                                                doc ranges → the k-way merge
                                                is a metadata-only reorder]
    → repartitionByRange(term) + sortWithin    [Writer's sorted immutable run]
    → parquet segments + term_dict + manifest.json

Why doc-range sharding (not hash salting): one mechanism solves three
problems —
1. skew: a head term ("the" at web scale) splits into n_shards bounded
   groups, each ≤ docs_per_shard postings (grenad dump_threshold,
   src/sorter.rs:17-19);
2. distributed query: every shard holds a complete sub-index for its doc
   range, so block-max WAND runs shard-parallel with exact local top-k;
3. mergeability: shard outputs are doc-disjoint, so the final merge never
   decodes payloads — it only renumbers block rows (~1/128 of postings).

Doc lengths (dl) are embedded per posting, so query UDFs score BM25 with no
norms join — the posting stream is self-contained.

Checkpoint-resume: stages are skipped when their output exists (parquet
_SUCCESS). A killed build resumes from the last completed stage; the manifest
records per-file lineage + build metrics (north_rule).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grenad_spark.functions.tokenize import term_doc_tf, tokens_col
from grenad_spark.functions.varbyte import encode_posting_blocks

SEGMENT_SCHEMA = (
    "term string, shard int, block_id int, n int, first_doc long, last_doc long, "
    "max_tf int, min_dl int, sum_tf long, payload binary"
)

# grenad dump_threshold analog: bounds postings per applyInPandas group
# (2M postings ≈ 48 MB decoded). Local tests use small corpora; bench lowers
# it to force multi-shard paths.
DEFAULT_DOCS_PER_SHARD = 2_000_000


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sorter::write_chunk analog: one (term, shard) group -> block rows."""
    pdf = pdf.sort_values("doc_id", kind="stable")
    term = pdf["term"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    blocks = encode_posting_blocks(
        pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy(), pdf["dl"].to_numpy()
    )
    rows = [
        (term, shard, 0, n, first, last, max_tf, min_dl, sum_tf, payload)
        for n, first, last, max_tf, min_dl, sum_tf, payload in blocks
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "term", "shard", "block_id", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "sum_tf", "payload",
        ],
    )


def tokens_with_dl(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl) — tf stream with the doc length carried along.

    The token array is materialized in a projection BELOW the explode so the
    regex split runs once per document; putting size(split(...)) in the same
    select as the explode would re-evaluate it once per exploded row (a ~50×
    regex blow-up measured at sf0.1×16).
    """
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    exploded = toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    return exploded.groupBy("term", "doc_id", "dl").agg(F.count("*").cast("int").alias("tf"))


def build_segments(
    tdt_dl: DataFrame,
    n_docs: int,
    n_shards: int,
) -> DataFrame:
    """(term, doc_id, tf, dl) -> globally block-numbered segment rows."""
    sharded = tdt_dl.withColumn(
        "shard", ((F.col("doc_id") * n_shards) / F.lit(n_docs)).cast("int")
    )
    partial = sharded.groupBy("term", "shard").applyInPandas(_encode_group, SEGMENT_SCHEMA)
    # Merger analog: shards are doc-range disjoint ⇒ ordering blocks by
    # first_doc per term IS the deterministic k-way merge
    # (src/merger.rs:51-57 tie-break; first_doc is unique within a term).
    w = Window.partitionBy("term").orderBy("first_doc")
    return partial.withColumn("block_id", (F.row_number().over(w) - 1).cast("int"))


def term_dict_from_segments(segments: DataFrame) -> DataFrame:
    """(term, df, cf, n_blocks, max_tf) — grenad's index footer as a table."""
    return segments.groupBy("term").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.count("*").cast("int").alias("n_blocks"),
        F.max("max_tf").cast("int").alias("max_tf"),
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    partitions: int | None = None,
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    n_shards: int | None = None,
    overwrite: bool = False,
) -> "IndexHandle":
    """Run the full build; resumable per-stage. docs needs (doc_id, text)."""
    t0 = time.time()
    if overwrite and os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    seg_path = os.path.join(out_dir, "segments")
    dict_path = os.path.join(out_dir, "term_dict")
    stats_path = os.path.join(out_dir, "corpus_stats")
    docs_path = os.path.join(out_dir, "docs")
    manifest_path = os.path.join(out_dir, "manifest.json")
    partitions = partitions or spark.sparkContext.defaultParallelism
    docs = docs.select("doc_id", "text")

    stage_secs: dict[str, float] = {}

    # stage 1: corpus stats (n_docs, avgdl, max_doc) — one tiny agg
    if not _done(stats_path):
        ts = time.time()
        docs.select(
            F.count("*").cast("long").alias("n_docs"),
            F.avg(F.size(tokens_col("text"))).alias("avgdl"),
            F.max("doc_id").cast("long").alias("max_doc"),
        ).coalesce(1).write.mode("overwrite").parquet(stats_path)
        stage_secs["corpus_stats"] = time.time() - ts
    st = spark.read.parquet(stats_path).first()
    n_docs, avgdl, max_doc = st["n_docs"], st["avgdl"], st["max_doc"]
    if n_shards is None:
        n_shards = max(1, -(-(max_doc + 1) // docs_per_shard))
    doc_space = max_doc + 1

    # stage 1b: doc membership table (doc_id, dl) — BM25 norms + the
    # "which docs does this generation contain" record that compaction's
    # newest-generation-wins tombstone semantics require
    if not _done(docs_path):
        ts = time.time()
        from grenad_spark.index.stats import doc_lengths

        doc_lengths(docs).repartition(max(1, partitions // 8)).write.mode(
            "overwrite"
        ).parquet(docs_path)
        stage_secs["docs"] = time.time() - ts

    # stage 2: segments (the wide shuffle + encode)
    if not _done(seg_path):
        ts = time.time()
        segments = build_segments(tokens_with_dl(docs), doc_space, n_shards)
        (
            segments.repartitionByRange(partitions, "term", "block_id")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite")
            .parquet(seg_path)
        )
        stage_secs["segments"] = time.time() - ts
    segments = spark.read.parquet(seg_path)

    # stage 3: term_dict (vocabulary-sized)
    if not _done(dict_path):
        ts = time.time()
        term_dict_from_segments(segments).repartitionByRange(
            max(1, partitions // 8), "term"
        ).sortWithinPartitions("term").write.mode("overwrite").parquet(dict_path)
        stage_secs["term_dict"] = time.time() - ts

    # stage 4: manifest — per-file lineage + metrics (north_rule); the
    # grenad metadata footer (src/metadata.rs:105-115) of this index.
    if not os.path.exists(manifest_path):
        files = [
            {"file": f, "bytes": os.path.getsize(os.path.join(seg_path, f))}
            for f in sorted(os.listdir(seg_path))
            if f.endswith(".parquet")
        ]
        manifest = {
            "format_version": 1,
            "built_at_unix": int(t0),
            "n_docs": int(n_docs),
            "avgdl": float(avgdl),
            "max_doc": int(max_doc),
            "n_shards": int(n_shards),
            "docs_per_shard": docs_per_shard,
            "partitions": partitions,
            "stage_seconds": {k: round(v, 3) for k, v in stage_secs.items()},
            "build_seconds": round(time.time() - t0, 3),
            "segment_files": files,
        }
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=1)
    return IndexHandle(out_dir)


class IndexHandle:
    """Open index: lazy accessors over the persisted tables (Reader::new
    analog, src/reader/mod.rs:22-26 — the manifest is the metadata footer)."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        self.n_docs: int = self.manifest["n_docs"]
        self.avgdl: float = self.manifest["avgdl"]
        self.n_shards: int = self.manifest["n_shards"]

    def segments(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "segments"))

    def term_dict(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "term_dict"))

    def docs(self, spark: SparkSession) -> DataFrame:
        """(doc_id, dl) membership/norms table."""
        return spark.read.parquet(os.path.join(self.path, "docs"))
