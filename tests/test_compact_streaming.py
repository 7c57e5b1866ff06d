"""Generation compaction (Merger analog) + streaming incremental build."""

import os

from pyspark.sql import functions as F

from grenad_spark.index.build import build_index
from grenad_spark.index.compact import compact_indexes
from grenad_spark.query.bm25 import REFERENCE_QUERIES, bm25_topk
from grenad_spark.query.search import search_topk


def _norm(df):
    return sorted(map(tuple, df.toPandas()[["query_id", "doc_id", "score"]].values.tolist()))


def test_compacted_equals_single_build(spark, docs_small, tmp_path):
    """Split corpus into 3 disjoint generations; compaction must equal one
    monolithic build (MergerIter over chunks == one big sorted file)."""
    parts = [
        docs_small.filter(F.col("doc_id") % 3 == i).select("doc_id", "text")
        for i in range(3)
    ]
    gen_paths = []
    for i, p in enumerate(parts):
        out = str(tmp_path / f"gen{i}")
        build_index(spark, p, out, n_shards=2)
        gen_paths.append(out)
    compacted = compact_indexes(
        spark, gen_paths, str(tmp_path / "compacted"), docs=docs_small
    )
    mono = build_index(spark, docs_small, str(tmp_path / "mono"), n_shards=2)

    t_c = sorted(map(tuple, compacted.term_dict(spark).select("term", "df", "cf").collect()))
    t_m = sorted(map(tuple, mono.term_dict(spark).select("term", "df", "cf").collect()))
    assert t_c == t_m

    r_c = _norm(search_topk(spark, compacted, REFERENCE_QUERIES, mode="wand"))
    r_m = _norm(search_topk(spark, mono, REFERENCE_QUERIES, mode="wand"))
    assert r_c == r_m


def test_compaction_newest_generation_wins(spark, tmp_path):
    """A re-crawled doc (same doc_id, new text) must take the newest posting."""
    old = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "delta delta")], "doc_id long, text string"
    )
    p_old, p_new = str(tmp_path / "old"), str(tmp_path / "new")
    build_index(spark, old, p_old, n_shards=1)
    build_index(spark, new, p_new, n_shards=1)
    idx = compact_indexes(spark, [p_old, p_new], str(tmp_path / "c"))
    td = {r["term"]: (r["df"], r["cf"]) for r in idx.term_dict(spark).collect()}
    # doc 1 was re-crawled: ALL its old postings (alpha, gamma) die via the
    # doc-level tombstone (newest generation containing the doc wins)
    assert td["delta"] == (1, 2)
    assert td["alpha"] == (1, 1)  # only doc 0 keeps alpha
    assert "gamma" not in td  # doc 1's stale gamma posting removed
    assert td["beta"] == (1, 1)
    # stats reflect the live doc set
    assert idx.n_docs == 2


def test_streaming_incremental_build(spark, docs_small, tmp_path):
    """availableNow stream over 3 corpus files → 3 generations → compact →
    same results as a monolithic build."""
    from grenad_spark.index.compact import compact_indexes
    from grenad_spark.streaming.incremental import (
        generation_paths,
        incremental_index_stream,
    )

    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    # three files = three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        (
            docs_small.filter(F.col("doc_id") % 3 == i)
            .select("doc_id", "text")
            .coalesce(1)
            .write.parquet(f"{stream_dir}/part{i}")
        )
    # flatten: move parquet files up so the stream source sees three files
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(f"{stream_dir}/part*/part-*.parquet"))):
        shutil.move(f, f"{stream_dir}/batch{i}.parquet")
    for i in range(3):
        shutil.rmtree(f"{stream_dir}/part{i}")

    index_root = str(tmp_path / "idx")
    q = incremental_index_stream(
        spark, stream_dir, index_root, str(tmp_path / "ckpt"), n_shards=2
    )
    q.awaitTermination(120)
    gens = generation_paths(index_root)
    assert len(gens) == 3, gens
    compacted = compact_indexes(spark, gens, str(tmp_path / "c"), docs=docs_small)
    mono = build_index(spark, docs_small, str(tmp_path / "mono2"), n_shards=2)
    t_c = sorted(map(tuple, compacted.term_dict(spark).select("term", "df", "cf").collect()))
    t_m = sorted(map(tuple, mono.term_dict(spark).select("term", "df", "cf").collect()))
    assert t_c == t_m
