"""Engine error taxonomy (src/error.rs:6-15 analog) + manifest
format-version dispatch (grenad 0.5 reads 0.4 files, src/writer.rs:373-413).
"""

import json
import os

import numpy as np
import pytest

from grenad_spark.errors import (
    InvalidCompressionType,
    InvalidFormatVersion,
    InvalidKeyOrder,
    MergeError,
)
from grenad_spark.functions.varbyte import (
    PAYLOAD_CODECS,
    compress_payload,
    decompress_payload,
    encode_posting_blocks,
)
from grenad_spark.index.build import IndexHandle


def test_codec_matrix_roundtrip():
    """Full grenad codec matrix (src/compression.rs:231-247 round-trip test
    analog): every supported codec must round-trip arbitrary payload bytes."""
    raw = bytes(range(256)) * 17 + b"\x00" * 100
    for codec in PAYLOAD_CODECS:
        assert decompress_payload(compress_payload(raw, codec), codec) == raw, codec


def test_unknown_codec_raises_invalid_compression_type():
    with pytest.raises(InvalidCompressionType):
        compress_payload(b"x", "rot13")
    with pytest.raises(InvalidCompressionType):
        decompress_payload(b"x", "rot13")


def test_known_but_unavailable_codec_raises_runtime_error(monkeypatch):
    """A KNOWN codec this pyarrow build lacks is a missing runtime dependency,
    not a corrupt index — the error must say so (not InvalidCompressionType,
    which conflates the two)."""
    from grenad_spark.functions import varbyte

    monkeypatch.setattr(varbyte, "_arrow_codec_available", lambda c: False)
    with pytest.raises(RuntimeError, match="not available"):
        compress_payload(b"x", "zstd")
    with pytest.raises(RuntimeError, match="not available"):
        decompress_payload(b"x", "zstd")


def test_key_order_violation_raises():
    """Writer::insert key-order contract (src/block_writer.rs:109)."""
    with pytest.raises(InvalidKeyOrder):
        encode_posting_blocks(
            np.array([3, 1, 2]), np.array([1, 1, 1]), np.array([5, 5, 5])
        )


def test_too_many_generations_is_merge_error(spark):
    from grenad_spark.index.compact import MAX_GENERATIONS, compact_indexes

    with pytest.raises(MergeError):
        compact_indexes(spark, ["/nonexistent"] * (MAX_GENERATIONS + 1), "/tmp/x")


def _write_manifest(d, version, extra=None):
    m = {
        "n_docs": 1,
        "avgdl": 2.0,
        "max_doc": 0,
        "n_shards": 1,
    }
    if version is not None:
        m["format_version"] = version
    m.update(extra or {})
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(m, fh)


def test_format_version_dispatch(tmp_path):
    # v0: legacy manifest without format_version or payload_codec keys —
    # must open with codec "none" (grenad reads 0.4 files with 0.5)
    d0 = str(tmp_path / "v0")
    os.makedirs(d0)
    _write_manifest(d0, None)
    h0 = IndexHandle(d0)
    assert h0.format_version == 0
    assert h0.payload_codec == "none"

    # v1: codec recorded explicitly
    d1 = str(tmp_path / "v1")
    os.makedirs(d1)
    _write_manifest(d1, 1, {"payload_codec": "zlib"})
    h1 = IndexHandle(d1)
    assert h1.format_version == 1
    assert h1.payload_codec == "zlib"

    # future version: must refuse loudly, not mis-read
    d9 = str(tmp_path / "v9")
    os.makedirs(d9)
    _write_manifest(d9, 99)
    with pytest.raises(InvalidFormatVersion):
        IndexHandle(d9)


def test_mixed_format_version_compaction_and_serving(spark, tmp_path):
    """A pre-v2 generation (no min_tf/max_dl block columns) must compact
    TOGETHER with v2 generations (decode path; format-gated out of
    copy-through), and serving against it must fall back off the metadata
    prune without wrong answers — grenad 0.5 reads 0.4 files the same way."""
    from pyspark.sql import functions as F

    from grenad_spark.index.build import build_index
    from grenad_spark.index.compact import compact_indexes
    from grenad_spark.query.search import search_topk, search_topk_fresh

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    g0, g1 = str(tmp_path / "g0"), str(tmp_path / "g1")
    build_index(spark, docs.filter(F.col("doc_id") % 2 == 0), g0, n_shards=2)
    build_index(spark, docs.filter(F.col("doc_id") % 2 == 1), g1, n_shards=2)

    # demote g0 to format v1: strip the v2 block columns + manifest version
    seg = spark.read.parquet(os.path.join(g0, "segments")).drop("min_tf", "max_dl")
    seg.write.mode("overwrite").parquet(str(tmp_path / "seg_v1"))
    import shutil

    shutil.rmtree(os.path.join(g0, "segments"))
    shutil.move(str(tmp_path / "seg_v1"), os.path.join(g0, "segments"))
    with open(os.path.join(g0, "manifest.json")) as fh:
        m = json.load(fh)
    m["format_version"] = 1
    with open(os.path.join(g0, "manifest.json"), "w") as fh:
        json.dump(m, fh)
    # serving the v1 index: wand_pruned must FALL BACK, not crash or mis-rank
    h0 = IndexHandle(g0)
    assert h0.format_version == 1
    q = [(1, "alpha w1")]
    a = sorted(map(tuple, search_topk(spark, h0, q, k=5, mode="exhaustive").collect()))
    b = sorted(map(tuple, search_topk(spark, h0, q, k=5, mode="wand_pruned").collect()))
    assert a == b and len(a) > 0

    # mixed-version compaction == monolithic v2 build
    comp = compact_indexes(spark, [g0, g1], str(tmp_path / "c"))
    mono = build_index(spark, docs, str(tmp_path / "mono"), n_shards=2)
    t_c = sorted(map(tuple, comp.term_dict(spark).select("term", "df", "cf").collect()))
    t_m = sorted(map(tuple, mono.term_dict(spark).select("term", "df", "cf").collect()))
    assert t_c == t_m
    # compacted output is full v2 (serves the pruned path)
    assert "min_tf" in comp.segments(spark).columns

    # fresh search across mixed generations
    fresh = search_topk_fresh(spark, [g0, g1], q, k=5)
    merged = search_topk(spark, comp, q, k=5, mode="wand")
    assert sorted(map(tuple, fresh.collect())) == sorted(map(tuple, merged.collect()))


def test_build_progress_live_estimate(spark, tmp_path):
    """Sorter::estimated_dumped_memory_usage analog (src/sorter.rs:460-468):
    the live accumulators a monitor polls mid-build must land exactly on the
    manifest's authoritative totals, which must equal the written table."""
    from pyspark.sql import functions as F

    from grenad_spark.index.build import LAST_BUILD_PROGRESS, build_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma") for i in range(60)],
        "doc_id long, text string",
    )
    idx = build_index(spark, docs, str(tmp_path / "prog"), n_shards=2)
    acc_b = LAST_BUILD_PROGRESS["encoded_payload_bytes"].value
    acc_p = LAST_BUILD_PROGRESS["encoded_postings"].value
    assert acc_b > 0 and acc_p > 0
    assert idx.manifest["encoded_payload_bytes"] == acc_b
    assert idx.manifest["encoded_postings"] == acc_p
    seg = idx.segments(spark).agg(
        F.sum("n").alias("p"), F.sum(F.length("payload")).alias("b")
    ).first()
    assert (int(seg["p"]), int(seg["b"])) == (acc_p, acc_b)
