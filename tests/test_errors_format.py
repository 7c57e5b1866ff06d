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
