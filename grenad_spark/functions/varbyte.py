"""Vectorized variable-byte codec + posting-block encoder.

Re-expresses grenad's varint framing (reference src/varint.rs:17-65: LEB128
1-5-byte u32) and its block layout with sparse footer metadata
(src/block_writer.rs:95-134) as NumPy array programs — zero per-row Python, so
they run inside Arrow-batched pandas UDFs at full speed.

Posting payload layout (one block, ≤ BLOCK_SIZE postings):
    varbyte([abs_doc_0, tf_0, dl_0,  gap_1, tf_1, dl_1,  ...])
- doc gaps are deltas vs the previous posting in the SAME block; each block
  restarts with an absolute doc_id, so blocks decode independently (grenad's
  independently-seekable compressed blocks, src/block.rs:47-73).
- dl (doc length) rides along so BM25 scoring inside a query UDF needs no
  join against a norms table — the posting stream is self-contained.

Block metadata (grenad's sparse footer index + our block-max-WAND addition):
  first_doc, last_doc, max_tf, max_tfpart per block -> next_geq() block
  skipping (BlockCursor binary-search analog, src/block.rs:214-255) and
  block-max upper-bound scoring.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block (grenad: 8 KiB target, src/writer.rs:12)
STRIDE = 3  # values per posting: gap, tf, dl


# ---------------------------------------------------------------------------
# varbyte core: u64 values <-> LEB128 bytes, fully vectorized
# ---------------------------------------------------------------------------

def varbyte_lengths(v: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (>=1), vectorized."""
    from grenad_spark.functions import native

    nat = native.lengths(np.asarray(v, dtype=np.uint64))
    if nat is not None:
        return nat
    nbits = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbits += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return nbits


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint array to LEB128 (7 bits/byte, high bit = continuation).

    Uses the C fast path (functions/native.py) when available — bit-identical
    output, ~22× faster; falls back to the layered NumPy encoder."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    from grenad_spark.functions import native

    nat = native.encode(v)
    if nat is not None:
        return nat
    nbits = varbyte_lengths(v)
    total = int(nbits.sum())
    out = np.empty(total, dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(nbits)[:-1]))
    for j in range(int(nbits.max())):  # ≤10 layers for u64
        mask = nbits > j
        idx = offsets[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbits[mask] - 1) > j
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized).

    Uses the C fast path (functions/native.py) when available — bit-identical
    output, ~15× faster; falls back to the NumPy scatter decoder."""
    from grenad_spark.functions import native

    nat = native.decode(data)
    if nat is not None:
        return nat
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    val_idx = np.concatenate(([0], np.cumsum(is_end)[:-1]))
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    within = np.arange(b.size, dtype=np.int64) - starts[val_idx]
    out = np.zeros(int(is_end.sum()), dtype=np.uint64)
    np.add.at(
        out, val_idx, (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * within.astype(np.uint64))
    )
    return out


# ---------------------------------------------------------------------------
# posting blocks (strided: doc gap + per-posting int columns)
# ---------------------------------------------------------------------------

def _interleave(doc_ids: np.ndarray, cols: list[np.ndarray], block_size: int = BLOCK_SIZE) -> np.ndarray:
    n = doc_ids.size
    stride = 1 + len(cols)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = doc_ids[0]
    gaps[1:] = np.diff(doc_ids).astype(np.uint64)
    starts = np.arange(0, n, block_size)
    gaps[starts] = doc_ids[starts].astype(np.uint64)  # block restart points
    flat = np.empty(stride * n, dtype=np.uint64)
    flat[0::stride] = gaps
    for i, c in enumerate(cols):
        flat[i + 1 :: stride] = c.astype(np.uint64)
    return flat


def encode_posting_blocks(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = BLOCK_SIZE
) -> list[tuple[int, int, int, int, int, int, int, int, bytes]]:
    """Encode one term's postings as independent per-block payloads.

    Returns [(n, first_doc, last_doc, max_tf, min_dl, min_tf, max_dl, sum_tf,
    payload), ...] in doc order. max_tf + min_dl give the block-max WAND
    UPPER bound: the BM25 tf-part is increasing in tf and decreasing in dl,
    so score_ub(block) = idf * tfpart(max_tf, min_dl) dominates every doc in
    the block (grenad block footer metadata analog,
    src/block_writer.rs:126-134). min_tf + max_dl give the dual LOWER bound
    — score_lb(block) = idf * tfpart(min_tf, max_dl) is GUARANTEED by every
    doc in the block, which is what lets the serving plan compute a valid
    top-k threshold θ from metadata alone and prune blocks BEFORE their
    payloads cross the shuffle (query/search.py metadata prune pass).
    doc_ids must be strictly increasing (Writer::insert key-order assertion,
    src/block_writer.rs:109 — violated input is a build bug, so we assert).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return []
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        from grenad_spark.errors import InvalidKeyOrder

        raise InvalidKeyOrder("doc_ids must be strictly increasing")
    flat = _interleave(doc_ids, [tfs, dls], block_size)
    lens = varbyte_lengths(flat)
    byte_cum = np.concatenate(([0], np.cumsum(lens)))
    payload = varbyte_encode(flat)
    starts = np.arange(0, n, block_size)
    ends = np.minimum(starts + block_size, n)
    bstart = byte_cum[STRIDE * starts]
    bend = np.append(bstart[1:], byte_cum[-1])
    max_tf = np.maximum.reduceat(tfs, starts)
    min_dl = np.minimum.reduceat(dls, starts)
    min_tf = np.minimum.reduceat(tfs, starts)
    max_dl = np.maximum.reduceat(dls, starts)
    sum_tf = np.add.reduceat(tfs, starts)
    return [
        (
            int(ends[i] - starts[i]),
            int(doc_ids[starts[i]]),
            int(doc_ids[ends[i] - 1]),
            int(max_tf[i]),
            int(min_dl[i]),
            int(min_tf[i]),
            int(max_dl[i]),
            int(sum_tf[i]),
            payload[int(bstart[i]) : int(bend[i])],
        )
        for i in range(starts.size)
    ]


# ---------------------------------------------------------------------------
# optional per-block payload compression — grenad's per-block codec layer
# (src/compression.rs:9-28: None/Snappy/Zlib/Lz4/Zstd; stdlib zlib here,
# parquet-level zstd covers the storage layer). Payloads are small (≤ ~1 KiB
# varbyte), so "none" is the default; zlib pays off for long high-dl blocks.
# ---------------------------------------------------------------------------

# Full grenad codec matrix (src/compression.rs:9-28 None/Snappy/Zlib/Lz4/
# Zstd; SnappyPre05 is a legacy wire-compat variant with no Python analog).
# zlib is stdlib; snappy/lz4/zstd ride on pyarrow's codecs with a 4-byte
# little-endian raw-length header (pyarrow.decompress needs the decoded size,
# which grenad stores in its block header too).
#
# WriterBuilder::compression_level (src/writer.rs:46-52) rides inside the
# codec string as "name:level" ("zstd:19", "zlib:9") so one string threads
# the whole knob through manifest, compaction generations, and every read
# path. Honored for zlib/zstd exactly as grenad (compression.rs:111-113,
# 191-193) plus lz4 (grenad ignores it there, compression.rs:217, but
# pyarrow's lz4 supports levels 1-12 so we honor it); accepted-but-ignored
# for snappy (compression.rs:165) and none, mirroring grenad's `_level`
# arms. Decompression is level-agnostic for every codec in the matrix, so
# readers only need the base name.
PAYLOAD_CODECS = ("none", "zlib", "snappy", "lz4", "zstd")
_ARROW_CODECS = {"snappy", "lz4", "zstd"}
_LEVEL_CODECS = {"zlib", "zstd", "lz4"}


def split_codec(codec: str) -> tuple[str, int | None]:
    """'zstd:19' -> ('zstd', 19); 'zstd' -> ('zstd', None). Unknown base
    names or malformed levels raise InvalidCompressionType (grenad
    Error::InvalidCompressionType, src/error.rs:6-15)."""
    from grenad_spark.errors import InvalidCompressionType

    name, sep, lvl = codec.partition(":")
    if name not in PAYLOAD_CODECS:
        raise InvalidCompressionType(f"unknown payload codec {codec!r}")
    if not sep:
        return name, None
    try:
        return name, int(lvl)
    except ValueError:
        raise InvalidCompressionType(
            f"invalid compression level {lvl!r} in payload codec {codec!r}"
        ) from None


def _arrow_codec_available(codec: str) -> bool:
    try:
        import pyarrow as pa

        return bool(pa.Codec.is_available(codec))
    except Exception:  # pragma: no cover - pyarrow always present here
        return False


def _reject_codec(codec: str) -> None:
    """Distinguish the two failure modes (a valid index built elsewhere must
    not read as 'corrupt' just because this pyarrow build lacks its codec):
    unknown codec → InvalidCompressionType (grenad Error::InvalidCompressionType,
    src/error.rs:6-15); known-but-unavailable → RuntimeError naming the
    missing runtime dependency."""
    if codec in PAYLOAD_CODECS:
        raise RuntimeError(
            f"payload codec {codec!r} is valid but not available in this "
            f"pyarrow build — install a pyarrow with {codec} support to read "
            f"this index"
        )
    from grenad_spark.errors import InvalidCompressionType

    raise InvalidCompressionType(f"unknown payload codec {codec!r}")


def compress_payload(payload: bytes, codec: str) -> bytes:
    codec, level = split_codec(codec)
    if codec == "none":
        return payload
    if codec == "zlib":
        import zlib

        return zlib.compress(payload, 6 if level is None else level)
    if codec in _ARROW_CODECS and _arrow_codec_available(codec):
        import pyarrow as pa

        if level is None or codec not in _LEVEL_CODECS:
            body = pa.compress(payload, codec=codec, asbytes=True)
        else:
            body = pa.Codec(codec, compression_level=level).compress(
                payload, asbytes=True
            )
        return len(payload).to_bytes(4, "little") + body
    _reject_codec(codec)


def decompress_payload(payload: bytes, codec: str) -> bytes:
    codec, _ = split_codec(codec)
    if codec == "none":
        return payload
    if codec == "zlib":
        import zlib

        return zlib.decompress(payload)
    if codec in _ARROW_CODECS and _arrow_codec_available(codec):
        import pyarrow as pa

        raw_len = int.from_bytes(payload[:4], "little")
        return pa.decompress(payload[4:], decompressed_size=raw_len, codec=codec, asbytes=True)
    _reject_codec(codec)


def decompress_payloads(payloads: list[bytes], codec: str) -> list[bytes]:
    if split_codec(codec)[0] == "none":
        return payloads
    return [decompress_payload(p, codec) for p in payloads]


def decode_block_rows(payloads: list[bytes], ns: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decode of many independent block payloads at once.

    ns[i] = posting count of payloads[i] (the segment-row `n` column). One
    varbyte pass over the concatenated bytes, then a restart-aware cumsum —
    no per-block Python beyond the byte join.
    Returns (doc_ids, tfs, dls) concatenated in input order.
    """
    ns = np.asarray(ns, dtype=np.int64)
    if len(payloads) == 0 or ns.sum() == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    flat = varbyte_decode(b"".join(payloads))
    gaps = flat[0::STRIDE].astype(np.int64)
    tfs = flat[1::STRIDE].astype(np.int64)
    dls = flat[2::STRIDE].astype(np.int64)
    c = np.cumsum(gaps)
    restarts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    offsets = np.zeros(restarts.size, dtype=np.int64)
    offsets[1:] = c[restarts[1:] - 1]
    lens = np.diff(np.append(restarts, gaps.size))
    doc_ids = c - np.repeat(offsets, lens)
    return doc_ids, tfs, dls


def decode_block(payload: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode exactly one block payload -> (doc_ids, tfs, dls)."""
    flat = varbyte_decode(payload)
    gaps = flat[0::STRIDE].astype(np.int64)
    tfs = flat[1::STRIDE].astype(np.int64)
    dls = flat[2::STRIDE].astype(np.int64)
    return np.cumsum(gaps), tfs, dls


def decode_block_list(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a list of independent block payloads (arbitrary sizes)."""
    if not payloads:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    parts = [decode_block(p) for p in payloads]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )


def merge_posting_blocks(payload_lists: list[list[bytes]]) -> list[tuple[int, int, int, int, int, int, int, int, bytes]]:
    """MergeFunction for postings across segment generations (MergerIter's
    one-merge-call-per-key, src/merger.rs:173-186): decode every generation,
    merge by doc_id — LAST generation wins on doc collision (a re-crawled
    doc replaces its posting; generations are passed oldest→newest, the
    src/merger.rs:51-57 source-order contract) — then re-encode."""
    decoded = [decode_block_list(p) for p in payload_lists if p]
    if not decoded:
        return []
    doc_ids = np.concatenate([d[0] for d in decoded])
    tfs = np.concatenate([d[1] for d in decoded])
    dls = np.concatenate([d[2] for d in decoded])
    gen = np.concatenate(
        [np.full(d[0].size, i, dtype=np.int64) for i, d in enumerate(decoded)]
    )
    order = np.lexsort((gen, doc_ids))  # doc asc, then generation asc
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    # keep LAST occurrence per doc (newest generation)
    keep = np.ones(doc_ids.size, dtype=bool)
    keep[:-1] = doc_ids[1:] != doc_ids[:-1]
    return encode_posting_blocks(doc_ids[keep], tfs[keep], dls[keep])
