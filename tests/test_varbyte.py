"""Codec tests — ports of grenad's varint + block round-trip tests.

- qc_codec_u32 (reference src/varint.rs:71-80): encode∘decode = identity,
  here via Hypothesis over arbitrary uint arrays.
- block round-trip + footer metadata (src/block.rs:263-436 style).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grenad_spark.functions.varbyte import (
    BLOCK_SIZE,
    decode_block,
    decode_block_list,
    decode_block_rows,
    encode_posting_blocks,
    merge_posting_blocks,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_identity(values):
    v = np.array(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_varbyte_known_encodings():
    # LEB128 basics: 0 -> 00, 127 -> 7f, 128 -> 80 01, 300 -> ac 02
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@st.composite
def posting_list(draw):
    n = draw(st.integers(min_value=0, max_value=700))
    docs = draw(
        st.lists(
            st.integers(min_value=0, max_value=10**12),
            min_size=n, max_size=n, unique=True,
        )
    )
    docs = sorted(docs)
    tfs = draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n))
    dls = draw(st.lists(st.integers(1, 10**5), min_size=n, max_size=n))
    return (
        np.array(docs, dtype=np.int64),
        np.array(tfs, dtype=np.int64),
        np.array(dls, dtype=np.int64),
    )


@given(posting_list())
@settings(max_examples=100, deadline=None)
def test_posting_blocks_roundtrip(p):
    docs, tfs, dls = p
    blocks = encode_posting_blocks(docs, tfs, dls)
    # per-block decode
    d2 = decode_block_list([b[8] for b in blocks])
    assert np.array_equal(d2[0], docs)
    assert np.array_equal(d2[1], tfs)
    assert np.array_equal(d2[2], dls)
    # vectorized multi-block decode
    d3 = decode_block_rows([b[8] for b in blocks], np.array([b[0] for b in blocks]))
    assert np.array_equal(d3[0], docs)
    assert np.array_equal(d3[1], tfs)
    assert np.array_equal(d3[2], dls)
    # metadata invariants (block footer, src/block_writer.rs:126-134)
    pos = 0
    for n, first, last, max_tf, min_dl, min_tf, max_dl, sum_tf, _ in blocks:
        assert n <= BLOCK_SIZE
        assert first == docs[pos] and last == docs[pos + n - 1]
        assert max_tf == tfs[pos : pos + n].max()
        assert min_dl == dls[pos : pos + n].min()
        assert min_tf == tfs[pos : pos + n].min()
        assert max_dl == dls[pos : pos + n].max()
        assert sum_tf == tfs[pos : pos + n].sum()
        pos += n
    assert pos == docs.size


def test_encode_rejects_unsorted():
    from grenad_spark.errors import InvalidKeyOrder

    with pytest.raises(InvalidKeyOrder):
        encode_posting_blocks(
            np.array([5, 3]), np.array([1, 1]), np.array([1, 1])
        )


def test_merge_last_generation_wins():
    # MergerIter source-order semantics (src/merger.rs:51-57): newest
    # generation replaces the posting for a re-crawled doc.
    g0 = [b[8] for b in encode_posting_blocks(np.array([1, 5, 9]), np.array([2, 3, 4]), np.array([10, 10, 10]))]
    g1 = [b[8] for b in encode_posting_blocks(np.array([5, 7]), np.array([30, 1]), np.array([99, 7]))]
    merged = merge_posting_blocks([g0, g1])
    d, tf, dl = decode_block_list([b[8] for b in merged])
    assert d.tolist() == [1, 5, 7, 9]
    assert tf.tolist() == [2, 30, 1, 4]  # doc 5 took generation-1 value
    assert dl.tolist() == [10, 99, 7, 10]


@st.composite
def generation_postings(draw):
    """2-4 generations with overlapping doc sets (re-crawls)."""
    gens = []
    for _ in range(draw(st.integers(2, 4))):
        n = draw(st.integers(1, 200))
        docs = np.array(sorted(draw(st.sets(st.integers(0, 500), min_size=n, max_size=n))), dtype=np.int64)
        tfs = np.array(draw(st.lists(st.integers(1, 50), min_size=docs.size, max_size=docs.size)), dtype=np.int64)
        dls = np.array(draw(st.lists(st.integers(1, 99), min_size=docs.size, max_size=docs.size)), dtype=np.int64)
        gens.append((docs, tfs, dls))
    return gens


@given(generation_postings())
@settings(max_examples=60, deadline=None)
def test_merge_generations_newest_wins_property(gens):
    payload_lists = [
        [b[8] for b in encode_posting_blocks(d, t, l)] for d, t, l in gens
    ]
    merged = merge_posting_blocks(payload_lists)
    d, tf, dl = decode_block_list([b[8] for b in merged])
    # oracle: dict updated oldest -> newest
    want: dict[int, tuple[int, int]] = {}
    for docs, tfs, dls in gens:
        for i in range(docs.size):
            want[int(docs[i])] = (int(tfs[i]), int(dls[i]))
    assert d.tolist() == sorted(want)
    for i, doc in enumerate(d.tolist()):
        assert (tf[i], dl[i]) == want[doc]


def test_block_boundary_restart():
    # exactly at BLOCK_SIZE boundaries blocks decode independently
    n = BLOCK_SIZE * 3 + 7
    docs = np.arange(100, 100 + 2 * n, 2, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 42, dtype=np.int64)
    blocks = encode_posting_blocks(docs, tfs, dls)
    assert len(blocks) == 4
    assert blocks[-1][0] == 7
    # decode only the third block standalone
    d, _, _ = decode_block(blocks[2][8])
    assert np.array_equal(d, docs[2 * BLOCK_SIZE : 3 * BLOCK_SIZE])
