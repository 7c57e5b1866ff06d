"""The C fast path of the varbyte codec (functions/native.py) must be
bit-identical to the NumPy reference implementation — same bytes from
encode, same values from decode, same per-value lengths."""
from __future__ import annotations

import numpy as np
import pytest

from grenad_spark.functions import native
from grenad_spark.functions.varbyte import (
    varbyte_decode,
    varbyte_encode,
    varbyte_lengths,
)


@pytest.fixture
def numpy_only(monkeypatch):
    """Force the pure-NumPy fallback for the duration of a test."""
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)


CASES = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([127, 128, 129], dtype=np.uint64),
    np.array([0, 1, (1 << 7) - 1, 1 << 7, (1 << 14) - 1, 1 << 14], dtype=np.uint64),
    np.array([(1 << 63) + 12345, (1 << 64) - 1], dtype=np.uint64),
]


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    # mix of magnitudes so every LEB128 length 1..10 appears
    exp = rng.integers(0, 63, n)
    return (rng.integers(0, 1 << 62, n).astype(np.uint64) >> exp.astype(np.uint64))


@pytest.mark.skipif(native.lib() is None, reason="no C toolchain in this env")
def test_native_matches_numpy_reference(numpy_only):
    # numpy_only forces the library functions onto the NumPy path; the
    # native module is driven directly so both impls run on the same input
    L_cached = native._LIB  # noqa: F841 (fixture already nulled it)
    for i, vals in enumerate(CASES + [_rand(10_000, s) for s in range(3)]):
        ref_enc = varbyte_encode(vals)
        ref_len = varbyte_lengths(vals)
        # bypass the monkeypatched gate: call the compiled library directly
        native._TRIED = False
        native._LIB = None
        nat_enc = native.encode(vals)
        nat_dec = native.decode(ref_enc)
        nat_len = native.lengths(vals)
        native._LIB = None
        native._TRIED = True
        assert nat_enc == ref_enc, f"case {i}: encode bytes differ"
        assert np.array_equal(nat_dec, vals), f"case {i}: decode values differ"
        assert np.array_equal(nat_len, ref_len), f"case {i}: lengths differ"


def test_numpy_fallback_roundtrip(numpy_only):
    for vals in CASES + [_rand(5_000, 9)]:
        enc = varbyte_encode(vals)
        assert np.array_equal(varbyte_decode(enc), vals)
