"""r6 session-2 scratch: C LEB128 decoder via gcc+ctypes vs numpy decode."""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from grenad_spark.functions.varbyte import encode_posting_blocks, varbyte_decode

C_SRC = r"""
#include <stdint.h>
#include <stddef.h>

// LEB128 decode: data[n] -> out values, returns count of decoded values.
size_t vb_decode(const uint8_t *data, size_t n, uint64_t *out) {
    size_t oi = 0;
    uint64_t val = 0;
    unsigned shift = 0;
    for (size_t i = 0; i < n; i++) {
        uint8_t b = data[i];
        val |= (uint64_t)(b & 0x7F) << shift;
        if (b & 0x80) {
            shift += 7;
        } else {
            out[oi++] = val;
            val = 0;
            shift = 0;
        }
    }
    return oi;
}

// LEB128 encode: vals[n] -> out bytes, returns byte count.
size_t vb_encode(const uint64_t *vals, size_t n, uint8_t *out) {
    size_t bi = 0;
    for (size_t i = 0; i < n; i++) {
        uint64_t v = vals[i];
        while (v >= 0x80) {
            out[bi++] = (uint8_t)(v & 0x7F) | 0x80;
            v >>= 7;
        }
        out[bi++] = (uint8_t)v;
    }
    return bi;
}
"""


def build_so(tmp="/tmp/opt6_native"):
    os.makedirs(tmp, exist_ok=True)
    src = os.path.join(tmp, "vb.c")
    so = os.path.join(tmp, "libvb.so")
    with open(src, "w") as fh:
        fh.write(C_SRC)
    t0 = time.time()
    subprocess.run(
        ["gcc", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src],
        check=True,
    )
    print(f"gcc compile: {time.time() - t0:.2f}s")
    return so


def main():
    so_path = build_so()
    lib = ctypes.CDLL(so_path)
    lib.vb_decode.restype = ctypes.c_size_t
    lib.vb_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint64)
    ]
    lib.vb_encode.restype = ctypes.c_size_t
    lib.vb_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8),
    ]

    def c_decode(data: bytes) -> np.ndarray:
        out = np.empty(len(data), dtype=np.uint64)
        cnt = lib.vb_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out[:cnt]

    def c_encode(vals: np.ndarray) -> bytes:
        v = np.ascontiguousarray(vals, dtype=np.uint64)
        buf = np.empty(v.size * 10, dtype=np.uint8)
        cnt = lib.vb_encode(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), v.size,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return buf[:cnt].tobytes()

    rng = np.random.default_rng(7)
    n = 1_000_000
    docs = np.cumsum(rng.integers(1, 30, n).astype(np.int64))
    tfs = rng.integers(1, 9, n).astype(np.int64)
    dls = rng.integers(20, 400, n).astype(np.int64)
    blocks = encode_posting_blocks(docs, tfs, dls)
    payload = b"".join(b[8] for b in blocks)
    print(f"{n} postings, payload {len(payload)/1e6:.1f} MB")

    ref = varbyte_decode(payload)
    new = c_decode(payload)
    assert np.array_equal(ref, new), "C decode differs!"
    # encode round-trip
    vals = ref
    enc = c_encode(vals)
    assert enc == payload, "C encode differs!"

    def bench(name, fn, reps=9):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1000:.2f} ms")

    bench("numpy decode", lambda: varbyte_decode(payload))
    bench("C decode    ", lambda: c_decode(payload))
    from grenad_spark.functions.varbyte import varbyte_encode
    bench("numpy encode", lambda: varbyte_encode(vals))
    bench("C encode    ", lambda: c_encode(vals))


if __name__ == "__main__":
    main()
