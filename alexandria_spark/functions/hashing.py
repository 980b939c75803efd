"""Vectorized 64-bit MurmurHash2 (Austin Appleby's public-domain MurmurHash64A).

The reference engine keys every posting list by murmur2-64 of the token with
seed 0xc70f6907 (reference src/algorithm/hash.cpp:37-84). Spark's built-in
``hash()`` (32-bit Murmur3) and ``xxhash64`` are different functions, so
rank-identity with the reference requires this exact hash. Golden values from
the reference's own tests (tests/test_hash.cpp:33-39) are asserted in
tests/test_hashing.py.

Implementation: pure numpy, batched over arrays of strings/bytes — all
per-element work is vectorized (the only O(n) Python-level op is one
``b"".join``). Intended to be called from Arrow-batched pandas UDFs; hash
the *unique* tokens of a batch and map back for best throughput.
"""

from __future__ import annotations

import numpy as np

_M = np.uint64(0xC6A4A7935BD1E995)
_R = np.uint64(47)
DEFAULT_SEED = np.uint64(0xC70F6907)

_U64_1 = np.uint64(1)
_U64_7 = np.uint64(7)
_U64_8 = np.uint64(8)
_U64_64 = np.uint64(64)


def murmur2_64(values, seed: int | np.uint64 = DEFAULT_SEED) -> np.ndarray:
    """MurmurHash64A of each element. Returns uint64 ndarray.

    ``values``: sequence/ndarray of ``str`` or ``bytes``.
    """
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.uint64)

    bs = [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    max_len = int(lens.max())
    width = max(8, ((max_len + 7) // 8) * 8)

    # Scatter all bytes into one padded (n, width) buffer in a single pass.
    buf = np.zeros((n, width), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        col_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        buf[row_idx, col_idx] = flat

    chunks = buf.view("<u8")  # (n, width//8) little-endian 64-bit lanes
    ulens = lens.astype(np.uint64)
    nchunks = lens // 8

    with np.errstate(over="ignore"):
        h = np.uint64(seed) ^ (ulens * _M)

        for c in range(chunks.shape[1]):
            mask = nchunks > c
            if not mask.any():
                break
            k = chunks[mask, c].copy()
            k *= _M
            k ^= k >> _R
            k *= _M
            hm = h[mask]
            hm ^= k
            hm *= _M
            h[mask] = hm

        rem = ulens & _U64_7
        tmask = rem > 0
        if tmask.any():
            rows = np.nonzero(tmask)[0]
            tail = chunks[rows, nchunks[rows]]
            shift = _U64_64 - rem[rows] * _U64_8  # in [8, 56]
            # zero the bytes beyond the tail
            tail = (tail << shift) >> shift
            hm = h[rows]
            hm ^= tail
            hm *= _M
            h[rows] = hm

        h ^= h >> _R
        h *= _M
        h ^= h >> _R

    return h


def hash64(s: str | bytes, seed: int | np.uint64 = DEFAULT_SEED) -> int:
    """Scalar convenience wrapper (returns Python int in [0, 2^64))."""
    return int(murmur2_64([s], seed)[0])


def to_i64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 hashes as int64 (two's complement) for Spark LongType."""
    return u.view(np.int64)


def i64_hash64(s: str | bytes) -> int:
    """Scalar token id as signed 64-bit int, as stored in Spark columns."""
    return int(np.uint64(hash64(s)).view(np.int64))
