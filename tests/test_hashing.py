"""Golden tests for murmur2-64 — values from the reference's own test suite
(reference tests/test_hash.cpp:33-39). Rank-identity with the reference
depends on reproducing these exactly."""

import numpy as np

from alexandria_spark.functions.hashing import hash64, murmur2_64, to_i64

GOLDENS = {
    "testing": 4540905123118180926,
    "": 6142509188972423790,
    "abcdefghijklmnopqrstuvxyz": 17219978627035894604,
    "123": 10089081994332581363,
    "1234": 15651099383784684535,
}


def test_reference_goldens():
    for s, expected in GOLDENS.items():
        assert hash64(s) == expected, s


def test_batched_matches_scalar():
    keys = list(GOLDENS) + ["c++", "c#", "a" * 100, "x" * 8, "y" * 16, "éclair"]
    batch = murmur2_64(np.asarray(keys, dtype=object))
    for i, k in enumerate(keys):
        assert int(batch[i]) == hash64(k)


def test_bytes_and_str_agree():
    assert hash64("testing") == hash64(b"testing")
    assert hash64("é") == hash64("é".encode("utf-8"))


def test_to_i64_roundtrip():
    u = murmur2_64(["testing"])
    i = to_i64(u)
    assert int(np.uint64(i[0].astype(np.int64))) in (int(u[0]),) or int(
        i[0]
    ) == int(u[0]) - (1 << 64)
    # reinterpretation preserves bits
    assert i.view(np.uint64)[0] == u[0]


def test_all_lengths_mod8():
    # exercise every tail-length branch 0..7 against a pure-python murmur2
    def py_murmur64a(data: bytes, seed: int = 0xC70F6907) -> int:
        m = 0xC6A4A7935BD1E995
        r = 47
        mask = (1 << 64) - 1
        h = (seed ^ ((len(data) * m) & mask)) & mask
        nchunks = len(data) // 8
        for i in range(nchunks):
            k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
            k = (k * m) & mask
            k ^= k >> r
            k = (k * m) & mask
            h ^= k
            h = (h * m) & mask
        rem = len(data) & 7
        if rem:
            tail = int.from_bytes(data[nchunks * 8 :], "little")
            h ^= tail
            h = (h * m) & mask
        h ^= h >> r
        h = (h * m) & mask
        h ^= h >> r
        return h

    for n in range(0, 26):
        s = ("abcdefghijklmnopqrstuvxyz" * 2)[:n]
        assert hash64(s) == py_murmur64a(s.encode()), n
