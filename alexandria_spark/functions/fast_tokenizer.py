"""Byte-level vectorized tokenizer — the engine's hot path.

Same semantics as functions/tokenizer.py (reference text.cpp:109-130, see
that module's docstring), implemented over a single concatenated uint8
buffer per Arrow batch:

  * boundary detection, ASCII-lowercasing, both-end trimming and the
    1..100-BYTE length filter are numpy table lookups / slice arithmetic —
    no per-token Python objects are created;
  * murmur2-64 runs directly over (buffer, start, length) slices;
  * tf/doc_len aggregation is a lexsort + run-length pass.

Rationale: the pandas/str implementation tops out ~260k tokens/s/core and
contends badly across 32 python workers (allocator/bandwidth). This path is
~10-40x faster and scales, which is what the 100 TB build lives or dies on.
Equivalence with the reference-golden tokenizer is property-tested
(tests/test_fast_tokenizer.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alexandria_spark.config import TRIM_CHARS, WORD_BOUNDARY
from alexandria_spark.functions.hashing import _M, _R, DEFAULT_SEED

_U64_7 = np.uint64(7)
_U64_8 = np.uint64(8)
_U64_64 = np.uint64(64)

# byte classification tables
_IS_BOUNDARY = np.zeros(256, dtype=bool)
for _c in WORD_BOUNDARY.encode():
    _IS_BOUNDARY[_c] = True
_IS_TRIM = np.zeros(256, dtype=bool)
for _c in TRIM_CHARS.encode():
    _IS_TRIM[_c] = True
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32  # A-Z -> a-z, bytes >= 0x80 untouched (C tolower)

MAX_WORD_BYTES = 100


def _concat_docs(text: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate utf-8 doc bytes; returns (buf, doc_end_offsets)."""
    bs = text.fillna("").astype(str).str.encode("utf-8").to_numpy()
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    ends = np.cumsum(lens)
    buf = (
        np.frombuffer(b"".join(bs), dtype=np.uint8).copy()
        if len(bs)
        else np.empty(0, np.uint8)
    )
    return buf, ends


def tokenize_slices(text: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch into byte slices.

    Returns (buf, doc_idx, starts, lens): lowercased byte buffer plus, per
    kept token, its document row index and [start, start+len) slice.
    """
    buf, doc_ends = _concat_docs(text)
    n = len(buf)
    empty = (buf, np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if n == 0:
        return empty
    buf = _LOWER[buf]

    # split points: boundary bytes and document edges both terminate fields.
    is_b = _IS_BOUNDARY[buf]
    # mark document boundaries as virtual splits by treating each doc
    # separately via a combined "cut" mask over positions 0..n (fences).
    cut = np.zeros(n + 1, dtype=bool)
    cut[0] = True
    cut[n] = True
    cut[np.nonzero(is_b)[0]] = True  # a boundary byte cuts before+after itself
    cut[np.nonzero(is_b)[0] + 1] = True
    cut[doc_ends[:-1]] = True  # doc edge
    # field = maximal run between cuts that contains no boundary byte
    cut_pos = np.nonzero(cut)[0]
    f_starts = cut_pos[:-1]
    f_ends = cut_pos[1:]
    # drop fields that are just a boundary byte
    keep = ~(
        (f_ends - f_starts == 1) & is_b[np.minimum(f_starts, n - 1)]
    )
    f_starts, f_ends = f_starts[keep], f_ends[keep]
    if len(f_starts) == 0:
        return empty

    # trim both ends over the trim set (greedy, vectorized sweeps)
    s = f_starts.copy()
    e = f_ends.copy()
    while True:
        m = (s < e) & _IS_TRIM[buf[np.minimum(s, n - 1)]]
        if not m.any():
            break
        s[m] += 1
    while True:
        m = (s < e) & _IS_TRIM[buf[np.maximum(e - 1, 0)]]
        if not m.any():
            break
        e[m] -= 1
    lens = e - s
    ok = (lens > 0) & (lens <= MAX_WORD_BYTES)
    s, lens = s[ok], lens[ok]

    # map token start offsets to doc rows
    doc_idx = np.searchsorted(doc_ends, s, side="right")
    return buf, doc_idx.astype(np.int64), s.astype(np.int64), lens.astype(np.int64)


def murmur2_64_slices(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray,
    seed=DEFAULT_SEED, chunk: int = 262_144,
) -> np.ndarray:
    """MurmurHash64A over (buf, start, len) byte slices; uint64 output.

    Identical to functions.hashing.murmur2_64 (golden-tested), but gathers
    straight from the shared buffer — no bytes objects. Processes in chunks
    to bound the padded scratch matrix.
    """
    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        out[lo:hi] = _murmur_chunk(buf, starts[lo:hi], lens[lo:hi], np.uint64(seed))
    return out


def _murmur_chunk(buf, starts, lens, seed):
    n = len(starts)
    if n == 0:
        return np.empty(0, np.uint64)
    max_len = int(lens.max()) if n else 0
    width = max(8, ((max_len + 7) // 8) * 8)
    padded = np.zeros((n, width), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        cum = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=cum[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
        src = np.repeat(starts, lens) + within
        padded[np.repeat(np.arange(n, dtype=np.int64), lens), within] = buf[src]

    chunks = padded.view("<u8")
    ulens = lens.astype(np.uint64)
    nchunks = lens // 8
    with np.errstate(over="ignore"):
        h = seed ^ (ulens * _M)
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
        rows = np.nonzero(rem > 0)[0]
        if len(rows):
            tail = chunks[rows, nchunks[rows]]
            shift = _U64_64 - rem[rows] * _U64_8
            tail = (tail << shift) >> shift
            hm = h[rows]
            hm ^= tail
            hm *= _M
            h[rows] = hm
        h ^= h >> _R
        h *= _M
        h ^= h >> _R
    return h


_IS_BLEND = np.zeros(256, dtype=bool)
for _c in b".-:":
    _IS_BLEND[_c] = True


def expand_blend_slices(
    buf: np.ndarray, doc_idx: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized blend-char expansion (reference
    get_expanded_full_text_words, text.cpp:253-285): every kept token that
    contains '.', '-' or ':' additionally emits its split sub-words — each
    both-end trimmed, and kept even when empty (the reference pushes the
    trimmed sub-word unconditionally) — immediately after the parent token.
    Returns new (doc_idx, starts, lens); slices still index into ``buf``.
    """
    T = len(starts)
    if T == 0:
        return doc_idx, starts, lens
    n = len(buf)
    ends = starts + lens
    bp = np.nonzero(_IS_BLEND[buf])[0]  # every blend byte position in buf
    lo = np.searchsorted(bp, starts)
    hi = np.searchsorted(bp, ends)
    k = (hi - lo).astype(np.int64)      # blend chars inside each token
    has = k > 0
    if not has.any():
        return doc_idx, starts, lens
    kh = k[has]
    n_sub = kh + 1                      # sub-words per expanding token
    total_sub = int(n_sub.sum())
    # flattened in-token blend positions, token-major order
    off = np.zeros(len(kh), np.int64)
    np.cumsum(kh[:-1], out=off[1:])
    flat = bp[np.repeat(lo[has], kh)
              + (np.arange(int(kh.sum()), dtype=np.int64) - np.repeat(off, kh))]
    # sub-slice [s, e) boundaries: first starts at the token start, the rest
    # after each blend char; all but the last end at a blend char
    sub_off = np.zeros(len(kh), np.int64)
    np.cumsum(n_sub[:-1], out=sub_off[1:])
    s_sub = np.empty(total_sub, np.int64)
    e_sub = np.empty(total_sub, np.int64)
    mask_first = np.zeros(total_sub, bool)
    mask_first[sub_off] = True
    mask_last = np.zeros(total_sub, bool)
    mask_last[sub_off + kh] = True
    s_sub[mask_first] = starts[has]
    s_sub[~mask_first] = flat + 1
    e_sub[mask_last] = ends[has]
    e_sub[~mask_last] = flat
    # trim both ends (same sweeps as tokenize_slices); empties survive
    while True:
        m = (s_sub < e_sub) & _IS_TRIM[buf[np.minimum(s_sub, n - 1)]]
        if not m.any():
            break
        s_sub[m] += 1
    while True:
        m = (s_sub < e_sub) & _IS_TRIM[buf[np.maximum(e_sub - 1, 0)]]
        if not m.any():
            break
        e_sub[m] -= 1
    # interleave: parent token, then its sub-words
    out_n = np.where(has, k + 2, 1).astype(np.int64)
    out_off = np.zeros(T, np.int64)
    np.cumsum(out_n[:-1], out=out_off[1:])
    total = int(out_n.sum())
    d_out = np.empty(total, np.int64)
    s_out = np.empty(total, np.int64)
    l_out = np.empty(total, np.int64)
    d_out[out_off] = doc_idx
    s_out[out_off] = starts
    l_out[out_off] = lens
    sub_pos = np.repeat(out_off[has] + 1, n_sub) + (
        np.arange(total_sub, dtype=np.int64) - np.repeat(sub_off, n_sub)
    )
    d_out[sub_pos] = np.repeat(doc_idx[has], n_sub)
    s_out[sub_pos] = s_sub
    l_out[sub_pos] = e_sub - s_sub
    return d_out, s_out, l_out


def ngram_slices(
    buf: np.ndarray, doc_idx: np.ndarray, starts: np.ndarray, lens: np.ndarray, j: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build order-j n-gram byte strings (tokens joined by single spaces —
    reference text.cpp:360-373) from token slices. Returns a NEW buffer plus
    (doc_idx, starts, lens) of the grams. Fully vectorized (j scatter passes).
    """
    n = len(starts)
    empty = (np.empty(0, np.uint8), np.empty(0, np.int64),
             np.empty(0, np.int64), np.empty(0, np.int64))
    if n < j:
        return empty
    base = np.nonzero(doc_idx[j - 1:] == doc_idx[: n - j + 1])[0]
    if len(base) == 0:
        return empty
    glens = np.full(len(base), j - 1, dtype=np.int64)  # the j-1 spaces
    for k in range(j):
        glens += lens[base + k]
    gstarts = np.zeros(len(base), dtype=np.int64)
    np.cumsum(glens[:-1], out=gstarts[1:])
    out = np.empty(int(glens.sum()), dtype=np.uint8)
    prefix = np.zeros(len(base), dtype=np.int64)  # offset of constituent k
    for k in range(j):
        tl = lens[base + k]
        total = int(tl.sum())
        cum = np.zeros(len(base), dtype=np.int64)
        np.cumsum(tl[:-1], out=cum[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, tl)
        out[np.repeat(gstarts + prefix, tl) + within] = buf[
            np.repeat(starts[base + k], tl) + within
        ]
        if k < j - 1:
            out[gstarts + prefix + tl] = 0x20  # ' '
            prefix += tl + 1
    return out, doc_idx[base], gstarts, glens


def token_counts_fast(
    text: pd.Series, keep_term: bool = False, n_grams: int = 1,
    expand_blend: bool = False,
) -> pd.DataFrame:
    """Drop-in fast variant of tokenizer.token_counts.

    Columns: row, term_id, tf, doc_len (+ term when keep_term). Row order
    differs from the pandas variant (sorted by (row, term_id) rather than
    first occurrence); contents are identical.

    With ``n_grams`` > 1, every 2..n-gram (space-joined, murmur-hashed like
    the reference's phrase keys) is counted as an additional term;
    ``doc_len`` stays the unigram token count.

    With ``expand_blend``, the token stream is the *expanded* one
    (get_expanded_full_text_words, text.cpp:253-285): blend-char sub-words
    follow their parent token, and ``doc_len`` counts the expanded stream.
    """
    buf, doc_idx, starts, lens = tokenize_slices(text)
    if expand_blend and len(starts):
        doc_idx, starts, lens = expand_blend_slices(buf, doc_idx, starts, lens)
    if len(starts) == 0:
        cols = {
            "row": np.empty(0, np.int64),
            "term_id": np.empty(0, np.int64),
            "tf": np.empty(0, np.int64),
            "doc_len": np.empty(0, np.int64),
        }
        if keep_term:
            cols["term"] = np.empty(0, object)
        return pd.DataFrame(cols)

    doc_lens = np.bincount(doc_idx, minlength=len(text)).astype(np.int64)
    # segments: unigrams from the shared buffer + one built buffer per order
    segments = [(buf, doc_idx, starts, lens)]
    for j in range(2, n_grams + 1):
        seg = ngram_slices(buf, doc_idx, starts, lens, j)
        if len(seg[1]):
            segments.append(seg)
    hashes = np.concatenate(
        [murmur2_64_slices(b, s, l).view(np.int64) for b, _, s, l in segments]
    )
    doc_idx = np.concatenate([d for _, d, _, _ in segments])

    order = np.lexsort((hashes, doc_idx))
    d_s, h_s = doc_idx[order], hashes[order]
    new = np.empty(len(order), dtype=bool)
    new[0] = True
    new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    group_starts = np.nonzero(new)[0]
    tf = np.diff(np.append(group_starts, len(order))).astype(np.int64)
    rows = d_s[group_starts]
    out = {
        "row": rows,
        "term_id": h_s[group_starts],
        "tf": tf,
        "doc_len": doc_lens[rows],
    }
    if keep_term:
        seg_sizes = np.array([len(s[2]) for s in segments], dtype=np.int64)
        seg_ends = np.cumsum(seg_sizes)
        tok_i = order[group_starts]
        seg_of = np.searchsorted(seg_ends, tok_i, side="right")
        terms = np.empty(len(tok_i), dtype=object)
        mems = [s[0].tobytes() for s in segments]
        for j, t in enumerate(tok_i):
            sg = seg_of[j]
            local = t - (seg_ends[sg - 1] if sg else 0)
            b, _, st, ln = segments[sg]
            terms[j] = mems[sg][st[local] : st[local] + ln[local]].decode("utf-8")
        out["term"] = terms
    return pd.DataFrame(out)
