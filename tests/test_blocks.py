"""Round-trip + property tests for the delta+varint posting-block codec."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from alexandria_spark.plans.blocks import (
    build_blocks,
    decode_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**32, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    enc, nbytes = varint_encode(vals)
    assert nbytes.tolist() == [1, 1, 1, 2, 2, 2, 3, 5, 10, 10]
    dec = varint_decode(enc.tobytes())
    assert dec.tolist() == vals.tolist()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    enc, _ = varint_encode(vals)
    assert varint_decode(enc.tobytes()).tolist() == xs


def _postings(groups):
    """groups: list of (term_id, salt, [(doc_id, score, tf)]) sorted unsigned."""
    rows = []
    for term_id, salt, posts in groups:
        for doc, score, tf in posts:
            rows.append((term_id, salt, doc, score, tf))
    return pd.DataFrame(rows, columns=["term_id", "salt", "doc_id", "score", "tf"])


def test_block_roundtrip_multi_group():
    rng = np.random.default_rng(7)
    groups = []
    for t in range(5):
        docs = np.sort(
            rng.choice(np.arange(-50, 10_000, dtype=np.int64).view(np.uint64), size=37, replace=False)
        )
        posts = [
            (int(d.astype(np.int64) if hasattr(d, "astype") else d), float(s), int(tf))
            for d, s, tf in zip(
                docs.view(np.int64), rng.random(37).astype(np.float32), rng.integers(1, 9, 37)
            )
        ]
        groups.append((t * 11 - 3, t % 2, posts))
    pdf = _postings(groups)
    blocks = build_blocks(pdf, block_size=8)
    # block structure
    assert (blocks["n"] <= 8).all()
    per_group = blocks.groupby(["term_id", "salt"])["n"].sum()
    assert (per_group == 37).all()
    # max_score metadata
    dec = decode_blocks(blocks, want_tf=True)
    joined = dec.merge(pdf, on=["term_id", "doc_id"], suffixes=("_d", ""))
    assert len(joined) == len(pdf)
    assert np.allclose(joined["score_d"], joined["score"].astype(np.float32))
    assert (joined["tf_d"] == joined["tf"]).all()


def test_block_unsigned_doc_order_and_range():
    # doc ids with the high bit set (negative int64) must sort AFTER positives
    docs_i64 = [5, 100, -9223372036854775808, -5]  # unsigned: 5,100,2^63,2^64-5
    pdf = pd.DataFrame(
        {
            "term_id": [1] * 4,
            "salt": [0] * 4,
            "doc_id": docs_i64,
            "score": np.float32([0.1, 0.2, 0.3, 0.4]),
            "tf": [1, 2, 3, 4],
        }
    )
    blocks = build_blocks(pdf, block_size=2)
    assert len(blocks) == 2
    assert blocks.iloc[0]["min_doc"] == 5 and blocks.iloc[0]["max_doc"] == 100
    dec = decode_blocks(blocks)
    assert dec["doc_id"].tolist() == docs_i64


def test_empty():
    pdf = pd.DataFrame(
        {"term_id": pd.Series([], dtype=np.int64), "salt": pd.Series([], dtype=np.int32),
         "doc_id": pd.Series([], dtype=np.int64), "score": pd.Series([], dtype=np.float32),
         "tf": pd.Series([], dtype=np.int64)}
    )
    assert len(build_blocks(pdf, 8)) == 0
    assert len(decode_blocks(build_blocks(pdf, 8))) == 0


def test_max_score_is_block_max():
    pdf = pd.DataFrame(
        {
            "term_id": [9] * 6,
            "salt": [0] * 6,
            "doc_id": [1, 2, 3, 4, 5, 6],
            "score": np.float32([0.5, 9.0, 0.1, 0.2, 7.0, 0.3]),
            "tf": [1] * 6,
        }
    )
    blocks = build_blocks(pdf, block_size=3)
    assert blocks["max_score"].tolist() == [np.float32(9.0), np.float32(7.0)]
    assert blocks["block_id"].tolist() == [0, 1]


def test_large_hot_set_uses_broadcast_join(spark, tmp_path, monkeypatch):
    """With more hot terms than _HOT_LITERAL_MAX the salt lookup must become
    a broadcast join (bounded plan), and postings must be identical to the
    literal-map path (same salt formula either way)."""
    import alexandria_spark.plans.build as build_mod
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import build_index, with_doc_ids
    from alexandria_spark.sources.tables import synth_corpus

    cfg = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                       build_waves=1, max_postings_per_salt=2)  # most terms hot
    docs = with_doc_ids(synth_corpus(spark, 60, seed=77))

    lit = build_index(spark, docs, str(tmp_path / "lit"), cfg, text_col="content")

    monkeypatch.setattr(build_mod, "_HOT_LITERAL_MAX", 0)  # force broadcast path
    bc = build_index(spark, docs, str(tmp_path / "bc"), cfg, text_col="content")

    a = sorted(map(tuple, lit.postings(spark).drop("wave").collect()))
    b = sorted(map(tuple, bc.postings(spark).drop("wave").collect()))
    assert a == b


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),        # term_id
            st.integers(min_value=0, max_value=2),          # salt
            st.integers(min_value=0, max_value=2**64 - 1),  # unsigned doc
            st.integers(min_value=1, max_value=7),          # tf
        ),
        max_size=60,
        unique_by=lambda r: (r[0], r[1], r[2]),
    ),
)
def test_block_roundtrip_adversarial_boundaries(block_size, rows):
    """Tiny block sizes force doc-id deltas to straddle block and
    (term, salt) group boundaries in every combination — including u64
    extremes around the sign boundary — and the decode must reproduce the
    exact posting multiset with correct per-block metadata."""
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["term_id", "salt", "doc_u", "tf"])
    pdf["doc_id"] = pdf["doc_u"].astype(np.uint64).to_numpy().view(np.int64)
    pdf["score"] = (pdf["tf"] / 7.0).astype(np.float32)
    order = np.lexsort((
        pdf["doc_u"].astype(np.uint64).to_numpy(),
        pdf["salt"].to_numpy(),
        pdf["term_id"].to_numpy(),
    ))
    pdf = pdf.iloc[order].reset_index(drop=True)[
        ["term_id", "salt", "doc_id", "score", "tf"]
    ]
    blocks = build_blocks(pdf, block_size=block_size)
    # every block obeys the size cap and its metadata matches its payload
    assert (blocks["n"] <= block_size).all()
    dec = decode_blocks(blocks, want_tf=True)
    dec = dec.assign(salt=np.repeat(blocks["salt"].to_numpy(),
                                    blocks["n"].to_numpy()))
    got = sorted(map(
        tuple, dec[["term_id", "salt", "doc_id", "score", "tf"]].to_numpy()
    ))
    exp = sorted(map(tuple, pdf.to_numpy()))
    assert got == exp
    # per-block min/max doc and max score are exact
    ofs = 0
    for _, b in blocks.iterrows():
        seg = pdf.iloc[ofs : ofs + int(b["n"])]
        seg_u = seg["doc_id"].to_numpy().view(np.uint64)
        assert np.int64(b["min_doc"]).view(np.uint64) == seg_u.min()
        assert np.int64(b["max_doc"]).view(np.uint64) == seg_u.max()
        assert np.float32(b["max_score"]) == seg["score"].to_numpy(np.float32).max()
        ofs += int(b["n"])
