"""Semantic invariants for dataset-prep operators (chunk/pack/sample).

The oracle suite already pins these ops bit-for-bit against DuckDB on the
testdata tables; these tests pin the SEMANTICS (token conservation, budget
bounds, mixture rates) on adversarial synthetic inputs.
"""

import pyspark.sql.functions as F
import pytest

from alexandria_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        n = (i * 7) % 90 + 1  # 1..90 tokens, non-uniform
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(n)),
                     ["en", "zh", "de"][i % 3]))
    rows.append((60, "", "en"))  # empty doc
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_pack_sequences_invariants(spark, corpus):
    chunks = chunk_documents(corpus, chunk_tokens=32, stride=32)
    packed = pack_sequences(chunks, seq_tokens=100, n_shards=8).collect()
    chunk_rows = chunks.collect()

    # zero-token docs produce NO chunks (doc 60 is empty) — matches the
    # oracle's exploded-token semantics; no empty training rows
    assert not [r for r in chunk_rows if r.doc_id == 60]
    assert all(r.n_tokens > 0 for r in chunk_rows)

    # token conservation: packing moves every chunk token exactly once
    assert sum(r.n_tokens for r in packed) == sum(r.n_tokens for r in chunk_rows)
    assert sum(r.n_items for r in packed) == len(chunk_rows)

    # budget bound: start-offset assignment overflows by < max chunk size
    max_chunk = max(r.n_tokens for r in chunk_rows)
    for r in packed:
        assert r.n_tokens <= 100 + max_chunk - 1, r

    # per-shard sequence ids start at 0 and are contiguous (cut layout —
    # every 100-token boundary inside a shard starts a sequence)
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r.seq_id)
    for shard, ids in by_shard.items():
        ids = sorted(ids)
        assert ids == list(range(len(ids))), (shard, ids)

    # deterministic: a rebuilt plan packs identically
    again = pack_sequences(
        chunk_documents(corpus, chunk_tokens=32, stride=32),
        seq_tokens=100, n_shards=8,
    ).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))


def test_stratified_sample_rates(spark, corpus):
    full = stratified_sample(corpus, {"en": 100, "zh": 100, "de": 100})
    base = corpus.where(F.col("text") != "")  # empty doc still has a lang row
    assert full.count() == corpus.count()  # 100% keeps every row of named groups
    del base

    dropped = stratified_sample(corpus, {"en": 100})
    got = dropped.select("lang").distinct().collect()
    assert {r.lang for r in got} == {"en"}  # unnamed groups fully dropped
    assert dropped.count() == corpus.where(F.col("lang") == "en").count()

    # partial rate is deterministic and strictly between the extremes
    half = stratified_sample(corpus, {"zh": 50})
    n_zh = corpus.where(F.col("lang") == "zh").count()
    k = half.count()
    assert 0 < k < n_zh
    assert k == stratified_sample(corpus, {"zh": 50}).count()  # reproducible

    with pytest.raises(ValueError):
        stratified_sample(corpus, {})
