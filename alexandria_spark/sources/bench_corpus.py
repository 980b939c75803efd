"""Deterministic, partition-independent synthetic corpus at benchmark scale.

Token choice for (doc i, position p) is a pure function of (seed, i, p) — an
integer mix fed through the inverse CDF of a Zipf distribution — so the
generated table is bit-identical regardless of Spark partitioning or core
count. Generation is fully vectorized per Arrow batch (no per-token Python).

Used by bench.py's scaling phase: the testdata documents table (~1.5 MB at
sf0.1) is overhead-dominated, while the north rule's scaling criterion needs
a compute-bound run of the same build job at two parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic integer hash, vectorized."""
    with np.errstate(over="ignore"):
        x = (x + _MIX1).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _MIX2
        x ^= x >> np.uint64(27)
        x *= _MIX3
        x ^= x >> np.uint64(31)
    return x


def _vocab(size: int = 4096) -> np.ndarray:
    kws = ["def", "return", "import", "class", "if", "else", "for", "while",
           "self", "none", "true", "false", "c++", "c#"]
    rest = [f"ident_{i}" for i in range(size - len(kws))]
    return np.asarray(kws + rest, dtype=object)


SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def bench_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    min_tokens: int = 100,
    max_tokens: int = 400,
    vocab_size: int = 4096,
    zipf_s: float = 1.1,
    partitions: int = 64,
) -> DataFrame:
    vocab = _vocab(vocab_size)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    pmf = ranks ** (-zipf_s)
    cdf = np.cumsum(pmf / pmf.sum())
    useed = np.uint64(seed)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64).astype(np.uint64)
            ntok = (
                _mix64(ids * np.uint64(3) + useed) % np.uint64(max_tokens - min_tokens)
            ).astype(np.int64) + min_tokens
            doc_of_tok = np.repeat(ids, ntok)
            pos = np.concatenate([np.arange(n, dtype=np.uint64) for n in ntok]) \
                if len(ntok) else np.empty(0, np.uint64)
            with np.errstate(over="ignore"):
                h = _mix64(doc_of_tok * np.uint64(0x100000001B3) + pos + useed)
            u = h.astype(np.float64) / 2.0**64
            idx = np.searchsorted(cdf, u, side="left")
            words = vocab[np.minimum(idx, vocab_size - 1)]
            # join per doc: split points from token counts
            bounds = np.zeros(len(ntok) + 1, dtype=np.int64)
            np.cumsum(ntok, out=bounds[1:])
            texts = [" ".join(words[bounds[j]:bounds[j + 1]]) for j in range(len(ntok))]
            yield pd.DataFrame({"doc_id": ids.view(np.int64), "text": texts})

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, SCHEMA)
    )


# ------------------------------------------------- driver-shaped documents

# the driver testdata's documents vocabulary (31 words, near-uniform, plus
# the rare 'dup' marker) — sampled from /root/testdata/sf0.1; regenerating
# the same shape at 10x lets the heavy oracle sweep run one decade past the
# largest driver-provided scale factor
_DOC_VOCAB = np.asarray(
    ["spark", "window", "merge", "table", "column", "vector", "stream",
     "value", "data", "small", "join", "filter", "big", "group", "hash",
     "customer", "sort", "order", "slow", "line", "part", "fast", "the",
     "row", "agg", "key", "query", "a", "scan", "batch"], dtype=object)
_DOC_LANGS = np.asarray(["en", "de", "es", "zh", "fr"], dtype=object)

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", LongType()), StructField("text", StringType()),
    StructField("lang", StringType()), StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def testdata_corpus(spark: SparkSession, n_docs: int, seed: int = 7,
                    min_tokens: int = 10, max_tokens: int = 100,
                    partitions: int = 64) -> DataFrame:
    """Deterministic documents table of the driver testdata's exact shape
    (doc_id, text, lang, source, n_chars) at any scale.

    Like bench_corpus, token choice is a pure function of (seed, doc, pos)
    so the table is bit-identical under any partitioning. Structure mirrors
    the driver data: the 30-word near-uniform vocabulary, a rare 'dup'
    token (~0.5%), lang skewed to en, 20 sources — and every 50th doc is a
    near-duplicate of its predecessor (tail token swapped) so the dedup /
    LSH entries have real candidate structure at volume.
    """
    useed = np.uint64(seed)
    nv = np.uint64(len(_DOC_VOCAB))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64).astype(np.uint64)
            near = (ids % np.uint64(50) == np.uint64(1)) & (ids > np.uint64(0))
            base = np.where(near, ids - np.uint64(1), ids)
            ntok = (
                _mix64(base * np.uint64(5) + useed)
                % np.uint64(max_tokens - min_tokens)
            ).astype(np.int64) + min_tokens
            doc_of_tok = np.repeat(base, ntok)
            pos = np.concatenate([np.arange(n, dtype=np.uint64) for n in ntok]) \
                if len(ntok) else np.empty(0, np.uint64)
            with np.errstate(over="ignore"):
                h = _mix64(doc_of_tok * np.uint64(0x100000001B3) + pos + useed)
            words = _DOC_VOCAB[(h % nv).astype(np.int64)]
            words = np.where(h % np.uint64(199) == np.uint64(0), "dup", words)
            bounds = np.zeros(len(ntok) + 1, dtype=np.int64)
            np.cumsum(ntok, out=bounds[1:])
            texts = []
            for j in range(len(ntok)):
                toks = words[bounds[j]:bounds[j + 1]]
                if near[j]:  # near-duplicate: swap the tail token
                    toks = toks.copy()
                    toks[-1] = "dup"
                texts.append(" ".join(toks))
            # ~40% en (buckets 0-3 of 10), rest spread over de/es/zh/fr
            lb = (_mix64(ids + useed + np.uint64(13))
                  % np.uint64(10)).astype(np.int64)
            lang = _DOC_LANGS[np.where(lb < 4, 0, 1 + (lb - 4) % 4)]
            out = pd.DataFrame({
                "doc_id": ids.view(np.int64), "text": texts,
                "lang": lang,
                "source": np.char.add(
                    "src", (ids % np.uint64(20)).astype(np.int64).astype(str)),
            })
            out["n_chars"] = out["text"].str.len().astype(np.int64)
            yield out

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, DOCUMENTS_SCHEMA)
    )
