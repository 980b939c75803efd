"""Table loaders + deterministic synthetic source-code corpus.

The production input (BASELINE.json input_hint) is an Iceberg table
``docs(repo, path, commit, lang, content)``. In this sandbox the same shape
is synthesized deterministically (fixed seed) for tests; the driver's
TPC-H-ish parquet tables under /root/testdata (notably ``documents`` and
``embeddings``) are used for oracle-checked correctness queries and the
benchmark.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's documents table: (doc_id, text, lang, source, n_chars)."""
    return load_table(spark, sf_dir, "documents")


# ------------------------------------------------------------ synthesis

_KEYWORDS = ["def", "return", "import", "class", "if", "else", "for", "while",
             "self", "none", "true", "false"]
_IDENTS = [f"var_{i}" for i in range(40)] + [f"fn_{i}" for i in range(40)] + [
    "parse", "tokenize", "index", "merge", "shard", "query", "score", "block",
    "c++", "c#", "häst_Ö", "naïve",
]
_LANGS = ["py", "c", "cpp", "js", "java", "md"]
VOCAB = _KEYWORDS + _IDENTS


def synth_corpus_pdf(n_docs: int = 120, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic corpus of shape (repo, path, commit, lang, content).

    Properties required by FIXTURES.md: Zipfian vocabulary (so common
    keywords are heavily skewed — 'def' appears in most docs), duplicated
    (term, doc) pairs, empty files, unicode identifiers, punctuation-adjacent
    tokens ('c++', 'c#').
    """
    rows = []
    vocab = np.array(VOCAB, dtype=object)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf = (1.0 / ranks) / (1.0 / ranks).sum()
    for i in range(n_docs):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        repo = f"org{i % 7}/repo{i % 13}"
        path = f"src/module_{i % 5}/file_{i}.py"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        lang = _LANGS[i % len(_LANGS)]
        if i % 37 == 0:
            content = ""  # empty file
        else:
            n_tok = int(rng.integers(20, 220))
            words = rng.choice(vocab, size=n_tok, p=zipf)
            # decorate some tokens with punctuation the tokenizer must trim
            deco = rng.random(n_tok) < 0.1
            words = np.where(deco, [f"({w})." for w in words], words)
            content = " ".join(words.tolist())
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_corpus(spark: SparkSession, n_docs: int = 120, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_corpus_pdf(n_docs, seed))
