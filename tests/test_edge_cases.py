"""Edge cases: tiny Arrow batches (group-spanning block builder), empty and
degenerate corpora, punctuation-only docs."""

import numpy as np
import pytest

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import build_index
from alexandria_spark.plans.query import LocalIndex, search
from tests.oracle import OracleIndex

CFG = EngineConfig(num_shards=4, block_size=4, shuffle_partitions=4,
                   build_waves=1, max_postings_per_salt=8)


def test_blockify_across_tiny_arrow_batches(spark, tmp_path):
    # force 16-row Arrow batches so (term, salt) groups span many batches
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rows = [(i, "alpha beta " + f"w{i % 7} " * (i % 5 + 1)) for i in range(300)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        idx = build_index(spark, docs, str(tmp_path / "idx"), CFG)
        oracle = OracleIndex(rows, CFG)
        local = LocalIndex(spark, idx, CFG)
        for q, mode in [("alpha", "or"), ("alpha beta", "and"), ("w1 w2", "or")]:
            exp = oracle.search(q, mode, k=20)
            got = local.search(q, mode, k=20)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, mode)
            assert np.allclose([s for _, s in got], [s for _, s in exp], rtol=1e-9)
        # no (term, salt, doc) may appear in two blocks, and block_ids are dense
        import pyspark.sql.functions as F

        blocks = idx.postings(spark)
        per_group = blocks.groupBy("term_id", "salt").agg(
            F.sum("n").alias("n"), F.count("*").alias("nblocks"),
            F.max("block_id").alias("max_bid"),
        ).collect()
        for r in per_group:
            assert r.max_bid == r.nblocks - 1, "non-dense block ids => split group"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_empty_corpus(spark, tmp_path):
    docs = spark.createDataFrame([], "doc_id long, text string")
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG)
    assert idx.meta()["n_docs"] == 0
    assert search(spark, idx, "anything", "or", k=5).count() == 0


def test_punct_only_and_single_doc(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "... ,,, !!!"), (2, "hello world")], ["doc_id", "text"]
    )
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG)
    assert idx.meta()["n_docs"] == 1  # punctuation-only doc has no tokens
    res = search(spark, idx, "hello", "or", k=5).collect()
    assert [r.doc_id for r in res] == [2]
