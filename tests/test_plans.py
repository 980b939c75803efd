"""Physical-plan posture tests: the things that keep the engine fast at
100 TB must be visible in the plan, not just hoped for — partition pruning
on the shard directories, parquet filter pushdown on term_id, and
TakeOrderedAndProject (per-partition heap top-k) for the final ranking."""

import pyspark.sql.functions as F
import pytest

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import build_index, with_doc_ids
from alexandria_spark.plans.query import search, top_k
from alexandria_spark.sources.tables import synth_corpus

CFG = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                   build_waves=1, max_postings_per_salt=64)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_doc_ids(synth_corpus(spark, 80, seed=17))
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("idx")), CFG, text_col="content"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shard_partition_pruning(spark, idx):
    from alexandria_spark.functions.hashing import i64_hash64

    tid = i64_hash64("def")
    shard = int(__import__("numpy").int64(tid).astype("uint64") % 8)
    scan = idx.postings(spark).where(
        (F.col("shard") == shard) & (F.col("term_id") == tid)
    )
    plan = _plan(scan)
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters")[1][:200]
    # term_id predicate reaches the parquet reader
    assert "PushedFilters" in plan
    assert "term_id" in plan.split("PushedFilters")[1][:200]


def test_topk_is_take_ordered(spark, idx):
    q = search(spark, idx, "def return", mode="or", k=10)
    assert "TakeOrderedAndProject" in _plan(q)


def test_metadata_scan_prunes_payload_columns(spark, idx):
    meta = idx.postings(spark).select("term_id", "min_doc", "max_doc")
    plan = _plan(meta)
    read_schema = plan.split("ReadSchema")[1][:300] if "ReadSchema" in plan else plan
    assert "doc_deltas" not in read_schema
    assert "scores" not in read_schema


def test_query_reads_only_matching_shards(spark, idx):
    # runtime evidence: the pruned scan touches strictly fewer files
    files = lambda df: df.select(F.input_file_name()).distinct().count()
    all_files = files(idx.postings(spark))
    pruned = files(idx.postings(spark).where(F.col("shard") == 0))
    assert 0 < pruned < all_files
