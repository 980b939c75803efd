"""Iceberg-shaped snapshot layer: atomic commits, snapshot-pinned reads
(torn-read protection), history, and time travel on the append path."""

import os

import pyspark.sql.functions as F

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import build_index, with_doc_ids
from alexandria_spark.plans.delete import compact, delete_docs
from alexandria_spark.plans.snapshots import (
    commit_snapshot,
    head_snapshot_id,
    history,
    load_snapshot,
    read_table,
)
from alexandria_spark.sources.tables import synth_corpus

CFG = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                   build_waves=1, max_postings_per_salt=64)


def test_build_commits_head_and_pinned_read(spark, tmp_path):
    docs = with_doc_ids(synth_corpus(spark, 40, seed=21))
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG, text_col="content")
    head = head_snapshot_id(idx.path)
    assert head is not None
    rec = load_snapshot(idx.path)
    assert rec["operation"] == "build"
    assert rec["tables"]["postings"]["n_files"] > 0
    # snapshot-pinned read == live directory read
    pinned = sorted(map(tuple, read_table(spark, idx.path, "postings").collect()))
    live = sorted(map(tuple, idx.postings(spark).collect()))
    assert pinned == live


def test_append_time_travel(spark, tmp_path):
    docs = with_doc_ids(synth_corpus(spark, 40, seed=22))
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG, text_col="content")
    snap1 = head_snapshot_id(idx.path)
    n1 = read_table(spark, idx.path, "term_doc", snap1).count()

    # append more stage-1 rows (what a streaming micro-batch does), commit
    from alexandria_spark.plans.build import tokenize_docs

    more = with_doc_ids(synth_corpus(spark, 20, seed=23).withColumn(
        "path", F.concat(F.lit("extra/"), F.col("path"))))
    td_path = os.path.join(idx.path, "term_doc")
    (
        tokenize_docs(more, CFG, text_col="content")
        .withColumn("wave", F.pmod(F.col("shard"), F.lit(CFG.build_waves)))
        .write.mode("append").partitionBy("wave").parquet(td_path)
    )
    rec2 = commit_snapshot(idx.path, "append", {"batch_id": 0})
    assert head_snapshot_id(idx.path) == rec2["snapshot_id"]
    assert rec2["parent_id"] == snap1

    # HEAD sees old + new rows; the old snapshot still reads EXACTLY as before
    assert read_table(spark, idx.path, "term_doc").count() > n1
    assert read_table(spark, idx.path, "term_doc", snap1).count() == n1


def test_rebuild_advances_history(spark, tmp_path):
    docs = with_doc_ids(synth_corpus(spark, 40, seed=24))
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG, text_col="content")
    victims = [r.doc_id for r in docs.select("doc_id").limit(3).collect()]
    delete_docs(spark, idx, victims)
    compact(spark, idx, CFG)
    ops = [r["operation"] for r in history(idx.path)]
    assert ops == ["build", "rebuild"]
    # HEAD-pinned postings reflect the compaction (victims gone)
    from alexandria_spark.plans.blocks import decode_blocks

    pdf = read_table(spark, idx.path, "postings").toPandas()
    dec = decode_blocks(pdf)
    assert not set(victims) & set(dec["doc_id"].tolist())
