"""Incremental index maintenance via Structured Streaming.

The reference's build loop is batch-paged (download batch → add → background
merge, console.cpp:279-319). The Spark-native upgrade is a file-source
stream: new document files landing in a directory are tokenized per
micro-batch (exactly-once via the streaming checkpoint) and appended to the
stage-1 term_doc table; a refresh pass then re-blocks the postings from the
accumulated term_doc — the analogue of the final stop_merge_thread
append+merge (merger.cpp:176-181).

Scores are recomputed at refresh because BM25 depends on corpus-global stats
(N, avgdl, df) — the same reason the reference scores in a separate
calculate_scores pass after merging.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from alexandria_spark.config import DEFAULT, EngineConfig
from alexandria_spark.plans.build import Index, tokenize_docs
from alexandria_spark.plans.merge import rebuild_from_term_doc


def ingest_stream(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    schema: StructType,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start (and by default drain) a stream appending tokenized postings to
    ``<index>/term_doc``. Returns the StreamingQuery."""
    td_path = os.path.join(index_path, "term_doc")
    ckpt = os.path.join(index_path, "_stream_checkpoint")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def handle(batch_df, batch_id: int) -> None:
        (
            tokenize_docs(batch_df, cfg, id_col, text_col)
            .withColumn("wave", F.pmod(F.col("shard"), F.lit(cfg.build_waves)))
            .write.mode("append").partitionBy("wave").parquet(td_path)
        )
        from alexandria_spark.plans.snapshots import commit_snapshot

        commit_snapshot(index_path, "append", {"batch_id": int(batch_id)})

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return q


def refresh_index(spark: SparkSession, index_path: str,
                  cfg: EngineConfig = DEFAULT) -> Index:
    """Re-block the index from the accumulated term_doc (stats + postings)."""
    td = spark.read.parquet(os.path.join(index_path, "term_doc"))
    return rebuild_from_term_doc(spark, td, index_path, cfg, run_id="refresh")
