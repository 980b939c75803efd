"""Streaming event analytics: a fully-drained finite stream must agree with
the batch plan over the same rows (exactly-once), which is itself
oracle-checked by the suite (stream ≡ batch ≡ DuckDB SQL)."""

import pyspark.sql.functions as F

from alexandria_spark.sources.tables import load_table
from alexandria_spark.streaming.windows import (
    sessionize,
    sessionize_stream,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _events_stream(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "events_src")
    # two files -> two micro-batches with maxFilesPerTrigger=1, split by TIME
    # (stateful sessionization assumes per-user in-order arrival, as a file
    # stream of time-partitioned landings provides)
    cut = "2024-01-16"
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)
    return ev, spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    ev, stream = _events_stream(spark, tmp_path)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory").queryName("win_sink")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM win_sink").collect()))
    exp = sorted(map(tuple, windowed_event_counts(ev).collect()))
    assert got == exp


def test_sessionize_stream_matches_batch(spark, tmp_path):
    ev, stream = _events_stream(spark, tmp_path)
    q, sink = sessionize_stream(spark, stream)
    q.awaitTermination()
    streamed = {
        tuple(r) for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch = {tuple(r) for r in sessionize(ev).collect()}
    # the drained stream emits every CLOSED session; the final (still open)
    # session per user stays in state awaiting the timeout
    assert streamed <= batch
    open_per_user = batch - streamed
    users = {r[0] for r in batch}
    assert len(open_per_user) == len(users)
    # the withheld row per user is exactly that user's LAST session
    last = {max((r for r in batch if r[0] == u), key=lambda r: r[1]) for u in users}
    assert open_per_user == last


def test_dedup_stream_equals_batch(spark, tmp_path):
    """Stateful streaming dedup over two micro-batches (duplicates split
    ACROSS batches) must converge to the batch aggregation exactly —
    survivor choice deterministic by min(doc_id) regardless of arrival."""
    from alexandria_spark.streaming.windows import dedup_stream

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    # split so the same content can land in different micro-batches
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        dedup_stream(stream).writeStream.format("memory")
        .queryName("dedup_sink").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM dedup_sink").collect()))
    exp = sorted(map(tuple, dedup_stream(docs).collect()))
    assert got == exp
    assert len(got) > 0
