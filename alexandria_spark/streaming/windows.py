"""Streaming event analytics: watermarked windowed aggregation and stateful
sessionization.

The reference's serving loop is request/response over a static index; its
counter subsystem (word/domain counters updated during indexing) is the
closest analogue to streaming aggregation. These operators provide the
Spark-native streaming surface a large-scale pipeline needs:

- ``windowed_event_counts``: tumbling-window count/sum per event type. The
  same plan runs batch or streaming; on a stream a watermark bounds state so
  late data older than the horizon is dropped and window state is evicted.
- ``sessionize``: gap-based user sessions. Batch form is gaps-and-islands
  (lag + cumulative sum — two window functions, one shuffle); streaming form
  keeps per-user open-session state in ``applyInPandasWithState``.

Oracle strategy: on a *finite, fully-drained* stream the streaming result
must equal the batch plan over the same rows (exactly-once), and the batch
plan is restated in DuckDB SQL — so the streaming operators are oracle-
checked end to end (stream ≡ batch ≡ SQL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from alexandria_spark.sources.tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "1 hour") -> DataFrame:
    """(w_start, event_type, n, sum_cents) — tumbling-window aggregation.

    Value sums are kept as exact integer cents (round(value*100) as BIGINT)
    so batch, streaming, and the SQL oracle agree bit-for-bit regardless of
    float summation order. Window starts surface as formatted strings for
    the same cross-engine reason.
    """
    df = events
    if df.isStreaming:
        # watermarks require TIMESTAMP (not NTZ); the session-tz cast keeps
        # wall-clock strings identical after date_format below
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df = df.withWatermark("ts", watermark)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("w_start"),
            "event_type", "n", "sum_cents",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_start, session_end, n_events) — gap-based sessions,
    batch form: a new session starts when the inter-event gap exceeds
    ``gap_minutes`` (gaps-and-islands; one shuffle on user_id, two window
    passes within each partition)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ has no direct long cast; go via timestamp (the session-tz
    # offset is constant, so gap differences are unaffected)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "new_s", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    sid = F.sum("new_s").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        marked.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("sid")
    )


def sessionize_stream(spark: SparkSession, events_stream: DataFrame,
                      gap_minutes: int = 30):
    """Stateful streaming sessionization via applyInPandasWithState: state
    per user holds the open session (start, last_ts, count); an event past
    the gap closes it and emits the finished session. A fully drained finite
    stream therefore emits exactly the batch ``sessionize`` rows minus each
    user's final (still-open) session, which remains in state. (A
    production deployment would add a processing-time timeout to flush idle
    sessions; the drained-stream contract here is what the test verifies.)

    Returns (query, sink_table_name); rows accumulate in an in-memory sink.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("session_end", StringType()),
        StructField("n_events", LongType()),
    ])
    state_schema = StructType([
        StructField("start", TimestampType()),
        StructField("last", TimestampType()),
        StructField("n", LongType()),
    ])
    gap_s = gap_minutes * 60

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        out = []
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for ts in rows["ts"]:
            ts = ts.to_pydatetime()
            if last is not None and (ts - last).total_seconds() > gap_s:
                out.append((user_id, start, last, n))
                start, n = ts, 0
            if start is None:
                start = ts
            last = ts
            n += 1
        state.update((start, last, n))
        if out:
            yield pd.DataFrame({
                "user_id": [o[0] for o in out],
                "session_start": [o[1].strftime("%Y-%m-%d %H:%M:%S") for o in out],
                "session_end": [o[2].strftime("%Y-%m-%d %H:%M:%S") for o in out],
                "n_events": [o[3] for o in out],
            })

    result = events_stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", "NoTimeout"
    )
    name = "sessions_sink"
    q = (
        result.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    return q, name


def dedup_stream(docs: DataFrame) -> DataFrame:
    """(content_hash, dup_count, keep_doc) — exact dedup as a STATEFUL
    STREAMING aggregation: state is one row per distinct content hash
    (bounded by the distinct-content count, not the stream length), and
    ``min(doc_id)``/``count(*)`` make the survivor deterministic regardless
    of arrival order — the property a batch ``dropDuplicates`` gets for
    free and a stream must earn. The same plan runs batch or streaming;
    on a drained finite stream (update mode) the final state equals the
    batch result, which is what the pytest verifies and the DuckDB oracle
    restates."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keep_doc"))
    )


# ------------------------------------------------------------ suite entries

def q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(load_table(spark, sf_dir, "events"))


SQL_WINDOWED_EVENTS = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, count(*)::BIGINT AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


SQL_USER_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0
         END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sid
"""

def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_stream(load_table(spark, sf_dir, "documents"))


SQL_STREAM_DEDUP = (
    "SELECT md5(text) AS content_hash, count(*) AS dup_count, "
    "min(doc_id) AS keep_doc FROM documents GROUP BY md5(text)"
)

ENTRIES = {
    "windowed_event_counts": (q_windowed_events, SQL_WINDOWED_EVENTS),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "stream_dedup": (q_stream_dedup, SQL_STREAM_DEDUP),
}
