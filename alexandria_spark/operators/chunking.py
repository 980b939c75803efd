"""Training-data chunking and dataset splitting.

``chunk_documents``: split each document's token stream into fixed-size
windows (optionally overlapping) — the standard pre-training sharding op.
The token stream is the engine's golden tokenizer output; the windowing
itself is pure JVM (collect_list → slice → array_join), so the only Python
is the Arrow-batched tokenizer already on the build hot path.

``train_val_split``: deterministic hash split (md5-derived, reproducible in
DuckDB) — every engine run and the oracle agree on which rows are train.

At 100 TB: chunking is one groupBy(doc_id) (tokens of one doc co-locate;
rows explode map-side after), splitting is map-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from alexandria_spark.operators.dedup import md5_int60
from alexandria_spark.operators.sql_common import SQL_PRELUDE
from alexandria_spark.operators.text import doc_tokens_pos
from alexandria_spark.sources.tables import documents


def doc_token_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, toks) — each doc's tokens as an array in document order."""
    t = doc_tokens_pos(docs)
    return (
        t.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "term"))).alias("pt"))
        .select(
            "doc_id",
            F.transform(F.col("pt"), lambda s: s["term"]).alias("toks"),
        )
    )


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    stride: int | None = None) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — fixed-size token windows;
    ``stride`` < chunk_tokens gives overlapping windows. The final partial
    window is kept (a doc shorter than one window yields one chunk;
    zero-token docs yield none).

    MAP-ONLY: each document's text is one row, so its windows are cut
    inside the Arrow batch — no token shuffle, no groupBy (the previous
    implementation collected every token through a groupBy(doc_id))."""
    import math

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from alexandria_spark.functions.tokenizer import tokenize_series

    stride = stride or chunk_tokens
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("chunk_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("chunk_text", StringType()),
    ])

    def fn(batches):
        for pdf in batches:
            rows, words = tokenize_series(pdf["text"])
            ids = pdf["doc_id"].to_numpy(np.int64)
            counts = (np.bincount(rows, minlength=len(pdf)).astype(np.int64)
                      if len(rows) else np.zeros(len(pdf), np.int64))
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            out_id, out_cid, out_n, out_txt = [], [], [], []
            for i in range(len(pdf)):
                length, s = int(counts[i]), int(starts[i])
                if length == 0:
                    # zero-token docs produce no chunks — matches the
                    # previous groupBy implementation (no token rows → no
                    # group) and the DuckDB oracle's exploded-token CTE
                    continue
                nc = max(math.ceil((length - chunk_tokens) / stride) + 1, 1)
                for c in range(nc):
                    a = s + c * stride
                    win = words[a: min(a + chunk_tokens, s + length)]
                    out_id.append(ids[i])
                    out_cid.append(c)
                    out_n.append(len(win))
                    out_txt.append(" ".join(win))
            yield pd.DataFrame({
                "doc_id": np.asarray(out_id, np.int64),
                "chunk_id": np.asarray(out_cid, np.int64),
                "n_tokens": np.asarray(out_n, np.int64),
                "chunk_text": np.asarray(out_txt, object),
            })

    return docs.select("doc_id", "text").mapInPandas(fn, schema)


def train_val_split(docs: DataFrame, val_pct: int = 10,
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, split) — deterministic md5-hash split: val_pct% of docs land
    in 'val', the rest in 'train'. Reproducible across engines and runs."""
    bucket = md5_int60(F.col(id_col).cast("string")) % 100
    return docs.select(
        id_col,
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def stratified_sample(docs: DataFrame, rates_pct: dict[str, int],
                      group_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, <group_col>) — deterministic per-group sampling for training
    mixture control: keep ``rates_pct[group]``% of each group's docs
    (groups absent from the dict are dropped). The keep decision is a pure
    md5 threshold on the salted doc id, so it is reproducible across runs,
    engines, and the DuckDB oracle — and map-only at any scale (no shuffle,
    no sampling state)."""
    if not rates_pct:
        raise ValueError("rates_pct must name at least one group")
    bucket = md5_int60(F.concat(F.lit("samp:"), F.col(id_col).cast("string"))) % 100
    rate = None
    for g, pct in sorted(rates_pct.items()):
        cond = F.when(F.col(group_col) == g, F.lit(pct))
        rate = cond if rate is None else rate.when(F.col(group_col) == g, F.lit(pct))
    rate = rate.otherwise(F.lit(0))
    return docs.where(bucket < rate).select(id_col, group_col)


def pack_sequences(chunks: DataFrame, seq_tokens: int = 256,
                   n_shards: int = 32) -> DataFrame:
    """(shard, seq_id, n_items, n_tokens, first_doc, last_doc) — pack token
    chunks into fixed-budget training sequences.

    Deterministic streaming pack: chunks are laid out in (doc_id, chunk_id)
    order within a shard; each chunk's sequence is the one its starting
    token offset falls into (``floor(offset_before / seq_tokens)``) — the
    concat-then-cut layout GPT-style packing uses, with chunk granularity.
    A sequence therefore holds at most ``seq_tokens + max_chunk - 1``
    tokens; trim-to-budget happens at materialization.

    Scale: the cumulative offset is a window — inherently sequential — so
    it runs PER SHARD (doc_id-hash), never globally: n_shards independent
    window partitions, each a single sorted pass. Sequences never cross
    shards, so shard count scales with the cluster and no stage sees the
    whole dataset in one task.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = chunks.withColumn("shard", (F.col("doc_id") % n_shards).cast("int"))
    c = c.withColumn("cum", F.sum("n_tokens").over(w))
    c = c.withColumn(
        "seq_id",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(seq_tokens)).cast("long"),
    )
    return (
        c.groupBy("shard", "seq_id")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ------------------------------------------------------------ suite entries

def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(documents(spark, sf_dir), chunk_tokens=64, stride=48)


SQL_CHUNK_DOCUMENTS = SQL_PRELUDE + """
, arr AS (
  SELECT doc_id, list(term ORDER BY pos) AS toks FROM tok GROUP BY doc_id
),
n AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil((len(toks) - 64) / 48.0e0) AS BIGINT) + 1, 1) AS nc
  FROM arr
),
c AS (
  SELECT doc_id, toks, unnest(range(nc)) AS chunk_id FROM n
),
w AS (
  SELECT doc_id, chunk_id,
         toks[(chunk_id * 48 + 1):(chunk_id * 48 + 64)] AS win
  FROM c
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       len(win)::BIGINT AS n_tokens,
       array_to_string(win, ' ') AS chunk_text
FROM w
"""


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_val_split(documents(spark, sf_dir))


SQL_TRAIN_VAL_SPLIT = """
SELECT doc_id,
       CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""

_MIX = {"en": 30, "zh": 80, "de": 55}  # fr/es dropped: quota mixing bites


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(documents(spark, sf_dir), _MIX)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE CAST(concat('0x', substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 80 WHEN 'de' THEN 55 ELSE 0 END
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = chunk_documents(documents(spark, sf_dir), chunk_tokens=64, stride=48)
    return pack_sequences(chunks, seq_tokens=256, n_shards=32)


SQL_PACK_SEQUENCES = SQL_PRELUDE + """
, arr AS (
  SELECT doc_id, list(term ORDER BY pos) AS toks FROM tok GROUP BY doc_id
),
n AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil((len(toks) - 64) / 48.0e0) AS BIGINT) + 1, 1) AS nc
  FROM arr
),
c AS (
  SELECT doc_id, toks, unnest(range(nc)) AS chunk_id FROM n
),
ch AS (
  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         len(toks[(chunk_id * 48 + 1):(chunk_id * 48 + 64)])::BIGINT AS n_tokens
  FROM c
),
sh AS (
  SELECT doc_id, chunk_id, n_tokens, CAST(doc_id % 32 AS INTEGER) AS shard
  FROM ch
),
cum AS (
  SELECT shard, doc_id, chunk_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM sh
)
SELECT shard,
       CAST(floor((cum - n_tokens) / 256.0e0) AS BIGINT) AS seq_id,
       count(*) AS n_items, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM cum GROUP BY shard, CAST(floor((cum - n_tokens) / 256.0e0) AS BIGINT)
"""

def q_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE driver-gate row for the whole training-data prep pipeline (folds
    the former chunk_documents / train_val_split / stratified_sample /
    pack_sequences entries): stratified mixture sample → train/val split →
    chunk the sampled-train docs → pack their chunks into sequences. Every
    stage's FULL output rides in one tall (stage, doc_id, k1, k2, n_tokens,
    txt) relation, and the chunk/pack stages run over the docs the two
    selection stages kept — so each stage is load-bearing twice (its own
    rows AND the downstream restriction)."""
    docs = documents(spark, sf_dir)
    samp = stratified_sample(docs, _MIX)                       # doc_id, lang
    split = train_val_split(docs)                              # doc_id, split
    kept = samp.join(
        split.where(F.col("split") == "train").select("doc_id"),
        "doc_id", "left_semi",
    )
    docs_kept = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    chunks = chunk_documents(docs_kept, chunk_tokens=64, stride=48)
    packed = pack_sequences(chunks, seq_tokens=256, n_shards=32)

    z = F.lit(0).cast("long")
    s1 = samp.select(F.lit("sample").alias("stage"), "doc_id",
                     z.alias("k1"), z.alias("k2"), z.alias("n_tokens"),
                     F.col("lang").alias("txt"))
    s2 = split.select(F.lit("split").alias("stage"), "doc_id",
                      z.alias("k1"), z.alias("k2"), z.alias("n_tokens"),
                      F.col("split").alias("txt"))
    s3 = chunks.select(F.lit("chunk").alias("stage"), "doc_id",
                       F.col("chunk_id").alias("k1"), z.alias("k2"),
                       "n_tokens", F.col("chunk_text").alias("txt"))
    s4 = packed.select(
        F.lit("pack").alias("stage"), F.col("first_doc").alias("doc_id"),
        F.col("shard").cast("long").alias("k1"), F.col("seq_id").alias("k2"),
        "n_tokens",
        F.concat_ws(":", F.col("n_items").cast("string"),
                    F.col("last_doc").cast("string")).alias("txt"),
    )
    return s1.unionByName(s2).unionByName(s3).unionByName(s4)


SQL_PREP_PIPELINE = SQL_PRELUDE + """
, samp AS (
  SELECT doc_id, lang FROM documents
  WHERE CAST(concat('0x', substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
        < CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 80 WHEN 'de' THEN 55 ELSE 0 END
),
spl AS (
  SELECT doc_id,
         CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
              THEN 'val' ELSE 'train' END AS split
  FROM documents
),
kept AS (SELECT samp.doc_id FROM samp JOIN spl USING (doc_id) WHERE spl.split = 'train'),
arr AS (
  SELECT doc_id, list(term ORDER BY pos) AS toks FROM tok
  WHERE doc_id IN (SELECT doc_id FROM kept) GROUP BY doc_id
),
n AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil((len(toks) - 64) / 48.0e0) AS BIGINT) + 1, 1) AS nc
  FROM arr
),
c AS (SELECT doc_id, toks, unnest(range(nc)) AS chunk_id FROM n),
w AS (
  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         toks[(chunk_id * 48 + 1):(chunk_id * 48 + 64)] AS win
  FROM c
),
ch AS (
  SELECT doc_id, chunk_id, len(win)::BIGINT AS n_tokens,
         array_to_string(win, ' ') AS chunk_text
  FROM w
),
sh AS (SELECT doc_id, chunk_id, n_tokens, CAST(doc_id % 32 AS INTEGER) AS shard FROM ch),
cum AS (
  SELECT shard, doc_id, chunk_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM sh
),
pk AS (
  SELECT shard, CAST(floor((cum - n_tokens) / 256.0e0) AS BIGINT) AS seq_id,
         count(*) AS n_items, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
  FROM cum GROUP BY shard, CAST(floor((cum - n_tokens) / 256.0e0) AS BIGINT)
)
SELECT 'sample' AS stage, doc_id, CAST(0 AS BIGINT) AS k1, CAST(0 AS BIGINT) AS k2,
       CAST(0 AS BIGINT) AS n_tokens, lang AS txt FROM samp
UNION ALL
SELECT 'split', doc_id, 0, 0, 0, split FROM spl
UNION ALL
SELECT 'chunk', doc_id, chunk_id, 0, n_tokens, chunk_text FROM ch
UNION ALL
SELECT 'pack', first_doc, CAST(shard AS BIGINT), seq_id, n_tokens,
       CAST(n_items AS VARCHAR) || ':' || CAST(last_doc AS VARCHAR) FROM pk
"""

ENTRIES = {
    "prep_pipeline": (q_prep_pipeline, SQL_PREP_PIPELINE),
}
