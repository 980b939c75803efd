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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
    window is kept (a doc shorter than one window yields one chunk)."""
    stride = stride or chunk_tokens
    arr = doc_token_arrays(docs)
    n_chunks = F.greatest(
        F.ceil((F.size("toks") - F.lit(chunk_tokens)) / F.lit(stride)) + 1,
        F.lit(1),
    ).cast("int")
    chunks = arr.select(
        "doc_id", "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    window = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def train_val_split(docs: DataFrame, val_pct: int = 10,
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, split) — deterministic md5-hash split: val_pct% of docs land
    in 'val', the rest in 'train'. Reproducible across engines and runs."""
    bucket = md5_int60(F.col(id_col).cast("string")) % 100
    return docs.select(
        id_col,
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")).alias("split"),
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

ENTRIES = {
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "train_val_split": (q_train_val_split, SQL_TRAIN_VAL_SPLIT),
}
