"""Text-pipeline operators over a documents DataFrame.

These are the DataFrame-level building blocks the suite/driver queries are
composed from; they reuse the engine's golden-tested tokenizer (Arrow
batches, no per-row Python) and the reference's BM25 semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from alexandria_spark.config import DEFAULT, EngineConfig
from alexandria_spark.functions.tokenizer import tokenize_series
from alexandria_spark.plans.build import bm25_score_col, tokenize_docs


def doc_term_counts(
    docs: DataFrame, cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, doc_len) — per-document term frequencies.
    tf/doc_len surface as BIGINT (the engine carries them as int32
    internally for shuffle width)."""
    return tokenize_docs(docs, cfg, id_col, text_col, keep_term=True).select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("doc_len").cast("long").alias("doc_len"),
    )


TOKENS_POS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
        StructField("term", StringType()),
    ]
)


def doc_tokens_pos(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pos, term) — tokens with 0-based positions (document order)."""

    def fn(batches):
        for pdf in batches:
            rows, words = tokenize_series(pdf[text_col])
            ids = pdf[id_col].to_numpy(np.int64)
            # position = running count within each doc (rows are in doc order)
            if len(rows):
                changes = np.empty(len(rows), dtype=bool)
                changes[0] = True
                changes[1:] = rows[1:] != rows[:-1]
                starts = np.nonzero(changes)[0]
                pos = np.arange(len(rows), dtype=np.int64) - np.repeat(
                    starts, np.diff(np.append(starts, len(rows)))
                )
            else:
                pos = np.empty(0, np.int64)
            yield pd.DataFrame(
                {"doc_id": ids[rows], "pos": pos, "term": words}
            )

    return docs.select(id_col, text_col).mapInPandas(fn, TOKENS_POS_SCHEMA)


def bm25_postings(
    docs: DataFrame, cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, doc_len, df, score:float) — fully scored postings,
    computed in one pass without materializing an index (the suite /
    oracle-checked path; the persisted-index path lives in plans.build)."""
    tc = doc_term_counts(docs, cfg, id_col, text_col).cache()
    stats = tc.groupBy("doc_id").agg(F.first("doc_len").alias("dl")).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avg")
    ).collect()[0]
    n_docs, avg_dl = int(stats["n"] or 0), float(stats["avg"] or 0.0)
    dfreq = tc.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tc.join(dfreq, "term")
        .withColumn("score", bm25_score_col(n_docs, avg_dl, cfg))
        .select("doc_id", "term", "tf", "doc_len", "df", "score")
    )


def bm25_query(
    docs: DataFrame, terms: list[str], mode: str = "and",
    cfg: EngineConfig = DEFAULT, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, score:double, n_terms) for a fixed term list — matching docs
    with summed BM25; conjunctive requires all terms."""
    scored = bm25_postings(docs, cfg, id_col, text_col).where(F.col("term").isin(terms))
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.col("score").cast("double")).alias("score"),
        F.count("*").alias("n_terms"),
    )
    if mode == "and":
        agg = agg.where(F.col("n_terms") == len(set(terms)))
    return agg.withColumn("n_terms", F.col("n_terms").cast("long"))
