"""Text-analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All built-in-function pipelines (JVM-side)
over the tokenized stream; each has a DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from alexandria_spark.operators.dedup import md5_int60
from alexandria_spark.operators.sql_common import SQL_PRELUDE
from alexandria_spark.operators.text import doc_term_counts, doc_tokens_pos
from alexandria_spark.sources.tables import documents

# tiny deterministic stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "es": ["el", "la", "los", "de", "que", "un"],
}
EN = LANG_STOPWORDS["en"]
DE = LANG_STOPWORDS["de"]


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, en_ratio, de_ratio, pred_lang) — stopword-ratio heuristic;
    deterministic argmax (en beats de on ties, 'und' when both zero)."""
    # ratios are single exact-integer divisions → bit-exact across engines;
    # rounding would break ties at exact decimal halves (HALF_UP vs half-even)
    tc = doc_term_counts(docs)
    agg = tc.groupBy("doc_id").agg(
        (F.sum(F.when(F.col("term").isin(EN), F.col("tf")).otherwise(0))
         / F.first("doc_len")).cast("double").alias("en_ratio"),
        (F.sum(F.when(F.col("term").isin(DE), F.col("tf")).otherwise(0))
         / F.first("doc_len")).cast("double").alias("de_ratio"),
    )
    pred = (
        F.when((F.col("en_ratio") == 0) & (F.col("de_ratio") == 0), "und")
        .when(F.col("en_ratio") >= F.col("de_ratio"), "en")
        .otherwise("de")
    )
    return agg.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, quality) —
    length/stopword/word-shape quality heuristic, round(…,4)."""
    tc = doc_term_counts(docs)
    agg = tc.groupBy("doc_id").agg(
        F.first("doc_len").alias("n_tokens"),
        (F.sum(F.length("term") * F.col("tf")) / F.first("doc_len"))
        .cast("double").alias("atl"),
        (F.sum(F.when(F.col("term").isin(EN), F.col("tf")).otherwise(0))
         / F.first("doc_len")).cast("double").alias("swr"),
    )
    quality = (
        0.5 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.col("swr"))
        + 0.2 * F.least(F.col("atl") / 8.0, F.lit(1.0))
    )
    # NOTE: no rounding — the formula is pure IEEE arithmetic (no libm), so
    # the doubles are bit-exact across engines; rounding would actually
    # *break* equality at exact .xxxx5 halves (HALF_UP vs half-even).
    return agg.select(
        "doc_id", "n_tokens",
        F.col("atl").alias("avg_token_len"),
        F.col("swr").alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_counts_basic(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, alnum_tokens, n_chars) — whitespace-split count,
    alphanumeric-run count (BPE-ish pre-token count), char count."""
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda x: F.length(x) > 0))
    alnum = F.size(
        F.filter(F.split(F.col("text"), "[^a-z0-9]+"), lambda x: F.length(x) > 0)
    )
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        alnum.cast("long").alias("alnum_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — order-sensitive rolling fingerprint:
    bit_xor over md5-int60(term # position)."""
    toks = doc_tokens_pos(docs)
    h = md5_int60(F.concat_ws("#", F.col("term"), F.col("pos")))
    return toks.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        F.expr("bit_xor(h)").alias("fingerprint")
    )


def words_without_stopwords(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term) — the tokenized stream filtered to clean
    non-stopword words: text::get_words_without_stopwords
    (reference text.cpp:334-353) with the reference EN+SV lists
    (stopwords.cpp:35-290). Pure JVM predicates (isin + rlike), no Python."""
    from alexandria_spark.functions.stopwords import keep_word

    return doc_tokens_pos(docs).where(keep_word(F.col("term")))


def stopword_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_content) — token count before/after the
    reference stopword+clean-word filter."""
    from alexandria_spark.functions.stopwords import keep_word

    toks = doc_tokens_pos(docs)
    return toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(keep_word(F.col("term")), 1).otherwise(0))
        .cast("long").alias("n_content"),
    )


# ------------------------------------------------------------ suite entries

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(documents(spark, sf_dir))


def _sql_list(words):
    return ", ".join(f"'{w}'" for w in words)


SQL_LANG_ID = SQL_PRELUDE + f"""
, agg AS (
  SELECT tf.doc_id,
         sum(CASE WHEN term IN ({_sql_list(EN)}) THEN tf ELSE 0 END)
           / CAST(any_value(dl.doc_len) AS DOUBLE) AS en_ratio,
         sum(CASE WHEN term IN ({_sql_list(DE)}) THEN tf ELSE 0 END)
           / CAST(any_value(dl.doc_len) AS DOUBLE) AS de_ratio
  FROM tf JOIN dl USING (doc_id) GROUP BY tf.doc_id
)
SELECT doc_id, en_ratio, de_ratio,
       CASE WHEN en_ratio = 0 AND de_ratio = 0 THEN 'und'
            WHEN en_ratio >= de_ratio THEN 'en' ELSE 'de' END AS pred_lang
FROM agg
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(documents(spark, sf_dir))


SQL_QUALITY = SQL_PRELUDE + f"""
, agg AS (
  SELECT tf.doc_id,
         any_value(dl.doc_len) AS n_tokens,
         sum(length(term) * tf) / CAST(any_value(dl.doc_len) AS DOUBLE) AS atl,
         sum(CASE WHEN term IN ({_sql_list(EN)}) THEN tf ELSE 0 END)
           / CAST(any_value(dl.doc_len) AS DOUBLE) AS swr
  FROM tf JOIN dl USING (doc_id) GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens,
       atl AS avg_token_len,
       swr AS stopword_ratio,
       0.5e0 * least(n_tokens / 100.0e0, 1.0e0)
         + 0.3e0 * (1.0e0 - swr)
         + 0.2e0 * least(atl / 8.0e0, 1.0e0) AS quality
FROM agg
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts_basic(documents(spark, sf_dir))


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, ' '), x -> length(x) > 0))::BIGINT AS ws_tokens,
       len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'), x -> length(x) > 0))::BIGINT AS alnum_tokens,
       length(text)::BIGINT AS n_chars
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(documents(spark, sf_dir))


SQL_FINGERPRINT = SQL_PRELUDE + """
SELECT doc_id,
       bit_xor(CAST(concat('0x', substr(md5(term || '#' || pos), 1, 15)) AS BIGINT)) AS fingerprint
FROM tok GROUP BY doc_id
"""

def q_stopword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stopword_stats(documents(spark, sf_dir))


def _SQL_KEEP():
    from alexandria_spark.functions.stopwords import sql_keep_word

    return sql_keep_word("term")


SQL_STOPWORD_STATS = SQL_PRELUDE + f"""
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       CAST(sum(CASE WHEN {_SQL_KEEP()} THEN 1 ELSE 0 END) AS BIGINT) AS n_content
FROM tok GROUP BY doc_id
"""


def q_content_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = words_without_stopwords(documents(spark, sf_dir))
    return (
        w.groupBy("term").agg(F.count("*").cast("long").alias("total_tf"))
        .orderBy(F.desc("total_tf"), F.asc("term")).limit(50)
    )


SQL_CONTENT_TOP_TERMS = SQL_PRELUDE + f"""
SELECT term, count(*)::BIGINT AS total_tf
FROM tok WHERE {_SQL_KEEP()}
GROUP BY term ORDER BY total_tf DESC, term ASC LIMIT 50
"""

ENTRIES = {
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "stopword_stats": (q_stopword_stats, SQL_STOPWORD_STATS),
    "content_top_terms": (q_content_top_terms, SQL_CONTENT_TOP_TERMS),
    "quality_score": (q_quality, SQL_QUALITY),
    "token_counts_basic": (q_token_counts, SQL_TOKEN_COUNTS),
    "doc_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
}
