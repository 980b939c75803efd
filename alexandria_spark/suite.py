"""Driver-facing query suite: every operator as a (Spark DataFrame fn, DuckDB
oracle SQL) pair over the /root/testdata tables.

Each entry's Spark side is built from the engine's operators; the SQL side is
an independent ANSI-SQL restatement runnable by DuckDB on the same parquet
views. Column names/aliases match exactly on both sides (the driver sorts by
column name and value-hashes).

Floating-point discipline: per-(term,doc) BM25 scores are float32 (matching
the reference's stored floats); query scores are float64 sums of those
float32s; hashed score outputs are rounded to 4 decimals and top-k entries
rank by the ROUNDED score with doc_id tiebreak so both engines select the
same boundary rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from alexandria_spark.config import DEFAULT, EngineConfig
from alexandria_spark.operators import (
    analysis,
    chunking,
    dedup,
    graph,
    links,
    membership,
    multimodal,
    serving,
    similarity,
)
from alexandria_spark.operators.text import (
    bm25_postings,
    bm25_query,
    doc_term_counts,
    doc_tokens_pos,
)
from alexandria_spark.sources.tables import documents, load_table
from alexandria_spark.streaming import windows as _stream_windows

CFG = DEFAULT

from alexandria_spark.operators.sql_common import SQL_PRELUDE

Q_SINGLE = "merge"
Q_AND = ["dup", "join"]     # rare + common (selective conjunction)
Q_OR = ["dup", "merge"]
Q_TOPK = ["join", "hash"]
PHRASE = ("table", "hash")
PHRASE3 = ("stream", "table", "hash")   # > n_grams=2: exercises two-stage


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents(spark, sf_dir)


def _scored(spark, sf_dir):
    return bm25_postings(_docs(spark, sf_dir), CFG)


def _r4(c):
    return F.round(c.cast("double"), 4)


# ---------------------------------------------------------------- entries

def q_doc_lengths(spark, sf_dir):
    return (
        doc_term_counts(_docs(spark, sf_dir), CFG)
        .groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))
    )


SQL_DOC_LENGTHS = SQL_PRELUDE + "SELECT doc_id, doc_len FROM dl"


def q_term_counts(spark, sf_dir):
    return doc_term_counts(_docs(spark, sf_dir), CFG).select("doc_id", "term", "tf")


SQL_TERM_COUNTS = SQL_PRELUDE + "SELECT doc_id, term, tf FROM tf"


def q_term_doc_freq(spark, sf_dir):
    return (
        doc_term_counts(_docs(spark, sf_dir), CFG)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"))
    )


SQL_TERM_DOC_FREQ = SQL_PRELUDE + (
    "SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term"
)


def q_corpus_stats(spark, sf_dir):
    return (
        q_doc_lengths(spark, sf_dir)
        .agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("avg_dl"))
    )


SQL_CORPUS_STATS = SQL_PRELUDE + "SELECT n_docs, avg_dl FROM stats"


def q_top_terms(spark, sf_dir):
    return (
        q_term_doc_freq(spark, sf_dir)
        .orderBy(F.desc("total_tf"), F.asc("term"))
        .limit(100)
        .select("term", "total_tf")
    )


SQL_TOP_TERMS = SQL_PRELUDE + (
    "SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY term "
    "ORDER BY total_tf DESC, term ASC LIMIT 100"
)


def q_bm25_single(spark, sf_dir):
    s = _scored(spark, sf_dir).where(F.col("term") == Q_SINGLE)
    return s.select("doc_id", _r4(F.col("score")).alias("score"))


SQL_BM25_SINGLE = SQL_PRELUDE + (
    f"SELECT doc_id, round(CAST(score AS DOUBLE), 4) AS score "
    f"FROM scored WHERE term = '{Q_SINGLE}'"
)


def q_bm25_and(spark, sf_dir):
    r = bm25_query(_docs(spark, sf_dir), Q_AND, "and", CFG)
    return r.select("doc_id", _r4(F.col("score")).alias("score"), "n_terms")


SQL_BM25_AND = SQL_PRELUDE + (
    f"SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score, "
    f"count(*) AS n_terms FROM scored WHERE term IN ('{Q_AND[0]}','{Q_AND[1]}') "
    f"GROUP BY doc_id HAVING count(*) = 2"
)


def q_bm25_or(spark, sf_dir):
    r = bm25_query(_docs(spark, sf_dir), Q_OR, "or", CFG)
    return r.select("doc_id", _r4(F.col("score")).alias("score"), "n_terms")


SQL_BM25_OR = SQL_PRELUDE + (
    f"SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score, "
    f"count(*) AS n_terms FROM scored WHERE term IN ('{Q_OR[0]}','{Q_OR[1]}') "
    f"GROUP BY doc_id"
)


def q_bm25_topk(spark, sf_dir):
    r = bm25_query(_docs(spark, sf_dir), Q_TOPK, "or", CFG)
    r = r.select("doc_id", _r4(F.col("score")).alias("score"))
    return r.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


SQL_BM25_TOPK = SQL_PRELUDE + (
    f"SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score "
    f"FROM scored WHERE term IN ('{Q_TOPK[0]}','{Q_TOPK[1]}') GROUP BY doc_id "
    f"ORDER BY score DESC, doc_id ASC LIMIT 20"
)


def q_phrase_bigram(spark, sf_dir):
    toks = doc_tokens_pos(_docs(spark, sf_dir))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.withColumn("w2", F.lead("term").over(w))
    return (
        bi.where((F.col("term") == PHRASE[0]) & (F.col("w2") == PHRASE[1]))
        .select("doc_id").distinct()
    )


SQL_PHRASE_BIGRAM = SQL_PRELUDE + (
    f", bi AS (SELECT doc_id, term AS w1, lead(term) OVER "
    f"(PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok) "
    f"SELECT DISTINCT doc_id FROM bi "
    f"WHERE w1 = '{PHRASE[0]}' AND w2 = '{PHRASE[1]}'"
)


def q_bm25_phrase(spark, sf_dir):
    """Exact-phrase BM25: the phrase bigram is one index key (the engine's
    n_grams=2 path); tf = adjacency count, doc_len stays the unigram count."""
    docs = _docs(spark, sf_dir)
    toks = doc_tokens_pos(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.withColumn("w2", F.lead("term").over(w))
    ph = bi.where((F.col("term") == PHRASE[0]) & (F.col("w2") == PHRASE[1]))
    tf = ph.groupBy("doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    stats = dl.agg(F.count("*").alias("n"), F.avg("doc_len").alias("avg")).collect()[0]
    n_docs, avg_dl = int(stats["n"]), float(stats["avg"])
    phrase_df = tf.count()
    from alexandria_spark.plans.build import bm25_score_col

    scored = tf.join(dl, "doc_id").withColumn("df", F.lit(phrase_df))
    return scored.withColumn("score", bm25_score_col(n_docs, avg_dl, CFG)).select(
        "doc_id", _r4(F.col("score")).alias("score")
    )


SQL_BM25_PHRASE = SQL_PRELUDE + f"""
, bi AS (SELECT doc_id, term AS w1, lead(term) OVER
         (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok),
ptf AS (SELECT doc_id, count(*) AS tf FROM bi
        WHERE w1 = '{PHRASE[0]}' AND w2 = '{PHRASE[1]}' GROUP BY doc_id),
pdf_ AS (SELECT count(*) AS df FROM ptf)
SELECT ptf.doc_id,
       round(CAST(CAST( ln((stats.n_docs - pdf_.df + 0.5e0)/(pdf_.df + 0.5e0) + 1.0e0)
             * ((ptf.tf/CAST(dl.doc_len AS DOUBLE)) * 2.2e0)
             / ((ptf.tf/CAST(dl.doc_len AS DOUBLE))
                + 1.2e0 * (0.25e0 + (0.75e0 * dl.doc_len)/stats.avg_dl))
           AS REAL) AS DOUBLE), 4) AS score
FROM ptf JOIN dl USING (doc_id) CROSS JOIN stats CROSS JOIN pdf_
"""


SQL_BM25_PHRASE3 = SQL_PRELUDE + f"""
, tri AS (SELECT doc_id, term AS w1,
          lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
          lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
          FROM tok),
ptf AS (SELECT doc_id, count(*) AS tf FROM tri
        WHERE w1 = '{PHRASE3[0]}' AND w2 = '{PHRASE3[1]}'
          AND w3 = '{PHRASE3[2]}' GROUP BY doc_id),
pdf_ AS (SELECT count(*) AS df FROM ptf)
SELECT ptf.doc_id,
       round(CAST(CAST( ln((stats.n_docs - pdf_.df + 0.5e0)/(pdf_.df + 0.5e0) + 1.0e0)
             * ((ptf.tf/CAST(dl.doc_len AS DOUBLE)) * 2.2e0)
             / ((ptf.tf/CAST(dl.doc_len AS DOUBLE))
                + 1.2e0 * (0.25e0 + (0.75e0 * dl.doc_len)/stats.avg_dl))
           AS REAL) AS DOUBLE), 4) AS score
FROM ptf JOIN dl USING (doc_id) CROSS JOIN stats CROSS JOIN pdf_
"""

SQL_INDEX_PHRASE = (
    f"SELECT 'bigram' AS variant, doc_id, score FROM ({SQL_BM25_PHRASE})"
    f" UNION ALL "
    f"SELECT 'trigram', doc_id, score FROM ({SQL_BM25_PHRASE3})"
)


def _score_e4(col):
    """Per-row score quantized to an int (1e-4 grid) BEFORE the group sum, so
    the aggregate is an order-independent INTEGER sum — a float sum over many
    addends per group is banned in oracle compares (Spark and DuckDB merge
    partials in different orders; a group near a rounding boundary reddens).
    The per-row product is exact: scores sit on the f32 grid (24-bit
    mantissa) and ×10000 needs 14 more bits, well under f64's 53."""
    return F.round(col.cast("double") * 10000, 0).cast("long")


def q_group_by_source(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    s = _scored(spark, sf_dir).where(F.col("term") == Q_SINGLE)
    j = s.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.sum(_score_e4(F.col("score"))).alias("score_sum_e4"),
        F.count("*").alias("cnt"),
    )


SQL_GROUP_BY_SOURCE = SQL_PRELUDE + (
    f"SELECT d.source, CAST(sum(CAST(round(CAST(s.score AS DOUBLE) * 10000, 0) "
    f"AS BIGINT)) AS BIGINT) AS score_sum_e4, "
    f"count(*) AS cnt FROM scored s JOIN documents d USING (doc_id) "
    f"WHERE s.term = '{Q_SINGLE}' GROUP BY d.source"
)


def q_top_per_source(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    s = _scored(spark, sf_dir).where(F.col("term") == Q_SINGLE)
    j = s.join(docs.select("doc_id", "source"), "doc_id").select(
        "source", "doc_id", _r4(F.col("score")).alias("score")
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("source", "doc_id", "score")
    )


SQL_TOP_PER_SOURCE = SQL_PRELUDE + (
    f", r AS (SELECT d.source, s.doc_id, round(CAST(s.score AS DOUBLE), 4) AS score "
    f"FROM scored s JOIN documents d USING (doc_id) WHERE s.term = '{Q_SINGLE}'), "
    f"w AS (SELECT *, row_number() OVER (PARTITION BY source "
    f"ORDER BY score DESC, doc_id ASC) AS rn FROM r) "
    f"SELECT source, doc_id, score FROM w WHERE rn <= 2"
)


def q_content_sha256(spark, sf_dir):
    """Per-row content sha256 — the BASELINE.json input invariant, checked
    end-to-end against the oracle's independent digest."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
    )


SQL_CONTENT_SHA256 = "SELECT doc_id, sha256(text) AS content_sha256 FROM documents"


# ------------------------------------------------------------ registry

def q_expanded_term_counts(spark, sf_dir):
    """Blend-char expanded tokenization (get_expanded_full_text_words,
    reference text.cpp:253-285) through the vectorized build tokenizer."""
    cfg = EngineConfig(expand_blend=True)
    return doc_term_counts(_docs(spark, sf_dir), cfg).select("doc_id", "term", "tf")


from alexandria_spark.operators.sql_common import TRIM_DUCK  # noqa: E402

SQL_EXPANDED_TERM_COUNTS = SQL_PRELUDE + f"""
, expx AS (
  SELECT doc_id, term FROM tok
  UNION ALL
  SELECT doc_id, unnest(list_transform(regexp_split_to_array(term, '[.:-]'),
                                       w -> trim(w, {TRIM_DUCK}))) AS term
  FROM tok WHERE len(regexp_split_to_array(term, '[.:-]')) > 1
)
SELECT doc_id, term, count(*)::BIGINT AS tf FROM expx GROUP BY doc_id, term
"""


# ---------------------------------------------------- persisted-index path
#
# These entries exercise the flagship artifact end-to-end: build_index →
# delta/varint block shards on disk → pruned distributed search
# (plans/build.py + plans/query.py), the Spark-first analogue of the
# reference's index_manager::find (index_manager.cpp:249-294). The oracle is
# the same f64 BM25 restatement the bm25_* entries use: per-(term,doc)
# scores quantized to REAL (the engine stores f32), summed as DOUBLE.

_IDX_CACHE: dict[str, object] = {}
_IDX_CFG = EngineConfig(num_shards=16, shuffle_partitions=16, build_waves=2,
                        block_size=1024)


def _suite_index(spark, sf_dir):
    """Build (once per process per sf_dir) a real block index over the
    documents table in a fresh temp dir."""
    if sf_dir not in _IDX_CACHE:
        import tempfile

        from alexandria_spark.plans.build import build_index

        path = tempfile.mkdtemp(prefix="ax_suite_idx_") + "/idx"
        _IDX_CACHE[sf_dir] = build_index(
            spark, _docs(spark, sf_dir), path, _IDX_CFG, text_col="text"
        )
    return _IDX_CACHE[sf_dir]


def _index_search(spark, sf_dir, terms, mode, k):
    from alexandria_spark.plans.query import search

    idx = _suite_index(spark, sf_dir)
    # fetch 2k raw-score rows, then rank by ROUNDED score + doc_id so the
    # boundary rows match the oracle's rounded ordering
    r = search(spark, idx, " ".join(terms), mode=mode, k=2 * k, cfg=_IDX_CFG)
    r = r.select("doc_id", _r4(F.col("score")).alias("score"))
    return r.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def q_index_search_topk(spark, sf_dir):
    return _index_search(spark, sf_dir, Q_AND, "and", 20)


SQL_INDEX_SEARCH_TOPK = SQL_PRELUDE + (
    f"SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score "
    f"FROM scored WHERE term IN ('{Q_AND[0]}','{Q_AND[1]}') GROUP BY doc_id "
    f"HAVING count(*) = 2 ORDER BY score DESC, doc_id ASC LIMIT 20"
)


def q_index_search_or_topk(spark, sf_dir):
    return _index_search(spark, sf_dir, Q_TOPK, "or", 20)


def q_bmw_search_topk(spark, sf_dir):
    """Same top-k through the distributed block-max WAND engine
    (plans/query.search_bmw) over the persisted index."""
    from alexandria_spark.plans.query import search_bmw

    idx = _suite_index(spark, sf_dir)
    hits = search_bmw(spark, idx, " ".join(Q_AND), mode="and", k=40, cfg=_IDX_CFG)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    df = df.select("doc_id", _r4(F.col("score")).alias("score"))
    return df.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q_impact_single_topk(spark, sf_dir):
    """Single-term top-k through the impact-ordered layout (plans/impact.py:
    blocks decoded in descending-max order with exact early termination),
    served WARM through ImpactEngine's pinned scans."""
    hits = _suite_impact_engine(spark, sf_dir).single_topk(Q_SINGLE, k=40)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    df = df.select("doc_id", _r4(F.col("score")).alias("score"))
    return df.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def _suite_impact_engine(spark, sf_dir):
    from alexandria_spark.plans.impact import ImpactEngine, build_impact_postings

    idx = _suite_index(spark, sf_dir)
    key = ("impact", sf_dir)
    if key not in _IDX_CACHE:
        build_impact_postings(spark, idx, _IDX_CFG)
        _IDX_CACHE[key] = ImpactEngine(spark, idx, _IDX_CFG)
    return _IDX_CACHE[key]


def q_impact_or_topk(spark, sf_dir):
    """Multi-term OR top-k through the impact-ordered layout: TAAT with
    per-block bounds finds the candidates, one pruned doc-sorted job
    completes their exact scores (plans/impact.impact_or_topk), served WARM
    through ImpactEngine's pinned scans."""
    hits = _suite_impact_engine(spark, sf_dir).or_topk(" ".join(Q_TOPK), k=40)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    df = df.select("doc_id", _r4(F.col("score")).alias("score"))
    return df.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


SQL_IMPACT_SINGLE_TOPK = SQL_PRELUDE + (
    f"SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score "
    f"FROM scored WHERE term = '{Q_SINGLE}' GROUP BY doc_id "
    f"ORDER BY score DESC, doc_id ASC LIMIT 20"
)


def q_index_doc_lengths(spark, sf_dir):
    """The PERSISTED doc_lengths table written by build_index (stage 2)."""
    import os

    idx = _suite_index(spark, sf_dir)
    return spark.read.parquet(os.path.join(idx.path, "doc_lengths")).select(
        "doc_id", F.col("doc_len").cast("long").alias("doc_len")
    )


SQL_INDEX_DOC_LENGTHS = SQL_PRELUDE + "SELECT doc_id, doc_len FROM dl"


def q_index_term_stats(spark, sf_dir):
    """The PERSISTED term_stats table (term_id -> df), surfaced per term by
    joining the tokenized vocabulary (term ids are murmur2-64, which DuckDB
    cannot compute — the df VALUES under test come from the index files)."""
    import os

    from alexandria_spark.plans.build import tokenize_docs

    idx = _suite_index(spark, sf_dir)
    ts = spark.read.parquet(os.path.join(idx.path, "term_stats"))
    vocab = (
        tokenize_docs(_docs(spark, sf_dir), CFG, keep_term=True)
        .select("term", "term_id").distinct()
    )
    return vocab.join(ts, "term_id").select(
        "term", F.col("df").cast("long").alias("df")
    )


SQL_INDEX_TERM_STATS = SQL_PRELUDE + "SELECT term, df FROM dfreq"


def q_posting_iteration(spark, sf_dir):
    """Gates the full posting-iteration surface (plans/build.decoded_postings,
    the reference's for_each, sharded.h:171-188): every (term, doc) posting
    decoded from the persisted delta+varint blocks, aggregated per term with
    ORDER-INDEPENDENT stats (count / integer tf sum / f32 max) so float
    summation order cannot blur the comparison. A codec or iteration bug
    that drops, duplicates, or mis-decodes any posting shifts a count or max
    and reddens the entry."""
    from alexandria_spark.plans.build import tokenize_docs

    idx = _suite_index(spark, sf_dir)
    decoded = idx.decoded_postings(spark)
    per_term = decoded.groupBy("term_id").agg(
        F.count("*").alias("n_postings"),
        F.sum("tf").cast("long").alias("sum_tf"),
        F.max(F.col("score").cast("double")).alias("max_score"),
    )
    vocab = (
        tokenize_docs(_docs(spark, sf_dir), CFG, keep_term=True)
        .select("term", "term_id").distinct()
    )
    return vocab.join(per_term, "term_id").select(
        "term", "n_postings", "sum_tf", "max_score"
    )


SQL_POSTING_ITERATION = SQL_PRELUDE + """
SELECT term, count(*) AS n_postings, CAST(sum(tf) AS BIGINT) AS sum_tf,
       max(CAST(score AS DOUBLE)) AS max_score
FROM scored GROUP BY term
"""


def q_local_index_topk(spark, sf_dir):
    """Same top-k through the RAM-pinned low-latency serving path
    (plans/query.LocalIndex, term-at-a-time quit/continue with block-max)."""
    from alexandria_spark.plans.query import LocalIndex

    idx = _suite_index(spark, sf_dir)
    hits = LocalIndex(spark, idx, _IDX_CFG).search(" ".join(Q_AND), "and", 40)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    df = df.select("doc_id", _r4(F.col("score")).alias("score"))
    return df.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def _suite_docpart(spark, sf_dir):
    key = ("docpart", sf_dir)
    if key not in _IDX_CACHE:
        import tempfile

        from alexandria_spark.plans.docpart import build_docpart_index

        path = tempfile.mkdtemp(prefix="ax_suite_dp_") + "/idx"
        _IDX_CACHE[key] = build_docpart_index(
            spark, _docs(spark, sf_dir), path, _IDX_CFG, text_col="text"
        )
    return _IDX_CACHE[key]


def q_index_serve_full(spark, sf_dir):
    """The COMPOSED serving pipeline over the PERSISTED artifacts — the full
    index_manager::find lifecycle (index_manager.cpp:249-294) as one entry:
    block-index search → URL-link boosts → domain-link boosts →
    pre_result_limit → per-domain dedup with backfill → doc-store
    decoration. Limits sized so every knob bites at sf0.001 (312 AND
    candidates over 20 sources → pre=120, cap=1, limit=40: truncation
    drops, the cap dedups, and 20 in-cap rows force a 20-row backfill)."""
    import dataclasses

    from alexandria_spark.operators.links import synth_domain_links, synth_links
    from alexandria_spark.operators.serving import serve_full_index

    idx = _suite_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    store = _suite_store(spark, sf_dir)
    cfg = dataclasses.replace(
        _IDX_CFG, pre_result_limit=120, dedup_group_count=1, result_limit=40
    )
    from alexandria_spark.operators.links import _n_docs

    n = _n_docs(docs, sf_dir)
    return serve_full_index(
        spark, idx, " ".join(Q_LINK_SERVE), synth_links(docs, n),
        synth_domain_links(docs, n), store, cfg, mode="and", round_to=4,
    )


Q_LINK_SERVE = ["table", "hash"]


def q_docpart_serve_full(spark, sf_dir):
    """The SAME composed find pipeline, candidates fed by the warm
    doc-partitioned engine (DocPartEngine, k=None full AND candidate set)
    instead of the term-sharded block index — must produce byte-identical
    serving output (one corpus, two physical layouts)."""
    import dataclasses

    from alexandria_spark.operators.links import _n_docs, synth_domain_links, synth_links
    from alexandria_spark.operators.serving import serve_full_index
    from alexandria_spark.plans.docpart import DocPartEngine

    dp = _suite_docpart(spark, sf_dir)
    ekey = ("docpart_engine", sf_dir)
    if ekey not in _IDX_CACHE:
        _IDX_CACHE[ekey] = DocPartEngine(spark, dp, _IDX_CFG)
    eng = _IDX_CACHE[ekey]
    docs = _docs(spark, sf_dir)
    store = _suite_store(spark, sf_dir)
    cfg = dataclasses.replace(
        _IDX_CFG, pre_result_limit=120, dedup_group_count=1, result_limit=40
    )
    n = _n_docs(docs, sf_dir)
    return serve_full_index(
        spark, dp, " ".join(Q_LINK_SERVE), synth_links(docs, n),
        synth_domain_links(docs, n), store, cfg, mode="and", round_to=4,
        searcher=lambda q, m: eng.search(q, m, k=None),
    )


def _sql_index_serve_full():
    from alexandria_spark.operators.links import _SQL_LINKS

    return SQL_PRELUDE + _SQL_LINKS + f"""
, base AS (
  SELECT doc_id, sum(CAST(score AS DOUBLE)) AS score
  FROM scored WHERE term IN ('{Q_LINK_SERVE[0]}','{Q_LINK_SERVE[1]}')
  GROUP BY doc_id HAVING count(*) = 2
),
upp AS (SELECT source_domain, target_hash, max(score) AS s
        FROM links GROUP BY source_domain, target_hash),
ubst AS (SELECT target_hash, sum((exp(25.0e0 * s) - 1.0e0) / 50.0e0) AS boost
         FROM upp GROUP BY target_hash),
b1 AS (SELECT b.doc_id, b.score + coalesce(ubst.boost, 0.0e0) AS score
       FROM base b LEFT JOIN ubst ON ubst.target_hash = b.doc_id),
dlinks AS (SELECT l.source_domain, d.source AS target_domain, l.score
           FROM links l JOIN documents d ON d.doc_id = l.target_hash),
dpp AS (SELECT source_domain, target_domain, max(score) AS s
        FROM dlinks GROUP BY source_domain, target_domain),
dbst AS (SELECT target_domain, sum((exp(25.0e0 * s) - 1.0e0) / 50.0e0) AS boost
         FROM dpp GROUP BY target_domain),
b2 AS (SELECT b1.doc_id, d.source,
              round(b1.score + coalesce(dbst.boost, 0.0e0), 4) AS score
       FROM b1 JOIN documents d USING (doc_id)
       LEFT JOIN dbst ON dbst.target_domain = d.source),
cand AS (SELECT * FROM b2 ORDER BY score DESC, doc_id ASC LIMIT 120),
r AS (SELECT *, (row_number() OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC)) <= 1 AS in_cap FROM cand),
g AS (SELECT *, row_number() OVER (PARTITION BY in_cap
               ORDER BY score DESC, doc_id ASC) AS gn FROM r),
nd AS (SELECT count(*) AS nd FROM r WHERE in_cap)
SELECT g.source, g.doc_id, g.score, substr(d.text, 1, 140) AS snippet
FROM g CROSS JOIN nd JOIN documents d USING (doc_id)
WHERE (in_cap AND gn <= 40) OR ((NOT in_cap) AND gn <= greatest(40 - nd, 0))
"""


def q_docpart_search_topk(spark, sf_dir):
    """Same top-k through the doc-partitioned layout (per-bucket WAND on
    executors), served WARM through DocPartEngine's pinned block cache."""
    from alexandria_spark.plans.docpart import DocPartEngine

    idx = _suite_docpart(spark, sf_dir)
    key = ("docpart_engine", sf_dir)
    if key not in _IDX_CACHE:
        _IDX_CACHE[key] = DocPartEngine(spark, idx, _IDX_CFG)
    r = _IDX_CACHE[key].search(" ".join(Q_AND), mode="and", k=40)
    r = r.select("doc_id", _r4(F.col("score")).alias("score"))
    return r.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


SQL_INDEX_SEARCH_OR_TOPK = SQL_PRELUDE + (
    f"SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score "
    f"FROM scored WHERE term IN ('{Q_TOPK[0]}','{Q_TOPK[1]}') GROUP BY doc_id "
    f"ORDER BY score DESC, doc_id ASC LIMIT 20"
)


def _suite_store(spark, sf_dir):
    """Bucketed doc store for this sf_dir (create once per process)."""
    from alexandria_spark.sources.docstore import load_doc_store, save_doc_store

    key = ("store", sf_dir)
    if key not in _IDX_CACHE:
        name = "ax_serve_store_" + "".join(
            c if c.isalnum() else "_" for c in sf_dir.strip("/")
        )
        save_doc_store(_docs(spark, sf_dir), name=name, buckets=8)
        _IDX_CACHE[key] = name
    return load_doc_store(spark, _IDX_CACHE[key])


def q_index_group_by_source(spark, sf_dir):
    """The reference's group-by query path (`find_group_by`,
    sharded_index.h group-by over record bitmaps) over the PERSISTED
    artifacts: single-key lookup through the block index, domain column
    from the bucketed doc store (shuffle-free store side), one aggregation
    per group — score mass and match count per source."""
    from alexandria_spark.plans.query import search

    idx = _suite_index(spark, sf_dir)
    store = _suite_store(spark, sf_dir)
    r = search(spark, idx, Q_SINGLE, mode="or", k=None, cfg=_IDX_CFG)
    j = r.join(store.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.sum(_score_e4(F.col("score"))).alias("score_sum_e4"),
        F.count("*").alias("cnt"),
    )


def q_index_phrase(spark, sf_dir):
    """Exact-phrase serving over a PERSISTED n_grams=2 index, two legs:

    * 'bigram' — the phrase IS one murmur n-gram key (text.cpp:360-373), a
      single-key lookup through the delta+varint blocks;
    * 'trigram' — a 3-word phrase has NO persisted key on an n_grams=2
      index (the reference keys the whole query, search_engine.h:474-490),
      so it runs the two-stage path (plans/query.search_phrase_long):
      bigram-AND candidates through the same blocks, then a positional
      verify over the candidates only. Scores must equal the DuckDB
      positional oracle exactly — rank AND value.

    Both legs: df = phrase doc frequency, doc_len = unigram count, corpus
    stats from the unigram doc_lengths table."""
    from alexandria_spark.plans.build import build_index
    from alexandria_spark.plans.query import search

    cfg = EngineConfig(num_shards=8, shuffle_partitions=8, build_waves=1,
                       block_size=1024, n_grams=2)
    key = ("ngram2", sf_dir)
    if key not in _IDX_CACHE:
        import tempfile

        path = tempfile.mkdtemp(prefix="ax_suite_ng2_") + "/idx"
        _IDX_CACHE[key] = build_index(
            spark, _docs(spark, sf_dir), path, cfg, text_col="text"
        )
    bi = search(spark, _IDX_CACHE[key], " ".join(PHRASE), mode="phrase",
                k=None, cfg=cfg)
    tri = search(spark, _IDX_CACHE[key], " ".join(PHRASE3), mode="phrase",
                 k=None, cfg=cfg, docs=_docs(spark, sf_dir))
    return (
        bi.select(F.lit("bigram").alias("variant"), "doc_id",
                  _r4(F.col("score")).alias("score"))
        .unionByName(
            tri.select(F.lit("trigram").alias("variant"), "doc_id",
                       _r4(F.col("score")).alias("score")))
    )


def q_merge_search_topk(spark, sf_dir):
    """Hard-gates the partial→final merge (plans/merge.merge_indexes, the
    reference's index_builder::merge_with analogue, index_builder.h:303-361):
    build two DISJOINT half-corpus partial indexes, merge them, and serve
    the same AND top-k — which must equal the whole-corpus oracle exactly
    (scores recompute from the merged corpus stats, so rank AND score agree
    with a from-scratch build over the union)."""
    from alexandria_spark.plans.build import build_index
    from alexandria_spark.plans.merge import merge_indexes
    from alexandria_spark.plans.query import search

    key = ("merged", sf_dir)
    cfg = EngineConfig(num_shards=8, shuffle_partitions=8, build_waves=1,
                       block_size=1024)
    if key not in _IDX_CACHE:
        import tempfile

        base = tempfile.mkdtemp(prefix="ax_suite_merge_")
        docs = _docs(spark, sf_dir)
        ia = build_index(spark, docs.where(F.col("doc_id") % 2 == 0),
                         base + "/a", cfg, text_col="text")
        ib = build_index(spark, docs.where(F.col("doc_id") % 2 == 1),
                         base + "/b", cfg, text_col="text")
        _IDX_CACHE[key] = merge_indexes(spark, [ia, ib], base + "/merged", cfg)
    r = search(spark, _IDX_CACHE[key], " ".join(Q_AND), mode="and", k=40, cfg=cfg)
    r = r.select("doc_id", _r4(F.col("score")).alias("score"))
    return r.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


# ------------------------------------------------- folded multi-op entries
#
# The driver sweep records ~50 rows; round 3 had 65 entries, so 15 operators
# shipped without a driver row. These folds compress same-shaped operator
# families into ONE entry each WITHOUT losing coverage: every folded
# operator's full output rides in the union, tagged by a discriminator
# column, so a bug in any of them still reddens its entry.

def q_corpus_doc_lengths(spark, sf_dir):
    """doc_lengths + corpus_stats in one relation: every doc's length with
    the corpus scalars broadcast onto each row."""
    dl = q_doc_lengths(spark, sf_dir)
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("avg_dl"))
    return dl.crossJoin(F.broadcast(stats))


SQL_CORPUS_DOC_LENGTHS = SQL_PRELUDE + (
    "SELECT doc_id, doc_len, n_docs, avg_dl FROM dl CROSS JOIN stats"
)


def q_term_counts_modes(spark, sf_dir):
    """Base + blend-expanded + UPDATE-resolved tokenization in one relation.

    The 'updated' variant gates latest-version-wins (plans/versioning,
    the reference hash table's update semantics, hash_table.h:42-67):
    every doc_id divisible by 10 is re-ingested at version 1 with new
    text; the resolved corpus must tokenize the NEW text for those docs
    (old-version terms gone) and the unchanged text for the rest."""
    from alexandria_spark.plans.versioning import latest_versions_only

    base = q_term_counts(spark, sf_dir)
    exp = q_expanded_term_counts(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    v0 = docs.select("doc_id", "text").withColumn(
        "version", F.lit(0).cast("long"))
    v1 = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("updated v2 "), F.substring("text", 1, 40)).alias("text"),
    ).withColumn("version", F.lit(1).cast("long"))
    eff = latest_versions_only(v0.unionByName(v1)).drop("version")
    upd = doc_term_counts(eff, CFG).select("doc_id", "term", "tf")
    return (
        base.select(F.lit("base").alias("variant"), "doc_id", "term", "tf")
        .unionByName(
            exp.select(F.lit("expanded").alias("variant"), "doc_id", "term", "tf"))
        .unionByName(
            upd.select(F.lit("updated").alias("variant"), "doc_id", "term", "tf"))
    )


SQL_TERM_COUNTS_UPDATED = SQL_PRELUDE.replace(
    "FROM documents",
    "FROM (SELECT doc_id, source, lang, CASE WHEN doc_id % 10 = 0 THEN "
    "'updated v2 ' || substr(text, 1, 40) ELSE text END AS text "
    "FROM documents)",
) + "SELECT doc_id, term, tf FROM tf"

SQL_TERM_COUNTS_MODES = (
    f"SELECT 'base' AS variant, doc_id, term, tf FROM ({SQL_TERM_COUNTS})"
    f" UNION ALL "
    f"SELECT 'expanded', doc_id, term, tf FROM ({SQL_EXPANDED_TERM_COUNTS})"
    f" UNION ALL "
    f"SELECT 'updated', doc_id, term, tf FROM ({SQL_TERM_COUNTS_UPDATED})"
)


def q_bm25_modes(spark, sf_dir):
    """Recompute-path BM25 single / AND / OR in one relation."""
    single = q_bm25_single(spark, sf_dir).select(
        F.lit("single").alias("mode"), "doc_id", "score",
        F.lit(1).cast("long").alias("n_terms"))
    a = q_bm25_and(spark, sf_dir).select(
        F.lit("and").alias("mode"), "doc_id", "score", "n_terms")
    o = q_bm25_or(spark, sf_dir).select(
        F.lit("or").alias("mode"), "doc_id", "score", "n_terms")
    return single.unionByName(a).unionByName(o)


SQL_BM25_MODES = (
    f"SELECT 'single' AS mode, doc_id, score, CAST(1 AS BIGINT) AS n_terms"
    f" FROM ({SQL_BM25_SINGLE}) UNION ALL "
    f"SELECT 'and', doc_id, score, n_terms FROM ({SQL_BM25_AND}) UNION ALL "
    f"SELECT 'or', doc_id, score, n_terms FROM ({SQL_BM25_OR})"
)


def q_engines_search_topk(spark, sf_dir):
    """The SAME AND top-k through three serving engines — distributed
    block-max WAND (search_bmw), the warm doc-partitioned engine, and the
    RAM-pinned LocalIndex — each tagged; all three must equal the oracle.
    A fourth leg serves through the AUTO layout selector (choose_engine,
    query_submit.py --engine auto): the routing decision dispatches for
    real (a wrong route raises → err row), and the routed engine's results
    must equal the same oracle."""
    from alexandria_spark.plans.query import choose_engine

    bmw = q_bmw_search_topk(spark, sf_dir)
    dp = q_docpart_search_topk(spark, sf_dir)
    li = q_local_index_topk(spark, sf_dir)
    route = choose_engine(" ".join(Q_AND), "and", _IDX_CFG)
    if route != "docpart":  # the documented AND rule (plans/query.py:447)
        raise AssertionError(f"auto routed a multi-term AND to {route!r}")
    auto = {"bmw": q_bmw_search_topk, "docpart": q_docpart_search_topk,
            "local": q_local_index_topk}[route](spark, sf_dir)
    return (
        bmw.select(F.lit("bmw").alias("engine"), "doc_id", "score")
        .unionByName(dp.select(F.lit("docpart").alias("engine"), "doc_id", "score"))
        .unionByName(li.select(F.lit("local").alias("engine"), "doc_id", "score"))
        .unionByName(auto.select(F.lit("auto").alias("engine"), "doc_id", "score"))
    )


def _sql_engines_search_topk():
    return (
        f"SELECT 'bmw' AS engine, doc_id, score FROM ({SQL_INDEX_SEARCH_TOPK})"
        f" UNION ALL "
        f"SELECT 'docpart', doc_id, score FROM ({SQL_INDEX_SEARCH_TOPK})"
        f" UNION ALL "
        f"SELECT 'local', doc_id, score FROM ({SQL_INDEX_SEARCH_TOPK})"
        f" UNION ALL "
        f"SELECT 'auto', doc_id, score FROM ({SQL_INDEX_SEARCH_TOPK})"
    )


def q_impact_topk(spark, sf_dir):
    """Impact-ordered layout single-term + OR top-k in one relation."""
    s = q_impact_single_topk(spark, sf_dir)
    o = q_impact_or_topk(spark, sf_dir)
    return (
        s.select(F.lit("single").alias("mode"), "doc_id", "score")
        .unionByName(o.select(F.lit("or").alias("mode"), "doc_id", "score"))
    )


def _sql_impact_topk():
    return (
        f"SELECT 'single' AS mode, doc_id, score FROM ({SQL_IMPACT_SINGLE_TOPK})"
        f" UNION ALL "
        f"SELECT 'or', doc_id, score FROM ({SQL_INDEX_SEARCH_OR_TOPK})"
    )


# Ordering: the driver sweep has a hard ~50-row budget that historically ran
# out at the TAIL. With 49 entries everything fits, but as insurance the
# entries that have NEVER had (or are missing) a driver row lead, streaming
# entries go next (round 2 lost the final entry), heavy index entries sit
# mid-dict, and the cheap analysis/similarity entries close.
ENTRIES: dict[str, tuple] = {
    # never driver-gated before round 4
    **membership.ENTRIES,            # bloom_new_docs
    **chunking.ENTRIES,              # prep_pipeline (stratified+pack never gated)
    **multimodal.ENTRIES,            # multimodal_meta, multimodal_features
    **serving.ENTRIES,               # serve_recompute_full (5 folded ops)
    **graph.ENTRIES,                 # graph_centrality
    **links.ENTRIES,                 # link_boosts
    **_stream_windows.ENTRIES,
    "content_sha256": (q_content_sha256, SQL_CONTENT_SHA256),
    "corpus_doc_lengths": (q_corpus_doc_lengths, SQL_CORPUS_DOC_LENGTHS),
    "term_counts_modes": (q_term_counts_modes, SQL_TERM_COUNTS_MODES),
    "term_doc_freq": (q_term_doc_freq, SQL_TERM_DOC_FREQ),
    "top_terms": (q_top_terms, SQL_TOP_TERMS),
    "bm25_modes": (q_bm25_modes, SQL_BM25_MODES),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "bm25_phrase": (q_bm25_phrase, SQL_BM25_PHRASE),
    "phrase_bigram": (q_phrase_bigram, SQL_PHRASE_BIGRAM),
    "group_by_source": (q_group_by_source, SQL_GROUP_BY_SOURCE),
    "top_per_source": (q_top_per_source, SQL_TOP_PER_SOURCE),
    "index_search_topk": (q_index_search_topk, SQL_INDEX_SEARCH_TOPK),
    "index_search_or_topk": (q_index_search_or_topk, SQL_INDEX_SEARCH_OR_TOPK),
    "engines_search_topk": (q_engines_search_topk, _sql_engines_search_topk()),
    "index_doc_lengths": (q_index_doc_lengths, SQL_INDEX_DOC_LENGTHS),
    "index_term_stats": (q_index_term_stats, SQL_INDEX_TERM_STATS),
    "posting_iteration": (q_posting_iteration, SQL_POSTING_ITERATION),
    "index_serve_full": (q_index_serve_full, _sql_index_serve_full()),
    "docpart_serve_full": (q_docpart_serve_full, _sql_index_serve_full()),
    "impact_topk": (q_impact_topk, _sql_impact_topk()),
    "merge_search_topk": (q_merge_search_topk, SQL_INDEX_SEARCH_TOPK),
    "index_phrase": (q_index_phrase, SQL_INDEX_PHRASE),
    "index_group_by_source": (q_index_group_by_source, SQL_GROUP_BY_SOURCE),
    # training-data pipeline operators (operators/{dedup,analysis,similarity})
    **dedup.ENTRIES,
    **analysis.ENTRIES,
    **similarity.ENTRIES,
}


def queries():
    return {name: fn for name, (fn, _sql) in ENTRIES.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ENTRIES.items() if sql is not None}
