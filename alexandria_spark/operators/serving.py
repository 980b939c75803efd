"""Serving-pipeline operators: the reference's full query lifecycle as
DataFrame stages — match counting, link-style score boosts, per-"domain"
result dedup, and decoration — each with a DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from alexandria_spark.operators.sql_common import SQL_PRELUDE
from alexandria_spark.operators.text import bm25_postings, doc_term_counts
from alexandria_spark.sources.tables import documents

Q_SERVE = ["table", "hash"]
Q_COUNT = ["dup", "join"]
BOOST_TERM = "merge"


def count_matches(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(n_and, n_or) — result counts for a term set; the analogue of the
    reference's find_count / total_found metrics (basic_index.h:196-234,
    search_metric.h:31-41)."""
    tc = doc_term_counts(docs).where(F.col("term").isin(terms))
    per_doc = tc.groupBy("doc_id").agg(F.count("*").alias("nt"))
    return per_doc.agg(
        F.sum(F.when(F.col("nt") == len(set(terms)), 1).otherwise(0))
        .cast("long").alias("n_and"),
        F.count("*").cast("long").alias("n_or"),
    )


def distinct_counts(docs: DataFrame) -> DataFrame:
    """(n_docs, n_terms) — exact distinct counts. At cluster scale the doc
    counter becomes approx_count_distinct (the reference uses a
    HyperLogLog, hyper_log_log.cpp:33-121); exact here so the oracle can
    verify bit-for-bit."""
    tc = doc_term_counts(docs)
    return tc.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.countDistinct("term").cast("long").alias("n_terms"),
    )


def source_boosted_scores(docs: DataFrame, term: str) -> DataFrame:
    """(doc_id, score) — BM25 + the reference's link-boost formula
    score += expm1(25·s)/50 (index_manager.cpp:340-397), with s = the
    source's document share standing in for the domain-link score. The
    boost side is a small aggregate joined broadcast-style, exactly like
    the reference's domain hash-join."""
    base = bm25_postings(docs).where(F.col("term") == term).select(
        "doc_id", F.col("score").cast("double").alias("score")
    )
    src = docs.groupBy("source").agg(F.count("*").alias("sc"))
    mx = src.agg(F.max("sc").alias("mx"))
    boost = src.crossJoin(F.broadcast(mx)).select(
        "source",
        (F.expm1(25.0 * (F.col("sc") / F.col("mx").cast("double"))) / 50.0).alias("boost"),
    )
    j = base.join(docs.select("doc_id", "source"), "doc_id").join(
        F.broadcast(boost), "source"
    )
    return j.select(
        "doc_id", F.round(F.col("score") + F.col("boost"), 4).alias("score")
    )


def serve_topk(docs: DataFrame, terms: list[str], k: int = 10,
               per_source: int = 2, snippet_len: int = 140) -> DataFrame:
    """The reference's full serving pipeline (index_manager.cpp:249-294):
    conjunctive BM25 → per-domain dedup (row_number ≤ N per source,
    config deduplicate_domain_count) → decoration with a snippet
    (return_record.h:60-65) → final top-k ordered score desc, doc asc."""
    base = (
        bm25_postings(docs).where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("score").cast("double")), 4).alias("score"),
             F.count("*").alias("nt"))
        .where(F.col("nt") == len(set(terms)))
        .drop("nt")
    )
    j = base.join(
        docs.select("doc_id", "source", F.substring("text", 1, snippet_len).alias("snippet")),
        "doc_id",
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_source)
        .select("source", "doc_id", "score", "snippet")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def truncate_candidates(results: DataFrame, cfg, id_col: str = "doc_id") -> DataFrame:
    """Pre-dedup candidate truncation to cfg.pre_result_limit by
    (score desc, doc asc) — the reference's nth_element resize
    (index_manager.cpp:284-288, config::pre_result_limit=200k,
    config.cpp:82). Catalyst executes this as TakeOrderedAndProject
    (per-partition heaps + driver merge), so no full sort materializes."""
    return (
        results.orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(cfg.pre_result_limit))
    )


def deduplicate_results(results: DataFrame, cfg,
                        domain_col: str = "source",
                        id_col: str = "doc_id") -> DataFrame:
    """The reference's deduplicate_search_results (index_manager.cpp:296-325):
    walking the score-ranked candidates, a result is kept while its domain
    has produced < cfg.dedup_group_count results; if fewer than
    cfg.result_limit survive, over-cap rows backfill in score order.

    Equivalent DataFrame form: the walk-order count per domain IS the
    per-domain row_number over (score desc, doc asc), so in_cap =
    row_number <= dedup_group_count. Kept rows are the first
    ``result_limit`` of each class, so each class is TakeOrdered-truncated
    to result_limit rows FIRST and the rank/backfill windows run over at
    most 2 x result_limit rows — no unkeyed window ever sees more than
    that, whatever pre_result_limit grows to. The backfill quota needs
    only min(n_dedup, result_limit), which the truncated in-cap class
    itself provides."""
    cap, limit = int(cfg.dedup_group_count), int(cfg.result_limit)
    order = (F.desc("score"), F.asc(id_col))
    w_dom = Window.partitionBy(domain_col).orderBy(*order)
    r = results.withColumn("in_cap", F.row_number().over(w_dom) <= cap)
    # per-class TakeOrderedAndProject: rows past result_limit in either
    # class can never be kept (in-cap rank > limit; backfill quota <= limit)
    in_top = r.where(F.col("in_cap")).orderBy(*order).limit(limit)
    over_top = r.where(~F.col("in_cap")).orderBy(*order).limit(limit)
    small = in_top.unionByName(over_top)
    w_grp = Window.partitionBy("in_cap").orderBy(*order)
    small = small.withColumn("gn", F.row_number().over(w_grp))
    n_dedup = small.agg(
        F.sum(F.when(F.col("in_cap"), 1).otherwise(0)).cast("long").alias("nd")
    )  # == min(true n_dedup, limit): exactly what the quota formula needs
    small = small.crossJoin(F.broadcast(n_dedup))
    keep = (F.col("in_cap") & (F.col("gn") <= limit)) | (
        ~F.col("in_cap") & (F.col("gn") <= F.greatest(F.lit(limit) - F.col("nd"), F.lit(0)))
    )
    return (
        small.where(keep).drop("in_cap", "gn", "nd")
        .orderBy(*order)
    )


def serve_pipeline(docs: DataFrame, terms: list[str], cfg,
                   snippet_len: int = 140) -> DataFrame:
    """Config-driven serve path (index_manager.cpp:279-294): conjunctive
    BM25 → truncate to pre_result_limit → per-domain dedup capped at
    dedup_group_count with score-order backfill → result_limit → decorate."""
    base = (
        bm25_postings(docs).where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("score").cast("double")), 4).alias("score"),
             F.count("*").alias("nt"))
        .where(F.col("nt") == len(set(terms)))
        .drop("nt")
    )
    cand = truncate_candidates(base, cfg)
    with_dom = cand.join(
        docs.select("doc_id", "source",
                    F.substring("text", 1, snippet_len).alias("snippet")),
        "doc_id",
    )
    return deduplicate_results(with_dom, cfg).select(
        "source", "doc_id", "score", "snippet"
    )


def serve_full_index(spark: SparkSession, index, query: str,
                     links: DataFrame, domain_links: DataFrame,
                     store: DataFrame, cfg, mode: str = "and",
                     snippet_len: int = 140,
                     round_to: int | None = None,
                     searcher=None) -> DataFrame:
    """The reference's COMPLETE ``index_manager::find`` lifecycle
    (index_manager.cpp:249-294) composed over the PERSISTED block index:

      intersect (plans/query.search over the delta+varint shards)
      → URL-link boosts        (apply_link_scores, :340-363)
      → domain-link boosts     (apply_domain_link_scores, :365-397)
      → pre_result_limit       (nth_element resize, :284-288)
      → per-domain dedup       (deduplicate_search_results, :296-325)
      → decoration + snippet   (hash-table doc-store find, :327-338)

    Scale posture: the index scan is shard-pruned; boosts semi-join the
    links relation down to the candidates before any shuffle and broadcast
    the tiny aggregate back; the bucketed doc store is joined without a
    store-side shuffle; truncation is TakeOrderedAndProject.

    ``round_to`` quantizes boosted scores (half-up) BEFORE ranking so a
    DuckDB oracle ranking on the same rounded values selects identical
    boundary rows (the reference's f32 score sums carry their own
    quantization; exact-float rank identity across engines needs a common
    grid once transcendental boosts enter the score).

    ``searcher`` swaps the candidate source: a ``(query, mode) -> DataFrame``
    callable returning at least (doc_id, score) for EVERY match — e.g.
    ``lambda q, m: engine.search(q, m, k=None)`` to serve the same pipeline
    over a warm doc-partitioned engine.
    """
    from alexandria_spark.operators.links import (
        apply_domain_link_boosts,
        apply_url_link_boosts,
    )
    from alexandria_spark.plans.query import search
    from alexandria_spark.sources.docstore import decorate_from_store

    if searcher is None:
        cands = search(spark, index, query, mode=mode, k=None, cfg=cfg)
    else:
        cands = searcher(query, mode)
    cands = cands.drop("n_terms")
    boosted = apply_url_link_boosts(cands, links)
    # the result's own domain drives both the domain boost and the dedup;
    # the store join is bucket-co-located (no store-side shuffle)
    with_dom = boosted.join(store.select("doc_id", "source"), "doc_id")
    boosted = apply_domain_link_boosts(with_dom, domain_links)
    if round_to is not None:
        boosted = boosted.withColumn("score", F.round("score", round_to))
    cand = truncate_candidates(boosted, cfg)
    kept = deduplicate_results(cand, cfg)
    return decorate_from_store(kept, store, snippet_len).select(
        "source", "doc_id", "score", "snippet"
    )


# ------------------------------------------------------------ suite entries

def q_count_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return count_matches(documents(spark, sf_dir), Q_COUNT)


SQL_COUNT_MATCHES = SQL_PRELUDE + f"""
SELECT sum(CASE WHEN nt = 2 THEN 1 ELSE 0 END)::BIGINT AS n_and,
       count(*)::BIGINT AS n_or
FROM (SELECT doc_id, count(*) AS nt FROM tf
      WHERE term IN ('{Q_COUNT[0]}','{Q_COUNT[1]}') GROUP BY doc_id)
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_counts(documents(spark, sf_dir))


SQL_DISTINCT_COUNTS = SQL_PRELUDE + """
SELECT (SELECT count(*) FROM dl)::BIGINT AS n_docs,
       (SELECT count(*) FROM dfreq)::BIGINT AS n_terms
"""


def q_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_boosted_scores(documents(spark, sf_dir), BOOST_TERM)


SQL_BOOSTED = SQL_PRELUDE + f"""
, src AS (SELECT source, count(*) AS sc FROM documents GROUP BY source),
mx AS (SELECT max(sc) AS mx FROM src),
bst AS (SELECT source, (exp(25.0e0 * (sc / CAST(mx AS DOUBLE))) - 1.0e0) / 50.0e0 AS boost
        FROM src CROSS JOIN mx)
SELECT s.doc_id, round(CAST(s.score AS DOUBLE) + bst.boost, 4) AS score
FROM scored s JOIN documents d USING (doc_id) JOIN bst ON bst.source = d.source
WHERE s.term = '{BOOST_TERM}'
"""


def q_serve_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serve_topk(documents(spark, sf_dir), Q_SERVE)


SQL_SERVE_TOPK = SQL_PRELUDE + f"""
, base AS (
  SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score
  FROM scored WHERE term IN ('{Q_SERVE[0]}','{Q_SERVE[1]}')
  GROUP BY doc_id HAVING count(*) = 2
),
j AS (SELECT d.source, b.doc_id, b.score, substr(d.text, 1, 140) AS snippet
      FROM base b JOIN documents d USING (doc_id)),
w AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, doc_id ASC) AS rn FROM j)
SELECT source, doc_id, score, snippet FROM w WHERE rn <= 2
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

def q_serve_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alexandria_spark.config import EngineConfig

    # limits sized so all three knobs bite at sf0.001 (the single term
    # 'merge' matches ~400 docs there)
    cfg = EngineConfig(pre_result_limit=100, dedup_group_count=2, result_limit=30)
    return serve_pipeline(documents(spark, sf_dir), [BOOST_TERM], cfg)


SQL_SERVE_PIPELINE = SQL_PRELUDE + f"""
, base AS (
  SELECT doc_id, round(sum(CAST(score AS DOUBLE)), 4) AS score
  FROM scored WHERE term = '{BOOST_TERM}' GROUP BY doc_id
),
cand AS (SELECT * FROM base ORDER BY score DESC, doc_id ASC LIMIT 100),
j AS (SELECT d.source, c.doc_id, c.score, substr(d.text, 1, 140) AS snippet
      FROM cand c JOIN documents d USING (doc_id)),
r AS (SELECT *, (row_number() OVER (PARTITION BY source
                 ORDER BY score DESC, doc_id ASC)) <= 2 AS in_cap FROM j),
g AS (SELECT *, row_number() OVER (PARTITION BY in_cap
                 ORDER BY score DESC, doc_id ASC) AS gn FROM r),
nd AS (SELECT count(*) AS nd FROM r WHERE in_cap)
SELECT source, doc_id, score, snippet FROM g CROSS JOIN nd
WHERE (in_cap AND gn <= 30) OR ((NOT in_cap) AND gn <= greatest(30 - nd, 0))
"""

def q_serve_recompute_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE driver-gate row for the whole recompute-path serving surface
    (folds the former count_matches / distinct_counts / bm25_source_boost /
    serve_pipeline_limits / serve_topk_dedup_decorated entries so the
    driver's ~50-row sweep budget covers every operator): each stage's full
    output re-projected into a tall (stage, k, num, txt) relation. A bug in
    ANY folded operator changes its stage's rows and reddens the entry."""
    docs = documents(spark, sf_dir)

    def scalar_rows(df: DataFrame, stage: str) -> DataFrame:
        cols = df.columns
        return df.select(
            F.explode(F.array(*[
                F.struct(F.lit(c).alias("k"), F.col(c).cast("double").alias("num"))
                for c in cols
            ])).alias("kv")
        ).select(
            F.lit(stage).alias("stage"), F.col("kv.k").alias("k"),
            F.col("kv.num").alias("num"), F.lit("").alias("txt"),
        )

    def serve_rows(df: DataFrame, stage: str) -> DataFrame:
        # NULL-safe transport concat: concat_ws silently DROPS nulls (and
        # their separator) while the oracle's || yields NULL — coalesce
        # both fields on both sides so a NULL source/snippet hashes
        # identically instead of reddening the entry
        return df.select(
            F.lit(stage).alias("stage"),
            F.col("doc_id").cast("string").alias("k"),
            F.col("score").cast("double").alias("num"),
            F.concat(F.coalesce(F.col("source"), F.lit("")), F.lit("|"),
                     F.coalesce(F.col("snippet"), F.lit(""))).alias("txt"),
        )

    from alexandria_spark.config import EngineConfig

    cfg = EngineConfig(pre_result_limit=100, dedup_group_count=2, result_limit=30)
    boosted = source_boosted_scores(docs, BOOST_TERM).select(
        F.lit("boost").alias("stage"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("score").cast("double").alias("num"),
        F.lit("").alias("txt"),
    )
    return (
        scalar_rows(count_matches(docs, Q_COUNT), "counts")
        .unionByName(scalar_rows(distinct_counts(docs), "distinct"))
        .unionByName(boosted)
        .unionByName(serve_rows(serve_pipeline(docs, [BOOST_TERM], cfg), "pipeline"))
        .unionByName(serve_rows(serve_topk(docs, Q_SERVE), "topk"))
    )


SQL_SERVE_RECOMPUTE_FULL = " UNION ALL ".join([
    f"SELECT 'counts' AS stage, 'n_and' AS k, CAST(n_and AS DOUBLE) AS num,"
    f" '' AS txt FROM ({SQL_COUNT_MATCHES})",
    f"SELECT 'counts', 'n_or', CAST(n_or AS DOUBLE), '' FROM ({SQL_COUNT_MATCHES})",
    f"SELECT 'distinct', 'n_docs', CAST(n_docs AS DOUBLE), '' FROM ({SQL_DISTINCT_COUNTS})",
    f"SELECT 'distinct', 'n_terms', CAST(n_terms AS DOUBLE), '' FROM ({SQL_DISTINCT_COUNTS})",
    f"SELECT 'boost', CAST(doc_id AS VARCHAR), CAST(score AS DOUBLE), ''"
    f" FROM ({SQL_BOOSTED})",
    f"SELECT 'pipeline', CAST(doc_id AS VARCHAR), CAST(score AS DOUBLE),"
    f" coalesce(source, '') || '|' || coalesce(snippet, '')"
    f" FROM ({SQL_SERVE_PIPELINE})",
    f"SELECT 'topk', CAST(doc_id AS VARCHAR), CAST(score AS DOUBLE),"
    f" coalesce(source, '') || '|' || coalesce(snippet, '')"
    f" FROM ({SQL_SERVE_TOPK})",
])

ENTRIES = {
    "serve_recompute_full": (q_serve_recompute_full, SQL_SERVE_RECOMPUTE_FULL),
}
