"""URL-link and domain-link score boosts over a links relation.

Re-expresses the reference's two link-boost passes
(src/indexer/index_manager.cpp:340-397):

- ``apply_link_scores`` (URL level): links carry (source_domain,
  target_hash, score); duplicates per (source_domain, target_hash) are
  dropped, then every surviving link adds ``expm1(25*score)/50`` to the
  result whose doc hash equals target_hash (a sorted merge-join in the
  reference).
- ``apply_domain_link_scores`` (domain level): links carry (source_domain,
  target_domain, score); duplicates per (source_domain, target_domain) are
  dropped, per-target-domain boosts are summed into a hash map, and every
  result gets the boost of its own domain.

Spark-first shape for 100 TB: the links table is arbitrarily large but the
candidate result set is bounded (pre_result_limit, 200k in the reference,
config.cpp:82) — so we semi-join links down to the candidates FIRST
(broadcasting the small candidate key set), aggregate the tiny boost
relation, and broadcast it back. The full links table is never shuffled.

The reference's dedup keeps the first link encountered per pair (input
order); order is not reproducible under a distributed scan, so we take
``max(score)`` per pair — deterministic, and identical when a pair appears
once (the common case after upstream link extraction dedups).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from alexandria_spark.operators.sql_common import SQL_PRELUDE
from alexandria_spark.sources.tables import documents

# boost formula constants (index_manager.cpp:351, :386)
_SCALE = 25.0
_DAMP = 50.0


def _boost_expr(score_col):
    return F.expm1(_SCALE * score_col) / _DAMP


def url_link_boosts(links: DataFrame, candidates: DataFrame | None = None) -> DataFrame:
    """(target_hash, boost): per-(source_domain, target_hash) dedup, then
    sum of expm1(25*s)/50 per target. ``candidates`` (a 1-column doc_id
    DataFrame) prunes the links scan to the bounded result set before any
    shuffle — the at-scale path."""
    if candidates is not None:
        keys = candidates.select(F.col(candidates.columns[0]).alias("target_hash")).distinct()
        links = links.join(F.broadcast(keys), "target_hash", "left_semi")
    per_pair = links.groupBy("source_domain", "target_hash").agg(F.max("score").alias("s"))
    return (
        per_pair.withColumn("b", _boost_expr(F.col("s")))
        .groupBy("target_hash")
        .agg(F.sum("b").alias("boost"))
    )


def apply_url_link_boosts(results: DataFrame, links: DataFrame,
                          doc_col: str = "doc_id",
                          score_col: str = "score") -> DataFrame:
    """results(doc_id, score, ...) + links(source_domain, target_hash, score)
    -> results with score += sum of deduped matching link boosts."""
    boosts = url_link_boosts(links, candidates=results.select(doc_col))
    joined = results.join(
        F.broadcast(boosts), results[doc_col] == boosts["target_hash"], "left"
    )
    return joined.withColumn(
        score_col, F.col(score_col) + F.coalesce(F.col("boost"), F.lit(0.0))
    ).drop("target_hash", "boost")


def domain_link_boosts(domain_links: DataFrame) -> DataFrame:
    """(target_domain, boost): per-(source_domain, target_domain) dedup then
    groupBy(target_domain).sum — the reference's domain_scores map."""
    per_pair = domain_links.groupBy("source_domain", "target_domain").agg(
        F.max("score").alias("s")
    )
    return (
        per_pair.withColumn("b", _boost_expr(F.col("s")))
        .groupBy("target_domain")
        .agg(F.sum("b").alias("boost"))
    )


def apply_domain_link_boosts(results: DataFrame, domain_links: DataFrame,
                             domain_col: str = "source",
                             score_col: str = "score") -> DataFrame:
    """results(..., source, score) + domain_links(source_domain,
    target_domain, score) -> score += its domain's summed boost. The boost
    relation has one row per target domain — always broadcastable."""
    boosts = domain_link_boosts(domain_links)
    joined = results.join(
        F.broadcast(boosts), results[domain_col] == boosts["target_domain"], "left"
    )
    return joined.withColumn(
        score_col, F.col(score_col) + F.coalesce(F.col("boost"), F.lit(0.0))
    ).drop("target_domain", "boost")


# ------------------------------------------------------------ synth links

def synth_links(docs: DataFrame, n: int | None = None) -> DataFrame:
    """Deterministic links(source_domain, target_hash, score) derived from
    the documents table (each doc emits one out-link); used by the suite
    entries and their DuckDB oracles, which restate the same arithmetic.
    Pass ``n`` (the doc count) to skip the count job when already known."""
    if n is None:
        n = docs.count()
    return docs.select(
        F.col("source").alias("source_domain"),
        ((F.col("doc_id") * 37 + 11) % n).alias("target_hash"),
        (((F.col("doc_id") * 13) % 100) / 100.0).alias("score"),
    )


def synth_domain_links(docs: DataFrame, n: int | None = None) -> DataFrame:
    """Domain-level links: target_domain = the linked-to doc's own domain."""
    links = synth_links(docs, n)
    tgt = docs.select(F.col("doc_id").alias("target_hash"),
                      F.col("source").alias("target_domain"))
    return links.join(tgt, "target_hash").select("source_domain", "target_domain", "score")


_SQL_LINKS = """
, links AS (
  SELECT source AS source_domain,
         (doc_id * 37 + 11) % (SELECT count(*) FROM documents) AS target_hash,
         ((doc_id * 13) % 100) / 100.0e0 AS score
  FROM documents
)
"""

Q_LINK = ["table", "hash"]


def _base_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alexandria_spark.operators.text import bm25_postings

    docs = documents(spark, sf_dir)
    return (
        bm25_postings(docs).where(F.col("term").isin(Q_LINK))
        .groupBy("doc_id")
        .agg(F.sum(F.col("score").cast("double")).alias("score"),
             F.count("*").alias("nt"))
        .where(F.col("nt") == len(Q_LINK))
        .drop("nt")
    ), docs


_SQL_BASE_AND = f"""
, base AS (
  SELECT doc_id, sum(CAST(score AS DOUBLE)) AS score
  FROM scored WHERE term IN ('{Q_LINK[0]}','{Q_LINK[1]}')
  GROUP BY doc_id HAVING count(*) = {len(Q_LINK)}
)
"""


_N_CACHE: dict[str, int] = {}


def _n_docs(docs: DataFrame, sf_dir: str) -> int:
    if sf_dir not in _N_CACHE:
        _N_CACHE[sf_dir] = docs.count()
    return _N_CACHE[sf_dir]


def q_url_link_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, docs = _base_and(spark, sf_dir)
    boosted = apply_url_link_boosts(base, synth_links(docs, _n_docs(docs, sf_dir)))
    return boosted.select("doc_id", F.round("score", 4).alias("score"))


SQL_URL_LINK_BOOST = SQL_PRELUDE + _SQL_LINKS + _SQL_BASE_AND + """
, pp AS (SELECT source_domain, target_hash, max(score) AS s
         FROM links GROUP BY source_domain, target_hash),
bst AS (SELECT target_hash, sum((exp(25.0e0 * s) - 1.0e0) / 50.0e0) AS boost
        FROM pp GROUP BY target_hash)
SELECT b.doc_id, round(b.score + coalesce(bst.boost, 0.0e0), 4) AS score
FROM base b LEFT JOIN bst ON bst.target_hash = b.doc_id
"""


def q_domain_link_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, docs = _base_and(spark, sf_dir)
    with_dom = base.join(docs.select("doc_id", "source"), "doc_id")
    boosted = apply_domain_link_boosts(
        with_dom, synth_domain_links(docs, _n_docs(docs, sf_dir)))
    return boosted.select("doc_id", "source", F.round("score", 4).alias("score"))


SQL_DOMAIN_LINK_BOOST = SQL_PRELUDE + _SQL_LINKS + _SQL_BASE_AND + """
, dlinks AS (
  SELECT l.source_domain, d.source AS target_domain, l.score
  FROM links l JOIN documents d ON d.doc_id = l.target_hash
),
pp AS (SELECT source_domain, target_domain, max(score) AS s
       FROM dlinks GROUP BY source_domain, target_domain),
bst AS (SELECT target_domain, sum((exp(25.0e0 * s) - 1.0e0) / 50.0e0) AS boost
        FROM pp GROUP BY target_domain)
SELECT b.doc_id, d.source,
       round(b.score + coalesce(bst.boost, 0.0e0), 4) AS score
FROM base b JOIN documents d USING (doc_id)
LEFT JOIN bst ON bst.target_domain = d.source
"""

def q_link_boosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE driver-gate row for both boost channels (folds the former
    url_link_boost / domain_link_boost entries): the URL-level and
    domain-level boosted result sets, tagged by channel."""
    u = q_url_link_boost(spark, sf_dir)
    d = q_domain_link_boost(spark, sf_dir)
    return (
        u.select(F.lit("url").alias("channel"), "doc_id",
                 F.lit("").alias("source"), "score")
        .unionByName(
            d.select(F.lit("domain").alias("channel"), "doc_id", "source", "score"))
    )


SQL_LINK_BOOSTS = (
    f"SELECT 'url' AS channel, doc_id, '' AS source, score"
    f" FROM ({SQL_URL_LINK_BOOST}) UNION ALL "
    f"SELECT 'domain', doc_id, source, score FROM ({SQL_DOMAIN_LINK_BOOST})"
)

ENTRIES = {
    "link_boosts": (q_link_boosts, SQL_LINK_BOOSTS),
}
