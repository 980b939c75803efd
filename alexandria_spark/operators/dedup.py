"""Deduplication operators for training-data pipelines.

Exact (content-hash groupBy), MinHash signatures over 3-gram token shingles
(LSH-ready), and SimHash fingerprints. All are pure built-in-function
DataFrame pipelines (JVM-side, codegen-friendly) — the hashes are derived
from md5 so the DuckDB oracle can reproduce them bit-for-bit.

At 100 TB: exact dedup is a single hash-shuffle groupBy; MinHash signatures
are a map-only pass (shuffle only the (doc, band) pairs for the LSH
bucket-join); SimHash is a map-only pass + 16 small aggregations fused into
one groupBy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from alexandria_spark.operators.sql_common import SQL_PRELUDE
from alexandria_spark.operators.text import doc_term_counts, doc_tokens_pos
from alexandria_spark.sources.tables import documents

# fixed minhash permutations (a*x + b) mod P over x in [0, P)
P31 = 2147483647
PERMS = [(131, 7), (1009, 17), (2003, 29), (5011, 43),
         (7001, 61), (9001, 79), (11003, 97), (13001, 113)]


def md5_int60(col):
    """Deterministic 60-bit integer hash reproducible in DuckDB:
    first 15 hex chars of md5 as a BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash — hash-groupBy, one shuffle."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keep_doc"))
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — n-gram token shingles (n=3), space-joined like the
    reference's n-gram keys (text.cpp:360-373).

    MAP-ONLY: each document's text lives in one row, so its shingles are
    computed inside the Arrow batch (vectorized shifted-concat over the
    token stream) with ZERO shuffle — the previous implementation windowed
    over every token (full-token shuffle + sort), which at 100 TB would be
    the dominant cost of the whole near-dup pipeline."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from alexandria_spark.functions.tokenizer import tokenize_series

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("shingle", StringType()),
    ])

    def fn(batches):
        for pdf in batches:
            rows, words = tokenize_series(pdf["text"])
            ids = pdf["doc_id"].to_numpy(np.int64)
            m = len(rows) - (n - 1)
            if m <= 0:
                yield pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                    "shingle": np.empty(0, object)})
                continue
            # tokens arrive in document order; a window of n tokens is a
            # shingle iff it never crosses a document boundary
            keep = rows[: m] == rows[n - 1:]
            joined = pd.Series(words[:m], dtype=object)
            for j in range(1, n):
                joined = joined + " " + pd.Series(words[j: m + j], dtype=object)
            yield pd.DataFrame({
                "doc_id": ids[rows[:m][keep]],
                "shingle": joined.to_numpy()[keep],
            })

    return docs.select("doc_id", "text").mapInPandas(fn, schema)


def minhash_signatures(docs: DataFrame, _shingles: DataFrame | None = None) -> DataFrame:
    """(doc_id, perm_id, minh) — 8-permutation MinHash over 3-gram shingles.
    ``_shingles`` reuses a precomputed (cached) shingle relation."""
    sh = (_shingles if _shingles is not None else shingles(docs)).withColumn(
        "x", md5_int60(F.col("shingle")) % P31
    )
    perms = sh.sparkSession.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(PERMS)], ["perm_id", "a", "b"]
    )
    return (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm_id")
        .agg(F.min((F.col("a") * F.col("x") + F.col("b")) % P31).alias("minh"))
    )


def lsh_candidate_pairs(docs: DataFrame, band_size: int = 4,
                        max_bucket: int | None = 10_000,
                        _shingles: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b) candidate near-duplicate pairs: docs sharing a full
    MinHash band (banding → bucket-join, the scalable LSH path).

    Hot-bucket guard: a degenerate bucket of B docs creates B²/2 pairs in
    ONE task (boilerplate/empty files land in the same band at web scale).
    Buckets larger than ``max_bucket`` are dropped and counted — the
    standard LSH cap (such buckets are near-universal content whose pairs a
    verifier would reject anyway); pass None to disable.
    """
    sig = minhash_signatures(docs, _shingles).withColumn(
        "band", (F.col("perm_id") / band_size).cast("int")
    )
    bands = sig.groupBy("doc_id", "band").agg(
        F.concat_ws(",", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("perm_id"), F.col("minh"))
        ))).alias("band_key")
    )
    if max_bucket is not None:
        sizes = bands.groupBy("band", "band_key").agg(F.count("*").alias("bn"))
        bands = bands.join(
            sizes.where(F.col("bn") <= max_bucket).select("band", "band_key"),
            ["band", "band_key"],
            "left_semi",
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash: md5-derived term hash, tf-weighted
    bit majority vote.

    Single-shuffle plan: one groupBy(doc_id) with 16 conditional-sum
    expressions (map-side partial aggregation applies), instead of exploding
    a 16-row bit sequence per (doc, term) — 16x less shuffled data.
    """
    tc = doc_term_counts(docs).withColumn("h", md5_int60(F.col("term")) % 65536)
    per_doc = tc.groupBy("doc_id").agg(
        *[
            F.sum(F.col("tf") * (F.expr(f"shiftright(h, {b}) % 2") * 2 - 1)).alias(f"s{b}")
            for b in range(16)
        ]
    )
    bits = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return per_doc.select("doc_id", bits.cast("bigint").alias("simhash"))


def ngram_jaccard(docs: DataFrame, pairs: DataFrame,
                  digits: int | None = 4,
                  _shingles: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact shingle-set Jaccard for candidate
    pairs (verification stage after LSH). ``digits=None`` returns the raw
    IEEE-double ratio (bit-exact reproducible: pure integer arithmetic
    until one division). ``_shingles`` reuses a precomputed relation when
    the caller already has one; measured on this host, persist()-ing
    shingles purely to share them between LSH and verification was SLOWER
    than recomputing (string materialization > window recompute), so only
    pass a relation that exists anyway."""
    sh = (_shingles if _shingles is not None else shingles(docs)).distinct()
    a = sh.alias("sa").join(pairs, F.col("sa.doc_id") == F.col("doc_a"))
    both = a.join(
        sh.alias("sb"),
        (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sa.shingle") == F.col("sb.shingle")),
        "left",
    )
    inter = both.groupBy("doc_a", "doc_b").agg(
        F.count(F.col("sb.shingle")).alias("inter")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            _maybe_round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                digits,
            ).alias("jaccard"),
        )
    )


def _maybe_round(col, digits: int | None):
    return col if digits is None else F.round(col, digits)


def cross_corpus_contamination(docs: DataFrame, bench: DataFrame,
                               band_size: int = 4) -> DataFrame:
    """(doc_id, bench_id, kind) — training docs that leak benchmark content
    (the decontamination step of a training-data pipeline): ``exact`` =
    identical content hash; ``near`` = shares a full MinHash band with a
    benchmark doc (the LSH candidate relation across the two corpora —
    verify survivors with ngram_jaccard if a threshold matters).

    Scale: exact is one hash equi-join; near is a band-key equi-join of
    per-corpus signatures — never an all-pairs product. The benchmark side
    is normally tiny (broadcastable); neither side ships raw text."""
    ex = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(bench.select(F.col("doc_id").alias("bench_id"),
                           F.md5("text").alias("h")), "h")
        .select("doc_id", "bench_id", F.lit("exact").alias("kind"))
    )

    def bands(df):
        sig = minhash_signatures(df).withColumn(
            "band", (F.col("perm_id") / band_size).cast("int")
        )
        return sig.groupBy("doc_id", "band").agg(
            F.concat_ws(",", F.array_sort(F.collect_list(
                F.concat_ws(":", F.col("perm_id"), F.col("minh"))
            ))).alias("band_key")
        )

    near = (
        bands(docs)
        .join(bands(bench).select(F.col("doc_id").alias("bench_id"),
                                  "band", "band_key"),
              ["band", "band_key"])
        .select("doc_id", "bench_id", F.lit("near").alias("kind"))
        .distinct()
    )
    # a pair that matches exactly also shares every band; report it once
    return ex.unionByName(
        near.join(ex.select("doc_id", "bench_id"), ["doc_id", "bench_id"],
                  "left_anti")
    )


# ------------------------------------------------------------ suite entries

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dups(documents(spark, sf_dir))


SQL_DEDUP_EXACT = (
    "SELECT md5(text) AS content_hash, count(*) AS dup_count, "
    "min(doc_id) AS keep_doc FROM documents GROUP BY md5(text)"
)


def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(documents(spark, sf_dir))


_PERM_VALUES = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(PERMS))

SQL_MINHASH = SQL_PRELUDE + f"""
, tri AS (
  SELECT doc_id, term AS w1,
         lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
         lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
  FROM tok
),
sh AS (
  SELECT doc_id, (w1 || ' ' || w2 || ' ' || w3) AS shingle
  FROM tri WHERE w2 IS NOT NULL AND w3 IS NOT NULL
),
shx AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS x
  FROM sh
),
perms(perm_id, a, b) AS (VALUES {_PERM_VALUES})
SELECT doc_id, perm_id, min((a * x + b) % 2147483647) AS minh
FROM shx CROSS JOIN perms GROUP BY doc_id, perm_id
"""


# the final SELECT of SQL_MINHASH, extended into further CTEs by the LSH and
# jaccard oracles below (banding and verification both derive from the same
# signature pipeline, mirroring the Spark operator composition)
_SIG_FINAL = (
    "SELECT doc_id, perm_id, min((a * x + b) % 2147483647) AS minh\n"
    "FROM shx CROSS JOIN perms GROUP BY doc_id, perm_id"
)

_LSH_CTES = """, sigg AS (
  SELECT doc_id, perm_id, min((a * x + b) % 2147483647) AS minh
  FROM shx CROSS JOIN perms GROUP BY doc_id, perm_id
),
bands AS (
  SELECT doc_id, CAST(floor(perm_id / 4.0e0) AS INT) AS band,
         string_agg(perm_id || ':' || minh, ',' ORDER BY perm_id || ':' || minh) AS band_key
  FROM sigg GROUP BY doc_id, CAST(floor(perm_id / 4.0e0) AS INT)
),
ok AS (SELECT band, band_key FROM bands GROUP BY band, band_key HAVING count(*) <= 10000),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN ok USING (band, band_key)
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(documents(spark, sf_dir))


SQL_LSH_CANDIDATES = SQL_MINHASH.replace(
    _SIG_FINAL, _LSH_CTES + "\nSELECT doc_a, doc_b FROM cand"
)


def q_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed near-dup pipeline: shingle → MinHash → LSH banding →
    exact Jaccard verification of the candidate pairs (the full
    find-near-duplicates flow as one entry). Raw double ratio: pure integer
    arithmetic until a single division, so it compares bit-exact."""
    docs = documents(spark, sf_dir)
    return ngram_jaccard(docs, lsh_candidate_pairs(docs), digits=None)


SQL_NEAR_DUP_JACCARD = SQL_MINHASH.replace(
    _SIG_FINAL,
    _LSH_CTES
    + """,
shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(sb.shingle) AS inter
  FROM cand c
  JOIN shd sa ON sa.doc_id = c.doc_a
  LEFT JOIN shd sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.doc_a JOIN sizes zb ON zb.doc_id = i.doc_b""",
)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash16(documents(spark, sf_dir))


SQL_SIMHASH = SQL_PRELUDE + """
, th AS (
  SELECT doc_id, tf,
         CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % 65536 AS h
  FROM tf
),
bits AS (SELECT doc_id, tf, h, unnest(range(16)) AS b FROM th),
per_bit AS (
  SELECT doc_id, b, sum(tf * (((h >> CAST(b AS INTEGER)) % 2) * 2 - 1)) AS s
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
"""

def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination entry: a deterministic ~15% of the corpus plays the
    benchmark (re-identified with +10M ids), so every benchmark doc leaks
    exactly (plus natural dups) and the near channel surfaces the corpus's
    genuine near-duplicates of benchmark texts."""
    docs = documents(spark, sf_dir)
    bench = docs.where(
        md5_int60(F.concat(F.lit("bench:"), F.col("doc_id").cast("string"))) % 100 < 15
    ).select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    return cross_corpus_contamination(docs, bench)


# reuses _LSH_CTES for the shared sigg/bands definitions (its ok/cand CTEs
# go unused here, which DuckDB permits) — one copy of the banding SQL
SQL_CONTAMINATION = SQL_MINHASH.replace(
    _SIG_FINAL,
    _LSH_CTES
    + """,
bench AS (
  SELECT doc_id FROM documents
  WHERE CAST(concat('0x', substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 15
),
exact AS (
  SELECT d.doc_id, b.doc_id + 10000000 AS bench_id
  FROM documents d JOIN documents b ON md5(d.text) = md5(b.text)
  WHERE b.doc_id IN (SELECT doc_id FROM bench)
),
near AS (
  SELECT DISTINCT a.doc_id, b.doc_id + 10000000 AS bench_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE b.doc_id IN (SELECT doc_id FROM bench)
)
SELECT doc_id, bench_id, 'exact' AS kind FROM exact
UNION ALL
SELECT n.doc_id, n.bench_id, 'near' AS kind FROM near n
WHERE NOT EXISTS (SELECT 1 FROM exact e
                  WHERE e.doc_id = n.doc_id AND e.bench_id = n.bench_id)""",
)


ENTRIES = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_signatures": (q_minhash, SQL_MINHASH),
    "lsh_candidates": (q_lsh_candidates, SQL_LSH_CANDIDATES),
    "near_dup_jaccard": (q_near_dup_jaccard, SQL_NEAR_DUP_JACCARD),
    "contamination_check": (q_contamination, SQL_CONTAMINATION),
    "simhash": (q_simhash, SQL_SIMHASH),
}
