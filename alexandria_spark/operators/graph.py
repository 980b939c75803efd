"""Graph auxiliaries: harmonic centrality (bounded-depth BFS).

The reference computes per-vertex harmonic centrality c(v) = Σ_u 1/d(u→v)
over BFS levels up to a depth cap with a thread pool (reference
src/algorithm/algorithm.cpp:86-235), and an HLL-approximate variant
(HyperBall, src/algorithm/hyper_ball.h:38-105). The Spark-native exact
version is an iterative frontier expansion: each round joins the frontier
with the edge list, anti-joins already-known (source, vertex) pairs (BFS =
min distance), and accumulates 1/d. Depth is bounded exactly like the
reference's level cap. The HyperBall analogue at web scale replaces the
exact pair set with per-vertex approx_count_distinct per radius.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from alexandria_spark.sources.tables import load_table


def harmonic_centrality(edges: DataFrame, depth: int = 3) -> DataFrame:
    """(vertex, harmonic) — harmonic centrality over directed edges
    (src, dst), distances capped at ``depth``; vertices with no inbound
    paths are omitted (contribution 0)."""
    edges = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    known = edges.select(
        F.col("src").alias("source"), F.col("dst").alias("v"), F.lit(1).alias("d")
    ).cache()
    frontier = known
    for d in range(2, depth + 1):
        nxt = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .select("source", F.col("dst").alias("v"), F.lit(d).alias("d"))
            .where(F.col("source") != F.col("v"))
            .distinct()
        )
        nxt = nxt.join(known.select("source", "v"), ["source", "v"], "left_anti").cache()
        known = known.unionByName(nxt).cache()
        frontier = nxt
    return known.groupBy("v").agg(
        F.sum(1.0 / F.col("d").cast("double")).alias("harmonic")
    ).select(F.col("v").alias("vertex"), "harmonic")


# ------------------------------------------------------------ suite entry

def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic small graph derived from lineitem (50 vertices)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % 50).alias("src"), (F.col("l_partkey") % 50).alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()


def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return harmonic_centrality(_edges(spark, sf_dir), depth=3).select(
        "vertex", F.round(F.col("harmonic"), 4).alias("harmonic")
    )


SQL_HARMONIC = """
WITH e AS (
  SELECT DISTINCT l_orderkey % 50 AS src, l_partkey % 50 AS dst
  FROM lineitem WHERE l_orderkey % 50 != l_partkey % 50
),
d1 AS (SELECT src AS source, dst AS v FROM e),
d2 AS (
  SELECT DISTINCT d1.source, e.dst AS v
  FROM d1 JOIN e ON d1.v = e.src
  WHERE d1.source != e.dst
    AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.source = d1.source AND p.v = e.dst)
),
d3 AS (
  SELECT DISTINCT d2.source, e.dst AS v
  FROM d2 JOIN e ON d2.v = e.src
  WHERE d2.source != e.dst
    AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.source = d2.source AND p.v = e.dst)
    AND NOT EXISTS (SELECT 1 FROM d2 p WHERE p.source = d2.source AND p.v = e.dst)
),
allp AS (
  SELECT source, v, 1 AS d FROM d1
  UNION ALL SELECT source, v, 2 FROM d2
  UNION ALL SELECT source, v, 3 FROM d3
)
SELECT v AS vertex, round(sum(1.0e0 / CAST(d AS DOUBLE)), 4) AS harmonic
FROM allp GROUP BY v
"""

ENTRIES = {
    "harmonic_centrality": (q_harmonic, SQL_HARMONIC),
}
