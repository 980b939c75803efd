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
    ).localCheckpoint()
    frontier = known
    for d in range(2, depth + 1):
        nxt = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .select("source", F.col("dst").alias("v"), F.lit(d).alias("d"))
            .where(F.col("source") != F.col("v"))
            .distinct()
        )
        # localCheckpoint (not cache): truncates the per-iteration lineage so
        # the plan stays O(1) deep across rounds, and frees prior rounds'
        # blocks instead of pinning every intermediate in executor memory
        nxt = nxt.join(
            known.select("source", "v"), ["source", "v"], "left_anti"
        ).localCheckpoint()
        if nxt.limit(1).count() == 0:
            break
        known = known.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return known.groupBy("v").agg(
        F.sum(1.0 / F.col("d").cast("double")).alias("harmonic")
    ).select(F.col("v").alias("vertex"), "harmonic")


def hyper_ball(edges: DataFrame, max_iter: int = 32, lg_k: int = 12) -> DataFrame:
    """(vertex, harmonic) — HyperBall approximate harmonic centrality
    (reference src/algorithm/hyper_ball.h:38-105).

    Per vertex v the reference keeps an HLL counter c[v] of the vertices
    that reach v within t hops; each round sets a[v] = c[v] ∪ (∪_{w→v} c[w])
    and adds (1/(t+1)) · (|a[v]| − |c[v]|) to harmonic[v], stopping when no
    counter grows. Here the counter column is a Datasketches HLL sketch and
    the per-round merge is one groupBy with hll_union_agg — state per vertex
    is O(2^lg_k) bytes instead of the exact BFS's O(reach) pair set, which
    is what survives a real web graph at 100×.
    """
    edges = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    verts = edges.select(F.col("src").alias("v")).unionByName(
        edges.select(F.col("dst").alias("v"))
    ).distinct()
    # c[v] starts as the sketch of {v}
    c = verts.groupBy("v").agg(F.expr(f"hll_sketch_agg(v, {lg_k})").alias("sk"))
    state = c.withColumn("cnt", F.expr("hll_sketch_estimate(sk)")).withColumn(
        "harmonic", F.lit(0.0)
    ).localCheckpoint()
    for t in range(max_iter):
        contrib = state.join(edges, state["v"] == edges["src"]).select(
            F.col("dst").alias("v"), "sk"
        )
        merged = (
            state.select("v", "sk").unionByName(contrib)
            .groupBy("v").agg(F.expr("hll_union_agg(sk)").alias("sk2"))
            .withColumn("cnt2", F.expr("hll_sketch_estimate(sk2)"))
        )
        nxt = (
            state.select("v", "cnt", "harmonic").join(merged, "v")
            .select(
                "v", F.col("sk2").alias("sk"), F.col("cnt2").alias("cnt"),
                (F.col("harmonic")
                 + (F.col("cnt2") - F.col("cnt")).cast("double") / (t + 1.0)
                 ).alias("harmonic"),
            )
            .localCheckpoint()  # truncate the iterative lineage
        )
        changed = nxt.join(
            state.select("v", F.col("cnt").alias("prev")), "v"
        ).where(F.col("cnt") != F.col("prev")).limit(1).count()
        state = nxt
        if changed == 0:
            break
    # cnt > 1 ⟺ some other vertex reaches v ⟺ harmonic > 0
    return state.where(F.col("cnt") > 1).select(
        F.col("v").alias("vertex"), "harmonic",
        F.col("cnt").cast("long").alias("reach"),
    )


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

def q_hyper_ball_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall run to fixpoint; the |ball| estimate is exact at this graph
    size (the HLL sketch stays in sparse mode), so the recursive-SQL exact
    reachability count is a true value oracle for the sketch pipeline."""
    return hyper_ball(_edges(spark, sf_dir)).select("vertex", "reach")


SQL_HYPERBALL_REACH = """
WITH RECURSIVE e AS (
  SELECT DISTINCT l_orderkey % 50 AS src, l_partkey % 50 AS dst
  FROM lineitem WHERE l_orderkey % 50 != l_partkey % 50
),
r AS (
  SELECT src AS source, dst AS v FROM e
  UNION
  SELECT r.source, e.dst AS v FROM r JOIN e ON r.v = e.src
  WHERE r.source != e.dst
)
SELECT v AS vertex, (count(DISTINCT source) + 1)::BIGINT AS reach
FROM r WHERE source != v GROUP BY v
"""

def q_graph_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE driver-gate row for both graph operators (folds the former
    harmonic_centrality / hyperball_reach entries): HyperBall's fixpoint
    reach per vertex joined with the depth-3 exact harmonic centrality
    (vertices reachable only beyond depth 3 carry harmonic3 = 0)."""
    h = q_harmonic(spark, sf_dir).withColumnRenamed("harmonic", "harmonic3")
    r = q_hyper_ball_reach(spark, sf_dir)
    return r.join(h, "vertex", "left").select(
        "vertex", F.coalesce(F.col("harmonic3"), F.lit(0.0)).alias("harmonic3"),
        "reach",
    )


SQL_GRAPH_CENTRALITY = (
    f"SELECT r.vertex, coalesce(h.harmonic, 0.0e0) AS harmonic3, r.reach"
    f" FROM ({SQL_HYPERBALL_REACH}) r LEFT JOIN ({SQL_HARMONIC}) h USING (vertex)"
)

ENTRIES = {
    "graph_centrality": (q_graph_centrality, SQL_GRAPH_CENTRALITY),
}
