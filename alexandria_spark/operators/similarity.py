"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors with sign-random-projection LSH so the expensive pairwise work is a
co-partitioned bucket join instead of a cross join. Dot products run
JVM-side via zip_with/aggregate (no Python in the loop).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from alexandria_spark.sources.tables import load_table

DIM = 64
N_PLANES = 4


def _dot(a, b):
    """Sequential-fold dot product of two array<double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(vectors: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k against the vector with vec_id=query.

    One partition-parallel scan + TakeOrderedAndProject; ranking uses the
    rounded similarity with vec_id tiebreak (deterministic boundary).
    """
    q = vectors.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    scored = vectors.where(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q))
    cos = _dot(F.col("embedding"), F.col("qe")) / (
        _norm(F.col("embedding")) * _norm(F.col("qe"))
    )
    return (
        scored.select("vec_id", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_buckets(vectors: DataFrame, n_planes: int = N_PLANES,
                plane_offset: int = 0) -> DataFrame:
    """(vec_id, bucket) — sign-random-projection bucket per vector.

    Plane weights are a fixed deterministic integer lattice
    p(j, d) = ((31*d + 17*j) % 7) - 3, reproducible in plain SQL. At scale,
    ANN = self-join on bucket (co-partitioned) instead of a cross join.
    ``plane_offset`` selects a disjoint plane set — table t of a multi-table
    LSH uses offset t*n_planes, giving independent bucketings whose OR
    recovers the recall a single table loses."""
    terms = []
    for j0 in range(n_planes):
        j = j0 + plane_offset
        coeffs = [((31 * d + 17 * j) % 7) - 3 for d in range(DIM)]
        dot_j = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array([F.lit(float(c)) for c in coeffs]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        terms.append(F.when(dot_j > 0, F.lit(1 << j0)).otherwise(F.lit(0)))
    bucket = terms[0]
    for t in terms[1:]:
        bucket = bucket + t
    return vectors.select("vec_id", bucket.cast("long").alias("bucket"))


def ann_lsh_topk(vectors: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's LSH bucket."""
    b = lsh_buckets(vectors)
    qb = b.where(F.col("vec_id") == query_vec_id).select(F.col("bucket").alias("qbucket"))
    cands = vectors.join(b, "vec_id").crossJoin(F.broadcast(qb)).where(
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_vec_id)
    )
    q = vectors.where(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("qe"))
    cos = _dot(F.col("embedding"), F.col("qe")) / (_norm(F.col("embedding")) * _norm(F.col("qe")))
    return (
        cands.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


N_IVF_CENTROIDS = 8


def kmeans_centroids(vectors: DataFrame, k: int = N_IVF_CENTROIDS,
                     n_iter: int = 3) -> DataFrame:
    """(centroid_id, ce) — Lloyd-refined IVF centroids (cosine assignment,
    elementwise-mean update), seeded deterministically with the first k
    vectors by id.

    Each iteration is two small jobs: a broadcast-argmax assignment and a
    posexplode + groupBy((centroid, pos)) mean whose output is exactly
    k × dim rows — the centroid table stays driver-sized no matter the
    collection size. At 100 TB you train on a sample (the assignment job is
    the only full-data pass) and the loop shape is unchanged.
    """
    spark = vectors.sparkSession
    cents = vectors.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    for _ in range(n_iter):
        j = vectors.crossJoin(F.broadcast(cents))
        cos = _dot(F.col("embedding"), F.col("ce")) / (
            _norm(F.col("embedding")) * _norm(F.col("ce"))
        )
        # argmax via max_by (max cos, min centroid on ties): a partial-
        # aggregating groupBy instead of a Window — the k-way candidate rows
        # reduce MAP-SIDE to one row per vector before the shuffle, where
        # row_number().over(partitionBy(vec_id)) shuffled all k rows per
        # vector every Lloyd iteration
        assign = (
            j.select("vec_id", "centroid_id", "embedding", cos.alias("cos"))
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "centroid_id",
                    F.struct(F.col("cos").alias("c"),
                             (-F.col("centroid_id")).alias("nc")),
                ).alias("centroid_id"),
                F.first("embedding").alias("embedding"),
            )
        )
        means = (
            assign.select("centroid_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("ce"),
            )
        )
        rows = means.collect()  # k rows — driver-sized by construction
        cents = spark.createDataFrame(
            [(int(r["centroid_id"]), list(r["ce"])) for r in rows],
            "centroid_id long, ce array<float>",
        )
    return cents


def ivf_assign(vectors: DataFrame, n_centroids: int = N_IVF_CENTROIDS,
               centroids: DataFrame | None = None) -> DataFrame:
    """(vec_id, centroid_id) — IVF coarse quantization: assign each vector to
    its max-cosine centroid. Default centroids are the deterministic seed
    set (first K vectors by id — what the SQL oracle restates); pass
    ``centroids`` from :func:`kmeans_centroids` for the trained quantizer.
    At scale the assignment is a broadcast join + argmax, and ANN probes
    only the query's cell(s) instead of the full collection."""
    cents = centroids if centroids is not None else vectors.where(
        F.col("vec_id") < n_centroids
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce"))
    j = vectors.crossJoin(F.broadcast(cents))
    cos = _dot(F.col("embedding"), F.col("ce")) / (
        _norm(F.col("embedding")) * _norm(F.col("ce"))
    )
    # max_by argmax (max cos, min centroid on ties): partial-aggregates
    # map-side — no Window, no per-vector k-row shuffle
    return (
        j.select("vec_id", "centroid_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "centroid_id",
                F.struct(F.col("cos").alias("c"),
                         (-F.col("centroid_id")).alias("nc")),
            ).alias("centroid_id")
        )
    )


def ann_ivf_topk(vectors: DataFrame, query_vec_id: int = 0, k: int = 10,
                 n_probes: int = 1, centroids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: exact cosine within the query's ``n_probes``
    closest IVF cells (probing more cells trades latency for recall)."""
    cents = centroids if centroids is not None else vectors.where(
        F.col("vec_id") < N_IVF_CENTROIDS
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce"))
    assign = ivf_assign(vectors, centroids=cents)
    qe_df = vectors.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe0")
    )
    qcos = _dot(F.col("ce"), F.col("qe0")) / (_norm(F.col("ce")) * _norm(F.col("qe0")))
    qcell = (
        cents.crossJoin(F.broadcast(qe_df))
        .select(F.col("centroid_id").alias("qc"), qcos.alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("qc"))
        .limit(n_probes)
        .select("qc")
    )
    cands = vectors.join(assign, "vec_id").join(
        F.broadcast(qcell), F.col("centroid_id") == F.col("qc")
    ).where(F.col("vec_id") != query_vec_id)
    q = vectors.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    cos = _dot(F.col("embedding"), F.col("qe")) / (
        _norm(F.col("embedding")) * _norm(F.col("qe"))
    )
    return (
        cands.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


# near-dup LSH geometry: sign-plane collision probability for angle θ is
# p = 1 - θ/π, so a (k planes, L tables) OR finds a pair with probability
# 1 - (1 - p^k)^L. k=3/L=8 puts the knee near cos ≈ 0.3 (p ≈ 0.57 →
# recall ≈ 0.8) — matched to the operator's threshold regime; raise k for
# tighter thresholds.
N_NEARDUP_PLANES = 3
N_NEARDUP_TABLES = 8


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float = 0.99,
                             group_col: str | None = None,
                             n_planes: int = N_NEARDUP_PLANES,
                             n_tables: int = N_NEARDUP_TABLES) -> DataFrame:
    """(vec_a, vec_b, cos_sim) — embedding-cosine near-duplicate pairs.

    Default candidate generation is multi-table sign-LSH (the at-scale
    path): ``n_tables`` independent bucketings (disjoint plane sets), a
    co-partitioned self-join per table, pairs OR-ed across tables and
    deduped — single-table sign-LSH misses ~(1-p^k) of true pairs, the OR
    recovers recall 1-(1-p^k)^L exactly like MinHash banding. The pairwise
    cosine then runs only on the candidate pairs; the full collection is
    never cross-joined.

    ``group_col`` overrides the candidate key with an exact partitioning
    column (e.g. a curated label) — one self-join, no LSH."""
    if group_col is not None:
        vs = vectors.select(
            F.col("vec_id"), F.col("embedding"), F.col(group_col).alias("g")
        )
        a = vs.select(F.col("vec_id").alias("vec_a"), "g")
        b = vs.select(F.col("vec_id").alias("vec_b"), "g")
        cand = a.join(b, "g").where(F.col("vec_a") < F.col("vec_b")) \
            .select("vec_a", "vec_b")
    else:
        cand = None
        for t in range(n_tables):
            bk = lsh_buckets(vectors, n_planes, plane_offset=t * n_planes)
            a = bk.select(F.col("vec_id").alias("vec_a"), "bucket")
            b = bk.select(F.col("vec_id").alias("vec_b"), "bucket")
            p = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b")) \
                .select("vec_a", "vec_b")
            cand = p if cand is None else cand.unionByName(p)
        cand = cand.distinct()
    ea = vectors.select(F.col("vec_id").alias("vec_a"),
                        F.col("embedding").alias("ea"))
    eb = vectors.select(F.col("vec_id").alias("vec_b"),
                        F.col("embedding").alias("eb"))
    j = cand.join(ea, "vec_a").join(eb, "vec_b")
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        j.select("vec_a", "vec_b", F.round(cos, 4).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------------------------ suite entries

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), 0, 10)


def _sql_dot(a: str, b: str) -> str:
    # sequential fold exactly like F.aggregate: ((0 + a1*b1) + a2*b2) + ...
    return (
        f"list_aggregate(list_transform(range(1, {DIM + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


SQL_COSINE_TOPK = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round({_sql_dot('e.embedding', 'q.qe')}
             / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
                * sqrt({_sql_dot('q.qe', 'q.qe')})), 4) AS cos_sim
FROM embeddings e CROSS JOIN q
WHERE vec_id != 0
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_buckets(load_table(spark, sf_dir, "embeddings"))


def _sql_plane(j: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {DIM + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) "
        f"* CAST((((31 * (i - 1) + 17 * {j}) % 7) - 3) AS DOUBLE)), 'sum')"
    )


SQL_LSH_BUCKETS = "SELECT vec_id, (" + " + ".join(
    f"(CASE WHEN {_sql_plane(j)} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_PLANES)
) + ")::BIGINT AS bucket FROM embeddings"

def q_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # threshold 0.3: same-bucket cosines in the synthetic embeddings top out
    # ~0.45, so 0.3 yields a real (non-empty) pair set at sf0.001 AND sf0.01
    # — an entry that can actually fail. (0.9 returned 0 rows = vacuous.)
    # Candidates come from the DEFAULT multi-table LSH path, so the entry
    # hard-gates the at-scale bucketing end-to-end.
    return embedding_near_dup_pairs(load_table(spark, sf_dir, "embeddings"), 0.3)


def _sql_bucket_table(t: int) -> str:
    return "SELECT vec_id, (" + " + ".join(
        f"(CASE WHEN {_sql_plane(t * N_NEARDUP_PLANES + j0)} > 0 "
        f"THEN {1 << j0} ELSE 0 END)"
        for j0 in range(N_NEARDUP_PLANES)
    ) + ")::BIGINT AS bucket FROM embeddings"


_SQL_COS_AB = (
    f"round({_sql_dot('a.embedding', 'b.embedding')}"
    f" / (sqrt({_sql_dot('a.embedding', 'a.embedding')})"
    f" * sqrt({_sql_dot('b.embedding', 'b.embedding')})), 4)"
)

SQL_NEAR_DUPS = (
    "WITH "
    + ", ".join(f"b{t} AS ({_sql_bucket_table(t)})"
                for t in range(N_NEARDUP_TABLES))
    + ", cand AS ("
    + " UNION ".join(
        f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM b{t} a "
        f"JOIN b{t} b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
        for t in range(N_NEARDUP_TABLES))
    + ") "
    f"SELECT c.vec_a, c.vec_b, {_SQL_COS_AB} AS cos_sim "
    f"FROM cand c JOIN embeddings a ON a.vec_id = c.vec_a "
    f"JOIN embeddings b ON b.vec_id = c.vec_b "
    f"WHERE {_SQL_COS_AB} >= 0.3e0"
)

def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_assign(load_table(spark, sf_dir, "embeddings"))


SQL_IVF_ASSIGN = f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS ce
               FROM embeddings WHERE vec_id < {N_IVF_CENTROIDS}),
j AS (
  SELECT e.vec_id, c.centroid_id,
         {_sql_dot('e.embedding', 'c.ce')}
           / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
              * sqrt({_sql_dot('c.ce', 'c.ce')})) AS cos
  FROM embeddings e CROSS JOIN cents c
),
r AS (SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, centroid_id ASC) AS rn
      FROM j)
SELECT vec_id, centroid_id FROM r WHERE rn = 1
"""

ENTRIES = {
    "embedding_cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "embedding_lsh_buckets": (q_lsh_buckets, SQL_LSH_BUCKETS),
    "embedding_near_dup_pairs": (q_near_dups, SQL_NEAR_DUPS),
    "embedding_ivf_assign": (q_ivf_assign, SQL_IVF_ASSIGN),
}
