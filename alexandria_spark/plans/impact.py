"""Impact-ordered posting layout: score-quantized early termination.

The doc-sorted layout (plans/blocks.py) is what conjunctive WAND wants. For
top-k where a term's best postings should surface first (single-term and
disjunctive serving), search engines keep an *impact-ordered* copy: within
each (term, salt) group, postings are assigned to blocks by DESCENDING
score — block 0 holds the term's strongest postings — while docs are
re-sorted ascending INSIDE each block, so the existing delta+varint codec
and block metadata work unchanged. A reader walks blocks in impact order
and stops as soon as the kth collected score is >= the next block's
max_score: exact top-k after decoding ~k postings instead of the whole
list.

The reference's analogue is its section-ordered early exit
(search_engine.h:298-352) — this layout strengthens the same idea to
per-block score bounds, and complements (not replaces) the doc-sorted
table: `postings` stays the source of truth; `postings_impact` is a
derived, snapshot-committed acceleration table (like any secondary index).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.blocks import build_blocks, decode_blocks
from alexandria_spark.plans.build import BLOCK_SCHEMA, Index
from alexandria_spark.plans.query import _query_term_ids, _shard_of


def _impact_arrange(pdf: pd.DataFrame, block_size: int, keep_tf: bool,
                    num_shards: int) -> pd.DataFrame:
    """One partition's postings → impact-ordered encoded blocks."""
    if len(pdf) == 0:
        return build_blocks(pdf, block_size, keep_tf).assign(
            shard=np.empty(0, np.int32)
        )
    term = pdf["term_id"].to_numpy(np.int64)
    salt = pdf["salt"].to_numpy(np.int32)
    docs_u = pdf["doc_id"].to_numpy(np.int64).view(np.uint64)
    score = pdf["score"].to_numpy(np.float32)
    # pass 1: (term, salt, score desc, doc asc) — impact rank within group
    o1 = np.lexsort((docs_u, -score.astype(np.float64), salt, term))
    term, salt, docs_u, score = term[o1], salt[o1], docs_u[o1], score[o1]
    tf = pdf["tf"].to_numpy(np.int64)[o1] if "tf" in pdf else None
    new_group = np.empty(len(term), dtype=bool)
    new_group[0] = True
    new_group[1:] = (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
    gstarts = np.nonzero(new_group)[0]
    gno = np.cumsum(new_group) - 1
    pos = np.arange(len(term), dtype=np.int64) - gstarts[gno]
    chunk = pos // block_size  # block 0 = strongest postings
    # pass 2: docs ascending INSIDE each impact block (codec stays valid)
    o2 = np.lexsort((docs_u, chunk, salt, term))
    arranged = pd.DataFrame(
        {
            "term_id": term[o2],
            "salt": salt[o2],
            "doc_id": docs_u[o2].view(np.int64),
            "score": score[o2],
        }
    )
    if tf is not None:
        arranged["tf"] = tf[o2]
    out = build_blocks(arranged, block_size, keep_tf)
    tid = out["term_id"].to_numpy(np.int64)
    out["shard"] = (tid.view(np.uint64) % np.uint64(num_shards)).astype(np.int32)
    return out


def build_impact_postings(spark: SparkSession, index: Index,
                          cfg: EngineConfig | None = None) -> str:
    """Derive the impact-ordered table from the index's doc-sorted postings
    (decode → per-(term,salt) impact re-block → parquet by shard). One
    shuffle (re-co-locating groups), same block codec."""
    cfg = cfg or index.config()
    blocks = index.postings(spark)

    def decode_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ns = pdf["n"].to_numpy(np.int64)
            dec = decode_blocks(pdf, want_tf=True)
            dec["salt"] = np.repeat(pdf["salt"].to_numpy(np.int32), ns)
            yield dec[["term_id", "salt", "doc_id", "score", "tf"]]

    import pyspark.sql.types as T

    dec_schema = T.StructType([
        T.StructField("term_id", T.LongType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
        T.StructField("tf", T.LongType()),
    ])
    postings = blocks.mapInPandas(decode_fn, dec_schema)
    parts = postings.repartition(
        cfg.shuffle_partitions,
        F.pmod(F.col("term_id"), F.lit(cfg.num_shards)), F.col("salt"),
    )
    block_size, keep_tf, num_shards = cfg.block_size, cfg.keep_tf, cfg.num_shards

    def arrange_fn(batches):
        buf = [pdf for pdf in batches if len(pdf)]
        if not buf:
            return
        yield _impact_arrange(
            pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0],
            block_size, keep_tf, num_shards,
        )

    out_path = os.path.join(index.path, "postings_impact")
    (
        parts.mapInPandas(arrange_fn, BLOCK_SCHEMA)
        .write.partitionBy("shard").mode("overwrite").parquet(out_path)
    )
    from alexandria_spark.plans.snapshots import commit_snapshot

    commit_snapshot(index.path, "impact_build", {})
    return out_path


def impact_single_topk(spark: SparkSession, index: Index, query: str,
                       k: int = 10, cfg: EngineConfig | None = None,
                       _stats: dict | None = None) -> list[tuple[int, float]]:
    """Exact single-term top-k over the impact table: decode blocks in
    impact order, stop when the kth collected score >= the next block's
    max_score (ties included via >=... strictly: stop when kth > next max,
    or kth == next max and doc-id tie-break cannot improve — we keep
    decoding on equality, which stays exact and costs at most the tied
    blocks). ``_stats['blocks_read']`` reports early-termination depth."""
    cfg = cfg or index.config()
    term_ids = _query_term_ids(query, "or", cfg)
    if len(term_ids) != 1:
        raise ValueError("impact_single_topk serves single-term queries")
    tid = term_ids[0]
    shard = _shard_of(tid, cfg.num_shards)
    path = os.path.join(index.path, "postings_impact")
    pdf = (
        spark.read.parquet(path)
        .where((F.col("shard") == shard) & (F.col("term_id") == tid))
        .toPandas()
    )
    if len(pdf) == 0:
        return []
    # merged impact order across salts: descending block max
    pdf = pdf.sort_values("max_score", ascending=False).reset_index(drop=True)
    docs: list[np.ndarray] = []
    scores: list[np.ndarray] = []
    read = 0
    for i in range(len(pdf)):
        kth = None
        if sum(len(d) for d in docs) >= k:
            allsc = np.concatenate(scores)
            kth = np.partition(allsc, len(allsc) - k)[len(allsc) - k]
        if kth is not None and kth > pdf["max_score"].iloc[i]:
            break  # no remaining block can contribute a better posting
        dec = decode_blocks(pdf.iloc[i : i + 1])
        docs.append(dec["doc_id"].to_numpy())
        scores.append(dec["score"].to_numpy(np.float64))
        read += 1
    if _stats is not None:
        _stats["blocks_read"] = read
        _stats["blocks_total"] = int(len(pdf))
    d = np.concatenate(docs)
    s = np.concatenate(scores)
    du = d.view(np.uint64)
    top = np.lexsort((du, -s))[:k]
    return [(int(d[i]), float(s[i])) for i in top]
