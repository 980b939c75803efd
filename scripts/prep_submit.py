#!/usr/bin/env python
"""spark-submit entry point: the training-data preparation pipeline.

    spark-submit --py-files alexandria_spark.zip scripts/prep_submit.py \
        --input /path/documents.parquet --output /path/prep \
        [--mix en=30,zh=80,de=55] [--chunk-tokens 64] [--stride 48] \
        [--seq-tokens 256] [--shards 32] [--jaccard-drop 0.9]

Stages (each written as parquet under --output, all distributed-only —
no driver-side loops):
  1. exact dedup        keep one doc per content hash
  2. near-dup filter    MinHash -> LSH banding -> exact Jaccard; drop the
                        higher doc_id of any pair above --jaccard-drop
  3. stratified sample  per-group md5-threshold quota mix (--mix; omit to
                        keep every group at 100%)
  4. chunk + pack       fixed token windows packed into --seq-tokens
                        training sequences (per-shard window cumsum)

Prints one JSON line with per-stage row counts and seconds.
"""

import argparse
import json
import time

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mix", default=None,
                   help="lang=pct[,lang=pct...]; omit to keep all groups")
    p.add_argument("--chunk-tokens", type=int, default=64)
    p.add_argument("--stride", type=int, default=48)
    p.add_argument("--seq-tokens", type=int, default=256)
    p.add_argument("--shards", type=int, default=32)
    p.add_argument("--jaccard-drop", type=float, default=0.9)
    args = p.parse_args()

    from alexandria_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
        stratified_sample,
    )
    from alexandria_spark.operators.dedup import (
        exact_dups,
        lsh_candidate_pairs,
        ngram_jaccard,
    )

    spark = SparkSession.builder.appName("alexandria-prep").getOrCreate()
    t0 = time.time()
    out: dict = {"stages": {}}

    def stage(name, df, path):
        t = time.time()
        df.write.mode("overwrite").parquet(path)
        written = spark.read.parquet(path)
        out["stages"][name] = {"rows": written.count(),
                               "sec": round(time.time() - t, 2)}
        return written

    docs = spark.read.parquet(args.input)
    out["input_rows"] = docs.count()

    # 1. exact dedup: semi-join docs to the per-hash keeper
    keep = exact_dups(docs).select(F.col("keep_doc").alias("doc_id"))
    docs = stage("exact_dedup", docs.join(keep, "doc_id", "left_semi"),
                 args.output + "/dedup_exact")

    # 2. near-dup drop: loser = higher doc_id of each confirmed pair.
    # Shingles are recomputed per stage on purpose: caching the shingle
    # relation measured SLOWER here (materializing the string rows costs
    # more than the window recompute) and would not fit memory at scale —
    # pass _shingles= to the dedup operators only when a cheap cached
    # relation genuinely exists.
    pairs = ngram_jaccard(docs, lsh_candidate_pairs(docs), digits=None)
    losers = (
        pairs.where(F.col("jaccard") >= args.jaccard_drop)
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    docs = stage("near_dup_drop", docs.join(losers, "doc_id", "left_anti"),
                 args.output + "/dedup_near")

    # 3. stratified mixture
    if args.mix:
        rates = {k: int(v) for k, v in
                 (kv.split("=") for kv in args.mix.split(","))}
        kept = stratified_sample(docs, rates)
        docs = stage("stratified_sample",
                     docs.join(kept.select("doc_id"), "doc_id", "left_semi"),
                     args.output + "/sampled")

    # 4. chunk + pack
    chunks = stage(
        "chunk",
        chunk_documents(docs, chunk_tokens=args.chunk_tokens, stride=args.stride),
        args.output + "/chunks",
    )
    stage("pack", pack_sequences(chunks, seq_tokens=args.seq_tokens,
                                 n_shards=args.shards),
          args.output + "/sequences")

    out["total_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
