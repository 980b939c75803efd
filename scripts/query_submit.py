#!/usr/bin/env python
"""spark-submit entry point: top-k BM25 queries against a built index.

    spark-submit --py-files alexandria_spark.zip scripts/query_submit.py \
        --index /path/idx --query "table hash join" [--mode and|or|phrase] \
        [--k 10] [--engine dist|bmw|local|docpart|impact]

``docpart`` serves a doc-partitioned layout built by build_docpart_index
(per-bucket WAND on executors); ``impact`` serves OR/single-term queries
from the impact-ordered table built by build_impact_postings.
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--mode", default="and", choices=["and", "or", "phrase"])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--engine", default="dist",
                   choices=["auto", "dist", "bmw", "local", "docpart", "impact"])
    p.add_argument("--docs", default=None,
                   help="parquet path of the (doc_id, text) corpus; enables "
                        "exact phrases LONGER than the index's n_grams via "
                        "the two-stage candidate+verify path (dist engine)")
    args = p.parse_args()

    from alexandria_spark.plans.build import Index
    from alexandria_spark.plans.query import (
        LocalIndex,
        choose_engine,
        search,
        search_bmw,
    )

    spark = SparkSession.builder.appName("alexandria-query").getOrCreate()
    idx = Index(args.index)
    engine = args.engine
    if engine == "auto":
        # documented rules (choose_engine): multi-term -> docpart,
        # single-term -> impact, phrase -> bmw over the term layout. A
        # missing layout surfaces that engine's actionable FileNotFoundError.
        engine = choose_engine(args.query, args.mode, idx.config())
    t0 = time.time()
    if engine == "local":
        hits = LocalIndex(spark, idx).search(args.query, args.mode, args.k)
    elif engine == "bmw":
        hits = search_bmw(spark, idx, args.query, args.mode, args.k)
    elif engine == "docpart":
        from alexandria_spark.plans.docpart import DocPartitionedIndex, search_docpart

        hits = [(r.doc_id, r.score) for r in
                search_docpart(spark, DocPartitionedIndex(args.index),
                               args.query, args.mode, args.k).collect()]
    elif engine == "impact":
        from alexandria_spark.plans.impact import impact_or_topk, impact_single_topk

        if args.mode == "phrase":
            raise SystemExit("--engine impact serves or/single-term queries; "
                             "use --engine auto|bmw|dist for phrase mode")
        if args.mode == "or":
            hits = impact_or_topk(spark, idx, args.query, args.k)
        else:
            # auto routes single-term AND queries here (a 1-term AND is a
            # 1-term OR); an explicit multi-term AND gets the actionable
            # rejection, not impact_single_topk's raw ValueError traceback
            try:
                hits = impact_single_topk(spark, idx, args.query, args.k)
            except ValueError as exc:
                raise SystemExit(
                    f"--engine impact serves or/single-term queries "
                    f"({exc}); use --engine auto|docpart|dist for "
                    f"multi-term AND"
                ) from exc
    else:
        docs = spark.read.parquet(args.docs) if args.docs else None
        hits = [(r.doc_id, r.score) for r in
                search(spark, idx, args.query, args.mode, args.k,
                       docs=docs).collect()]
    print(json.dumps({
        "query": args.query, "mode": args.mode, "engine": engine,
        "engine_requested": args.engine,
        "latency_sec": round(time.time() - t0, 4),
        "hits": [{"doc_id": d, "score": s} for d, s in hits],
    }))


if __name__ == "__main__":
    main()
