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
                   choices=["dist", "bmw", "local", "docpart", "impact"])
    args = p.parse_args()

    from alexandria_spark.plans.build import Index
    from alexandria_spark.plans.query import LocalIndex, search, search_bmw

    spark = SparkSession.builder.appName("alexandria-query").getOrCreate()
    idx = Index(args.index)
    t0 = time.time()
    if args.engine == "local":
        hits = LocalIndex(spark, idx).search(args.query, args.mode, args.k)
    elif args.engine == "bmw":
        hits = search_bmw(spark, idx, args.query, args.mode, args.k)
    elif args.engine == "docpart":
        from alexandria_spark.plans.docpart import DocPartitionedIndex, search_docpart

        hits = [(r.doc_id, r.score) for r in
                search_docpart(spark, DocPartitionedIndex(args.index),
                               args.query, args.mode, args.k).collect()]
    elif args.engine == "impact":
        from alexandria_spark.plans.impact import impact_or_topk

        if args.mode != "or":
            raise SystemExit("--engine impact serves --mode or queries")
        hits = impact_or_topk(spark, idx, args.query, args.k)
    else:
        hits = [(r.doc_id, r.score) for r in
                search(spark, idx, args.query, args.mode, args.k).collect()]
    print(json.dumps({
        "query": args.query, "mode": args.mode, "engine": args.engine,
        "latency_sec": round(time.time() - t0, 4),
        "hits": [{"doc_id": d, "score": s} for d, s in hits],
    }))


if __name__ == "__main__":
    main()
