#!/usr/bin/env python
"""spark-submit entry point: index maintenance operations.

    spark-submit --py-files alexandria_spark.zip scripts/maintain_submit.py \
        --index /path/idx --op refresh-partial|refresh-full|compact|expire \
        [--keep-last 3]

Operations (the reference's background merger + admin loop analogues,
merger.cpp:84-117, console.cpp:279-319):
  refresh-partial  re-block only the shards streaming appends touched
  refresh-full     re-block everything with fresh corpus stats
  compact          physically drop tombstoned docs, clear tombstones
  expire           prune old snapshots + GC unreferenced files/leftovers
  derive-impact    (re)derive the impact-ordered acceleration table
  derive-docpart   (re)derive the doc-partitioned acceleration table
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--op", required=True,
                   choices=["refresh-partial", "refresh-full", "compact",
                            "expire", "derive-impact", "derive-docpart"])
    p.add_argument("--keep-last", type=int, default=3)
    p.add_argument("--doc-store", default=None,
                   help="bucketed doc-store table paired with this index: "
                        "compact also GCs tombstoned payloads from it")
    p.add_argument("--doc-store-buckets", type=int, default=None,
                   help="override the store's recorded bucket count during "
                        "the GC rewrite (default: preserve the spec from "
                        "_ax_store_meta.json)")
    p.add_argument("--leftover-min-age-sec", type=float, default=6 * 3600.0,
                   help="expire deletes _rebuilding staging dirs only when "
                        "idle this long (live-writer safety); _old swap "
                        "remnants are adjudicated immediately")
    args = p.parse_args()

    from alexandria_spark.plans.build import Index

    spark = SparkSession.builder.appName("alexandria-maintain").getOrCreate()
    idx = Index(args.index)
    cfg = idx.config()
    t0 = time.time()
    detail: dict = {}
    if args.op in ("refresh-partial", "refresh-full"):
        from alexandria_spark.streaming.incremental import pending_shards, refresh_index

        detail["pending_shards"] = pending_shards(args.index)
        refresh_index(spark, args.index, cfg,
                      mode="partial" if args.op == "refresh-partial" else "full")
    elif args.op == "compact":
        from alexandria_spark.plans.delete import compact

        compact(spark, idx, cfg, doc_store=args.doc_store,
                doc_store_buckets=args.doc_store_buckets)
    elif args.op == "derive-impact":
        from alexandria_spark.plans.impact import build_impact_postings

        detail["table"] = build_impact_postings(spark, idx, cfg)
    elif args.op == "derive-docpart":
        from alexandria_spark.plans.docpart import rebuild_docpart_from_postings

        detail["table"] = rebuild_docpart_from_postings(
            spark, args.index, cfg).postings_path
    else:
        from alexandria_spark.plans.snapshots import expire_snapshots

        detail = expire_snapshots(args.index, keep_last=args.keep_last,
                                  leftover_min_age_sec=args.leftover_min_age_sec)
    print(json.dumps({
        "index": args.index, "op": args.op,
        "wall_sec": round(time.time() - t0, 2), **detail,
    }))


if __name__ == "__main__":
    main()
