#!/usr/bin/env python
"""spark-submit entry point: build the inverted index.

    spark-submit --master <cluster> --py-files alexandria_spark.zip \
        scripts/build_submit.py --input /path/docs.parquet --index /path/idx \
        [--id-col doc_id --text-col text --shards 4001 --waves 8 --n-grams 1 \
         --no-materialize]

Resumable: re-running after executor/driver loss skips completed units
(per-partition checkpoints with lineage + metrics under <index>/_checkpoints).
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet path of the docs table")
    p.add_argument("--index", required=True, help="output index path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--waves", type=int, default=4)
    p.add_argument("--n-grams", type=int, default=1)
    p.add_argument("--block-size", type=int, default=4096)
    p.add_argument("--salt-cap", type=int, default=262_144)
    p.add_argument("--shuffle-partitions", type=int, default=0,
                   help="0 = leave the session default")
    p.add_argument("--no-materialize", action="store_true",
                   help="throughput mode: stage-1 streams into the shuffle")
    p.add_argument("--from-repo-path", action="store_true",
                   help="input has (repo,path,commit,lang,content): derive "
                        "doc_id = murmur2(repo/path) and sha256 column")
    p.add_argument("--layout", default="term", choices=["term", "docpart", "both"],
                   help="which physical layout(s) to build: the term-sharded "
                        "block index, the doc-partitioned per-bucket layout "
                        "(--engine docpart at query time), or both")
    return p.parse_args()


def main():
    args = parse_args()
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import build_index, with_doc_ids

    spark = SparkSession.builder.appName("alexandria-build").getOrCreate()
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    cfg = EngineConfig(
        num_shards=args.shards, build_waves=args.waves, n_grams=args.n_grams,
        block_size=args.block_size, max_postings_per_salt=args.salt_cap,
        shuffle_partitions=args.shuffle_partitions
        or int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    docs = spark.read.parquet(args.input)
    id_col, text_col = args.id_col, args.text_col
    if args.from_repo_path:
        docs = with_doc_ids(docs)
        id_col, text_col = "doc_id", "content"
    n_docs = docs.count()
    t0 = time.time()
    if args.layout in ("term", "both"):
        idx = build_index(
            spark, docs, args.index, cfg, id_col=id_col, text_col=text_col,
            materialize_stage1=not args.no_materialize,
        )
    if args.layout == "both":
        # the term build above already scored every posting — derive the
        # doc layout from those blocks (decode → re-bucket → encode): ONE
        # full-data shuffle, no second tokenize/stats pass, and byte-level
        # score identity between the two layouts by construction
        from alexandria_spark.plans.docpart import rebuild_docpart_from_postings

        idx = rebuild_docpart_from_postings(spark, args.index, cfg)
    elif args.layout == "docpart":
        from alexandria_spark.plans.docpart import build_docpart_index

        idx = build_docpart_index(
            spark, docs, args.index, cfg, id_col=id_col, text_col=text_col,
        )
    dt = time.time() - t0
    print(json.dumps({
        "index": args.index, "n_docs": n_docs, "layout": args.layout,
        "build_sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "checkpoints": [r["unit"] for r in idx.checkpoints()],
    }))


if __name__ == "__main__":
    main()
