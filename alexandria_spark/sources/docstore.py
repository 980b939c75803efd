"""Bucketed doc store: shuffle-free decoration at scale.

The reference keeps documents in on-disk hash tables keyed by doc hash
(src/hash_table/*, found via hash_table::find during decoration,
index_manager.cpp:327-338). The Spark-native analogue is a parquet table
bucketed AND sorted by doc_id: a decoration join against it needs no
shuffle on the store side (the bucketing pre-co-locates keys), which is
the difference between joining a 100 TB doc store every query and reading
only the matching buckets.

Requires saveAsTable (bucket metadata lives in the catalog); the local
warehouse works out of the box in tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def save_doc_store(docs: DataFrame, name: str = "ax_doc_store",
                   buckets: int = 32) -> None:
    """Persist the doc store bucketed+sorted by doc_id (overwrite). Drops a
    pre-existing table, including a dangling warehouse location left by a
    previous session (the default in-memory catalog forgets tables, the
    warehouse directory does not)."""
    import os
    import shutil

    spark = docs.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    (
        docs.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("overwrite").format("parquet").saveAsTable(name)
    )


def append_doc_store(docs: DataFrame, name: str = "ax_doc_store",
                     buckets: int = 32) -> None:
    """Append new docs to the bucketed store (creating it on first use) —
    the streaming-ingest companion so the composed serve pipeline can
    decorate docs the moment their postings land. Appends reuse the same
    bucket spec, so the shuffle-free store-side join plan is preserved.
    Exactly-once to the same degree as the postings append: the stream's
    checkpoint prevents re-ingesting a finished batch."""
    spark = docs.sparkSession
    if not spark.catalog.tableExists(name):
        save_doc_store(docs, name, buckets)
        return
    (
        docs.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("append").format("parquet").saveAsTable(name)
    )


def load_doc_store(spark: SparkSession, name: str = "ax_doc_store") -> DataFrame:
    # drop any stale file-listing cache first: streaming appends run in a
    # cloned microbatch session whose cache invalidation does not propagate
    # to this one (a metadata-only op, cheap relative to any query)
    spark.catalog.refreshTable(name)
    return spark.table(name)


def decorate_from_store(results: DataFrame, store: DataFrame,
                        snippet_len: int = 140) -> DataFrame:
    """Join results with the bucketed store and attach a snippet. With a
    bucketed store the join plan shuffles ONLY the (tiny) results side —
    assert via test_plans: no Exchange above the store scan."""
    return results.join(
        store.select("doc_id", F.substring("text", 1, snippet_len).alias("snippet")),
        "doc_id",
        "left",
    )
