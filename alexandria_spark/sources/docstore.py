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


def _drop_table_and_dir(spark: SparkSession, name: str) -> None:
    """Drop a table including a dangling warehouse location left by a
    previous session (the default in-memory catalog forgets tables, the
    warehouse directory does not)."""
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    shutil.rmtree(os.path.join(wh, name), ignore_errors=True)


def save_doc_store(docs: DataFrame, name: str = "ax_doc_store",
                   buckets: int = 32) -> None:
    """Persist the doc store bucketed+sorted by doc_id (overwrite)."""
    spark = docs.sparkSession
    _drop_table_and_dir(spark, name)
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


def gc_doc_store(tombstones: DataFrame, name: str = "ax_doc_store",
                 buckets: int = 32) -> bool:
    """Physically remove tombstoned docs' payloads from the bucketed store.

    ``filter_deleted`` already hides tombstoned docs from every query path,
    but their raw text would otherwise sit in the store forever — the
    reference's on-disk hash table supports physical remove
    (/root/reference/tests/test_hash_table.cpp, remove cases), and a
    data-retention user needs the bytes gone, not just unreachable.

    One distributed anti-join rewrite into a fresh table with the SAME
    bucket spec (so the shuffle-free decoration plan is preserved), then a
    catalog-level rename swap. The swap is two metadata ops — a crash
    between them leaves the data parked at ``{name}_old`` (recovered by the
    next GC), never deleted-but-unreplaced. Returns False if the store
    table does not exist (nothing to do)."""
    spark = tombstones.sparkSession
    # recover a crash between the two renames of a previous GC: the new
    # table never landed, the old one holds the only copy — restore it
    if not spark.catalog.tableExists(name) and spark.catalog.tableExists(f"{name}_old"):
        spark.sql(f"ALTER TABLE {name}_old RENAME TO {name}")
    if not spark.catalog.tableExists(name):
        return False
    # GC must see the store's TRUE current state, not this session's pinned
    # listing (a streaming append since the last load would otherwise be
    # dropped by the rewrite)
    spark.catalog.refreshTable(name)
    kept = spark.table(name).join(tombstones.select("doc_id"), "doc_id", "left_anti")
    tmp = f"{name}_compacting"
    _drop_table_and_dir(spark, tmp)
    (
        kept.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("overwrite").format("parquet").saveAsTable(tmp)
    )
    _drop_table_and_dir(spark, f"{name}_old")
    spark.sql(f"ALTER TABLE {name} RENAME TO {name}_old")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {name}")
    spark.sql(f"DROP TABLE {name}_old")
    return True


def load_doc_store(spark: SparkSession, name: str = "ax_doc_store") -> DataFrame:
    """Load the store AND pin it: ``refreshTable`` advances this session's
    table-relation cache to the store's current file listing exactly once,
    here — afterwards every scan in this session (candidate source join,
    decoration) resolves through that cached listing until the next load.
    Streaming appends land via a CLONED microbatch session whose cache
    invalidation does not propagate to this one, so a serve composed of
    several actions can never mix postings-snapshot candidates with a
    newer store state mid-pipeline (the serving analogue of the impact
    cold path's manifest pin, plans/impact.py _pinned_scan); re-calling
    load_doc_store is the explicit act that advances the pin."""
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
