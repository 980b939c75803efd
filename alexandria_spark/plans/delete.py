"""Document deletion: tombstones + compaction.

The reference's doc store supports remove/versioning (hash_table tests,
tests/test_hash_table.cpp) while its immutable index shards are rebuilt
offline. The Spark-native equivalent: deletes append doc ids to a tombstone
table (query paths anti-filter it — cheap, immediate), and ``compact``
physically rebuilds postings + stats from the retained documents (BM25
refreshes, like the reference's calculate_scores after a rebuild).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import Index
from alexandria_spark.plans.checkpoint import atomic_swap_dir, recover_swap
from alexandria_spark.plans.merge import rebuild_from_term_doc


def deletes_path(index: Index) -> str:
    return os.path.join(index.path, "deletes")


def delete_docs(spark: SparkSession, index: Index, doc_ids) -> None:
    """Tombstone doc ids (list[int] or a DataFrame with a doc_id column)."""
    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select("doc_id")
    else:
        df = spark.createDataFrame([(int(d),) for d in doc_ids], ["doc_id"])
    df.write.mode("append").parquet(deletes_path(index))


def load_deletes(spark: SparkSession, index: Index) -> DataFrame | None:
    p = deletes_path(index)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


# tombstone files up to this size get the broadcast hint; past it (a mass
# deletion at scale) the anti-join falls back to Catalyst/AQE's own join
# choice instead of forcing a giant broadcast through the driver
_BROADCAST_DELETES_MAX_BYTES = 64 * 1024 * 1024


def _deletes_small(index: Index) -> bool:
    from alexandria_spark.plans.checkpoint import parquet_dir_bytes

    return parquet_dir_bytes(deletes_path(index)) <= _BROADCAST_DELETES_MAX_BYTES


def filter_deleted(spark: SparkSession, index: Index, results: DataFrame) -> DataFrame:
    """Anti-join results against the tombstones (no-op without any). Small
    tombstone sets broadcast; large ones let AQE pick the join strategy."""
    dels = load_deletes(spark, index)
    if dels is None:
        return results
    if _deletes_small(index):
        dels = F.broadcast(dels)
    return results.join(dels, "doc_id", "left_anti")


def compact(spark: SparkSession, index: Index,
            cfg: EngineConfig | None = None,
            doc_store: str | None = None,
            doc_store_buckets: int | None = None) -> Index:
    """Physically drop tombstoned docs: rebuild postings/stats from the
    retained term_doc rows, then clear the tombstones. Requires the index
    to have been built with materialize_stage1=True.

    ``doc_store`` names the bucketed doc-store table paired with this index
    (the one streaming ingest appends to): when given, compaction also
    physically removes the tombstoned docs' raw payloads from the store
    (gc_doc_store — the reference's hash_table remove,
    /root/reference/tests/test_hash_table.cpp), so a data-retention delete
    leaves no bytes behind anywhere."""
    cfg = cfg or index.config()
    td_path = os.path.join(index.path, "term_doc")
    recover_swap(td_path)  # repair a crash from a previous compact
    if not os.path.exists(td_path):
        raise ValueError("compact requires a materialized stage-1 term_doc table")
    dels = load_deletes(spark, index)
    td = spark.read.parquet(td_path).select("doc_id", "term_id", "shard", "tf", "doc_len")
    if dels is not None:
        if _deletes_small(index):
            dels = F.broadcast(dels)
        td = td.join(dels, "doc_id", "left_anti")
        if doc_store is not None:
            from alexandria_spark.sources.docstore import gc_doc_store

            if not gc_doc_store(dels, doc_store, doc_store_buckets):
                # abort BEFORE the postings rewrite clears the tombstones:
                # silently proceeding would orphan the deleted payloads with
                # no surviving record of what to GC (retention violation)
                raise ValueError(
                    f"doc_store table {doc_store!r} found in neither the "
                    f"catalog nor the warehouse — compact aborted with "
                    f"tombstones retained; check the store name or run "
                    f"compact without --doc-store"
                )
    # rewrite term_doc first so future compactions/merges see the new truth;
    # old copy is parked at term_doc_old until the new one is in place, so a
    # crash mid-swap never destroys the only stage-1 source of truth.
    tmp = td_path + "_compacting"
    td.withColumn("wave", F.pmod(F.col("shard"), F.lit(cfg.build_waves))).write.partitionBy(
        "wave"
    ).mode("overwrite").parquet(tmp)
    atomic_swap_dir(tmp, td_path)
    import shutil
    idx = rebuild_from_term_doc(
        spark, spark.read.parquet(td_path), index.path, cfg, run_id="compact"
    )
    p = deletes_path(index)
    if os.path.exists(p):
        shutil.rmtree(p)
    return idx
