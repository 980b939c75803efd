"""Bucketed doc store: shuffle-free decoration at scale.

The reference keeps documents in on-disk hash tables keyed by doc hash
(src/hash_table/*, found via hash_table::find during decoration,
index_manager.cpp:327-338). The Spark-native analogue is a parquet table
bucketed AND sorted by doc_id: a decoration join against it needs no
shuffle on the store side (the bucketing pre-co-locates keys), which is
the difference between joining a 100 TB doc store every query and reading
only the matching buckets.

Bucket metadata lives in the catalog (saveAsTable). The sandbox's default
in-memory catalog forgets tables across sessions while the warehouse
directory persists, so every entry point re-ADOPTS an orphaned store
directory (``_ensure_registered``): a production deployment would use a
persistent metastore and never hit that branch, but the CLI maintenance
ops (compact --doc-store, serving from a fresh spark-submit) must work
either way. A ``_ax_store_meta.json`` marker inside the table directory
records the bucket count for adoption.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_META_FILE = "_ax_store_meta.json"  # "_"-prefixed: invisible to readers


def _warehouse_dir(spark: SparkSession, name: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    return os.path.join(wh, name)


def _drop_table_and_dir(spark: SparkSession, name: str) -> None:
    """Drop a table including a dangling warehouse location left by a
    previous session."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(_warehouse_dir(spark, name), ignore_errors=True)


def _write_meta(spark: SparkSession, name: str, buckets: int) -> None:
    with open(os.path.join(_warehouse_dir(spark, name), _META_FILE), "w") as fh:
        json.dump({"buckets": buckets}, fh)


def _has_complete_data(d: str) -> bool:
    """A directory holds an adoptable store copy only when the write that
    produced it COMMITTED (_SUCCESS marker) — a crash mid-write leaves
    parquet parts that must never be adopted as the store's truth."""
    return (
        os.path.isdir(d)
        and os.path.exists(os.path.join(d, "_SUCCESS"))
        and any(f.endswith(".parquet") or f.startswith("part-")
                for f in os.listdir(d))
    )


def _retire_dir(spark: SparkSession, name: str, d: str) -> None:
    """Delete a condemned store directory CRASH-SAFELY: atomically rename
    it aside to ``{name}_trash`` first, then rmtree the trash. A crash
    mid-rmtree of the directory itself could leave ``_SUCCESS`` plus a
    subset of part files — a remnant that still passes
    ``_has_complete_data`` and would be adopted as the store's truth over
    the real complete copy parked at ``{name}_adopting``/``{name}_compacting``
    (whose dir the retry then deletes: data loss). The rename is atomic,
    the trash name is never in the adoption trust order, and a crashed
    trash removal is finished by the next retire/drop."""
    trash = _warehouse_dir(spark, f"{name}_trash")
    shutil.rmtree(trash, ignore_errors=True)  # finish a crashed removal
    if os.path.isdir(d):
        os.rename(d, trash)
        shutil.rmtree(trash, ignore_errors=True)


def _orphan_source_dir(spark: SparkSession, name: str) -> str | None:
    """The directory holding the store's durable truth when the catalog
    forgot the table, in trust order: the live dir, a swap's parked old
    copy, a crashed adoption's or GC's completed output (the
    rmtree-before-rename window — without those candidates such a crash
    would strand the only copy). ``{name}_trash`` is deliberately NOT a
    candidate: it only ever holds condemned data mid-removal. Returns
    None when nothing complete exists anywhere."""
    for cand in (name, f"{name}_old", f"{name}_adopting", f"{name}_compacting"):
        d = _warehouse_dir(spark, cand)
        if _has_complete_data(d):
            return d
    return None


def _normalize_orphan(spark: SparkSession, name: str) -> str | None:
    """Move whatever complete orphan copy exists into the live directory
    (warehouse/{name}) and return that path — the single source every
    recovery path reads from. A partial (uncommitted) live dir is cleared
    first; returns None when no complete copy exists anywhere."""
    src_dir = _orphan_source_dir(spark, name)
    if src_dir is None:
        return None
    live = _warehouse_dir(spark, name)
    if src_dir != live:
        shutil.rmtree(live, ignore_errors=True)
        shutil.move(src_dir, live)
    return live


def _read_buckets_meta(d: str, fallback: int | None) -> int:
    try:
        with open(os.path.join(d, _META_FILE)) as fh:
            return int(json.load(fh)["buckets"])
    except (OSError, ValueError, KeyError):
        return 32 if fallback is None else fallback


def _ensure_registered(spark: SparkSession, name: str,
                       buckets: int | None = None) -> bool:
    """Make ``name`` resolvable in THIS session's catalog, adopting an
    orphaned warehouse directory if the catalog forgot the table (fresh
    session over an in-memory catalog, or a crash that left the data parked
    at ``{name}_old`` / ``{name}_adopting`` mid-swap). Adoption is one
    bucketed rewrite — the only way to re-attach managed bucket metadata
    without a persistent metastore — so it is a recovery path, not a hot
    path. Returns False when no table and no orphaned data exist."""
    if spark.catalog.tableExists(name):
        return True
    # in-catalog crash recovery first: the old table still registered
    if spark.catalog.tableExists(f"{name}_old"):
        spark.sql(f"ALTER TABLE {name}_old RENAME TO {name}")
        return True
    src_dir = _normalize_orphan(spark, name)
    if src_dir is None:
        return False
    n_buckets = buckets if buckets is not None else _read_buckets_meta(src_dir, None)
    df = spark.read.parquet(src_dir)
    tmp = f"{name}_adopting"
    _drop_table_and_dir(spark, tmp)
    (
        df.write.bucketBy(n_buckets, "doc_id").sortBy("doc_id")
        .mode("overwrite").format("parquet").saveAsTable(tmp)
    )  # fully materialized BEFORE the orphan dirs are removed
    _retire_dir(spark, name, src_dir)
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {name}")
    _write_meta(spark, name, n_buckets)
    return True


def drop_doc_store(spark: SparkSession, name: str = "ax_doc_store") -> None:
    """Remove the store COMPLETELY: the table, its live directory, and
    every recovery remnant adoption would otherwise resurrect (`_old`,
    `_adopting`, `_compacting`). The cleanup tests and teardown paths must
    use — a bare DROP TABLE leaves the durable directory truth behind."""
    for cand in (name, f"{name}_old", f"{name}_adopting", f"{name}_compacting",
                 f"{name}_trash"):
        _drop_table_and_dir(spark, cand)


def save_doc_store(docs: DataFrame, name: str = "ax_doc_store",
                   buckets: int = 32) -> None:
    """Persist the doc store bucketed+sorted by doc_id (overwrite)."""
    spark = docs.sparkSession
    _drop_table_and_dir(spark, name)
    (
        docs.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("overwrite").format("parquet").saveAsTable(name)
    )
    _write_meta(spark, name, buckets)


def append_doc_store(docs: DataFrame, name: str = "ax_doc_store",
                     buckets: int = 32) -> None:
    """Append new docs to the bucketed store (creating it on first use) —
    the streaming-ingest companion so the composed serve pipeline can
    decorate docs the moment their postings land. Appends reuse the same
    bucket spec, so the shuffle-free store-side join plan is preserved.
    Exactly-once to the same degree as the postings append: the stream's
    checkpoint prevents re-ingesting a finished batch."""
    spark = docs.sparkSession
    if not _ensure_registered(spark, name, buckets):
        save_doc_store(docs, name, buckets)
        return
    (
        docs.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("append").format("parquet").saveAsTable(name)
    )


def gc_doc_store(tombstones: DataFrame, name: str = "ax_doc_store",
                 buckets: int | None = None) -> bool:
    """Physically remove tombstoned docs' payloads from the bucketed store.

    ``filter_deleted`` already hides tombstoned docs from every query path,
    but their raw text would otherwise sit in the store forever — the
    reference's on-disk hash table supports physical remove
    (/root/reference/tests/test_hash_table.cpp, remove cases), and a
    data-retention user needs the bytes gone, not just unreachable.

    One distributed anti-join rewrite into a fresh table with the SAME
    bucket spec (so the shuffle-free decoration plan is preserved), then a
    catalog-level rename swap. ``buckets`` defaults to the store's OWN
    recorded bucket count (``_ax_store_meta.json``) — a GC must never
    silently rebucket the store, or the streaming ingest still appending
    with the original spec fails its next microbatch; pass it explicitly
    only to intentionally re-spec during the rewrite. A crash between the two renames leaves the
    data parked at ``{name}_old`` (recovered by the next entry point, same
    or new session), never deleted-but-unreplaced. Returns False if the
    store exists in neither the catalog nor the warehouse.

    Retention beats reader grace here BY DESIGN: the old files (which still
    hold the tombstoned bytes) are dropped immediately, so a session pinned
    to the pre-GC listing fails fast on its next action and must re-load —
    the same maintenance-window semantics as the reference's hash_table
    remove. Run GC when the paired index compacts, not mid-serve."""
    spark = tombstones.sparkSession
    registered = spark.catalog.tableExists(name)
    if not registered and spark.catalog.tableExists(f"{name}_old"):
        # in-catalog crash recovery: the parked old table is the truth
        spark.sql(f"ALTER TABLE {name}_old RENAME TO {name}")
        registered = True
    if registered:
        # GC must see the store's TRUE current state, not this session's
        # pinned listing (a streaming append since the last load would
        # otherwise be dropped by the rewrite)
        spark.catalog.refreshTable(name)
        src = spark.table(name)
    else:
        # catalog amnesia: read the orphaned directory DIRECTLY as the
        # rewrite source — the input's bucketing is irrelevant to the
        # rewrite, so no adoption pre-pass (which would rewrite the whole
        # store a second time just to re-attach catalog metadata)
        src_dir = _normalize_orphan(spark, name)
        if src_dir is None:
            return False
        src = spark.read.parquet(src_dir)
    if buckets is None:
        buckets = _read_buckets_meta(_warehouse_dir(spark, name), None)
    kept = src.join(tombstones.select("doc_id"), "doc_id", "left_anti")
    tmp = f"{name}_compacting"
    _drop_table_and_dir(spark, tmp)
    (
        kept.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("overwrite").format("parquet").saveAsTable(tmp)
    )
    _drop_table_and_dir(spark, f"{name}_old")
    if registered:
        spark.sql(f"ALTER TABLE {name} RENAME TO {name}_old")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {name}")
        spark.sql(f"DROP TABLE {name}_old")
    else:
        _retire_dir(spark, name, _warehouse_dir(spark, name))
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {name}")
    _write_meta(spark, name, buckets)
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
    load_doc_store is the explicit act that advances the pin. In a fresh
    session over the in-memory catalog, an orphaned warehouse store is
    re-adopted first (module docstring)."""
    _ensure_registered(spark, name)
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
