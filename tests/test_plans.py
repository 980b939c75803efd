"""Physical-plan posture tests: the things that keep the engine fast at
100 TB must be visible in the plan, not just hoped for — partition pruning
on the shard directories, parquet filter pushdown on term_id, and
TakeOrderedAndProject (per-partition heap top-k) for the final ranking."""

import pyspark.sql.functions as F
import pytest

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import build_index, with_doc_ids
from alexandria_spark.plans.query import search, top_k
from alexandria_spark.sources.tables import synth_corpus

CFG = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                   build_waves=1, max_postings_per_salt=64)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = with_doc_ids(synth_corpus(spark, 80, seed=17))
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("idx")), CFG, text_col="content"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shard_partition_pruning(spark, idx):
    from alexandria_spark.functions.hashing import i64_hash64

    tid = i64_hash64("def")
    shard = int(__import__("numpy").int64(tid).astype("uint64") % 8)
    scan = idx.postings(spark).where(
        (F.col("shard") == shard) & (F.col("term_id") == tid)
    )
    plan = _plan(scan)
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters")[1][:200]
    # term_id predicate reaches the parquet reader
    assert "PushedFilters" in plan
    assert "term_id" in plan.split("PushedFilters")[1][:200]


def test_topk_is_take_ordered(spark, idx):
    q = search(spark, idx, "def return", mode="or", k=10)
    assert "TakeOrderedAndProject" in _plan(q)


def test_metadata_scan_prunes_payload_columns(spark, idx):
    meta = idx.postings(spark).select("term_id", "min_doc", "max_doc")
    plan = _plan(meta)
    read_schema = plan.split("ReadSchema")[1][:300] if "ReadSchema" in plan else plan
    assert "doc_deltas" not in read_schema
    assert "scores" not in read_schema


def test_query_reads_only_matching_shards(spark, idx):
    # runtime evidence: the pruned scan touches strictly fewer files
    files = lambda df: df.select(F.input_file_name()).distinct().count()
    all_files = files(idx.postings(spark))
    pruned = files(idx.postings(spark).where(F.col("shard") == 0))
    assert 0 < pruned < all_files


def test_link_boost_plan_is_broadcast_and_semijoin(spark):
    """The at-scale shape of the link boosts must be visible in the plan:
    the links table is semi-joined down to the candidate set (no full-links
    shuffle into the aggregate path) and the tiny boost relation joins back
    as a BroadcastHashJoin."""
    from alexandria_spark.operators.links import apply_url_link_boosts

    results = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("score")
    )
    links = spark.range(10_000).select(
        (F.col("id") % 50).cast("string").alias("source_domain"),
        (F.col("id") % 200).alias("target_hash"),
        ((F.col("id") % 100) / 100.0).alias("score"),
    )
    plan = _plan(apply_url_link_boosts(results, links))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_serve_truncation_is_take_ordered(spark):
    from alexandria_spark.operators.serving import truncate_candidates

    cfg = EngineConfig(pre_result_limit=1000)
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).cast("double").alias("score")
    )
    assert "TakeOrderedAndProject" in _plan(truncate_candidates(df, cfg))


def test_simhash_plan_has_no_explode(spark):
    """simhash16 must stay a single-aggregation plan — no Generate
    (explode) node and exactly one shuffle."""
    from alexandria_spark.operators.dedup import simhash16

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")], ["doc_id", "text"]
    )
    plan = _plan(simhash16(docs))
    assert "Generate" not in plan  # no explode anywhere


def test_serve_full_pipeline_plan_posture(spark, idx):
    """The composed index_manager::find pipeline must keep every at-scale
    property in ONE plan: broadcast link boosts with a LeftSemi candidate
    prune, no shuffle above the bucketed doc-store scan, and
    TakeOrderedAndProject for the pre_result_limit truncation."""
    from alexandria_spark.operators.serving import serve_full_index
    from alexandria_spark.sources.docstore import load_doc_store, save_doc_store
    from alexandria_spark.plans.build import with_doc_ids
    from alexandria_spark.sources.tables import synth_corpus

    docs = (
        with_doc_ids(synth_corpus(spark, 80, seed=17))
        .withColumn("text", F.col("content"))
        .withColumn("source", F.col("repo"))
    )
    save_doc_store(docs, name="ax_store_serve_plan", buckets=4)
    store = load_doc_store(spark, "ax_store_serve_plan")
    links = spark.range(500).select(
        (F.col("id") % 20).cast("string").alias("source_domain"),
        F.col("id").alias("target_hash"),
        ((F.col("id") % 100) / 100.0).alias("score"),
    )
    domain_links = spark.range(500).select(
        (F.col("id") % 20).cast("string").alias("source_domain"),
        (F.col("id") % 7).cast("string").alias("target_domain"),
        ((F.col("id") % 100) / 100.0).alias("score"),
    )
    cfg = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                       build_waves=1, max_postings_per_salt=64,
                       pre_result_limit=50, dedup_group_count=1,
                       result_limit=20)
    out = serve_full_index(
        spark, idx, "def return", links, domain_links, store, cfg, mode="and",
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    # the bucketed store feeds its joins without an Exchange directly above
    # any of its scans
    import re
    for m in re.finditer(r"Scan parquet [^\n]*ax_store_serve_plan", plan):
        upstream = plan[:m.start()].rstrip().splitlines()[-1]
        assert "Exchange" not in upstream, upstream
    assert out.count() > 0


def test_bucketed_doc_store_join_has_no_store_side_shuffle(spark, tmp_path):
    """Decoration against the bucketed doc store must not shuffle the store:
    only the results side gets an Exchange (the reference's hash-table
    doc-store lookup analogue)."""
    from alexandria_spark.sources.docstore import (
        decorate_from_store,
        load_doc_store,
        save_doc_store,
    )

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name="ax_store_test", buckets=8)
    store = load_doc_store(spark, "ax_store_test")
    results = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("score")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = decorate_from_store(results, store)
        plan = _plan(joined)
        assert joined.count() == 20
        # exactly one Exchange: the results side; the bucketed store scan
        # feeds the join without a shuffle
        assert plan.count("Exchange") == 1, plan

        # physical GC rewrites the store through a rename swap — the bucket
        # spec must survive so decoration stays store-side-shuffle-free
        from alexandria_spark.sources.docstore import gc_doc_store

        tombs = spark.range(5).select(F.col("id").alias("doc_id"))
        assert gc_doc_store(tombs, "ax_store_test", buckets=8)
        store2 = load_doc_store(spark, "ax_store_test")
        assert store2.count() == 995
        joined2 = decorate_from_store(results, store2)
        assert joined2.count() == 20
        assert joined2.where(F.col("snippet").isNull()).count() == 5
        assert _plan(joined2).count("Exchange") == 1, _plan(joined2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_lsh_and_pack_plan_posture(spark):
    """Scale posture of the dataset-prep pipelines: LSH candidate pairing
    must be a key-equi self-join on (band, band_key) — never a cartesian
    product — and sequence packing must window per shard (its one window
    Exchange hash-partitions on the shard key, no single-partition window)."""
    from alexandria_spark.operators.chunking import chunk_documents, pack_sequences
    from alexandria_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} shared common tail") for i in range(12)],
        ["doc_id", "text"],
    )
    # the shingle pass is map-only: no shuffle, no window, until the
    # minhash groupBy (the previous windowed form shuffled every token)
    from alexandria_spark.operators.dedup import shingles

    sh_plan = _plan(shingles(docs))
    assert "Exchange" not in sh_plan and "Window" not in sh_plan, sh_plan

    plan = _plan(lsh_candidate_pairs(docs))
    # no CartesianProduct anywhere; the only nested-loop join allowed is the
    # broadcast-tiny 8-row perms cross join inside minhash_signatures
    assert "CartesianProduct" not in plan, plan
    # the doc-pair self-join is key-equi on (band, band_key)
    assert any(f"{j} [band" in plan for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), plan

    packed = pack_sequences(chunk_documents(docs, chunk_tokens=4), seq_tokens=16, n_shards=8)
    plan = _plan(packed)
    assert "Window" in plan
    # the window partitions by the shard column, not a global sort
    assert "hashpartitioning(shard" in plan, plan
    assert "SinglePartition" not in plan.split("Window")[0], plan
    # with map-only chunking, chunk → window → aggregate is ONE shuffle
    # end-to-end (the shard repartition; the final groupBy reuses it)
    assert plan.count("Exchange") == 1, plan


def test_docpart_build_shuffle_counts(spark, idx):
    """Doc-layout build shuffle budget: the standalone build is exactly TWO
    full-data Exchanges (term-sharded scoring pre-pass + the doc-bucket
    re-cluster a doc-major layout inherently needs — the old vocabulary
    term_stats join added a third); deriving from an existing term index
    (the --layout both path) is exactly ONE (decode is map-side, only the
    re-bucket shuffles)."""
    import pyspark.sql.types as T

    from alexandria_spark.plans.blocks import decode_blocks
    from alexandria_spark.plans.build import blockify, tokenize_docs
    from alexandria_spark.plans.docpart import _scored_to_docpart_blocks
    from alexandria_spark.sources.tables import synth_corpus

    docs = synth_corpus(spark, 30, seed=23).withColumnRenamed("content", "text") \
        .withColumn("doc_id", F.monotonically_increasing_id())
    td = tokenize_docs(docs, CFG)
    scored = blockify(td, CFG, 30, 12.0, {}, emit_postings=True)
    scored = scored.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).cast("int")
    ).select("term_id", "salt", "doc_id", "tf", "score")
    plan = _plan(_scored_to_docpart_blocks(scored, CFG))
    assert plan.count("Exchange") == 2, plan

    # derive-from-term-index path (rebuild_docpart_from_postings shape)
    def decode_fn(batches):
        for pdf in batches:
            if len(pdf):
                yield decode_blocks(pdf, want_tf=True)[
                    ["term_id", "doc_id", "score", "tf"]]

    dec_schema = T.StructType([
        T.StructField("term_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
        T.StructField("tf", T.LongType()),
    ])
    derived = idx.postings(spark).mapInPandas(decode_fn, dec_schema).withColumn(
        "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).cast("int")
    ).select("term_id", "salt", "doc_id", "score", "tf")
    plan = _plan(_scored_to_docpart_blocks(derived, CFG))
    assert plan.count("Exchange") == 1, plan


def test_docpart_guard_rails(spark, idx, tmp_path):
    """search_docpart must refuse (a) a path with no doc-partitioned layout
    (clear FileNotFoundError, not an unresolved-column Catalyst error) and
    (b) k=None in OR mode (the OR kernel needs a finite k)."""
    from alexandria_spark.plans.docpart import (
        DocPartitionedIndex,
        build_docpart_index,
        search_docpart,
    )

    with pytest.raises(FileNotFoundError, match="doc-partitioned layout"):
        search_docpart(spark, DocPartitionedIndex(idx.path), "merge", "and", 5)

    docs = with_doc_ids(synth_corpus(spark, 40, seed=23))
    dp = build_docpart_index(spark, docs, str(tmp_path / "dp"), CFG,
                             text_col="content")
    with pytest.raises(ValueError, match="mode='and'"):
        search_docpart(spark, dp, "merge index", "or", None)

    # k=None AND returns the full unranked candidate set
    full = search_docpart(spark, dp, "merge", "and", None).count()
    top = search_docpart(spark, dp, "merge", "and", 5).count()
    assert top == min(5, full) and full >= top

    # a layout BUILT over an empty corpus is not an error — zero hits,
    # like the term layout (only a never-built layout raises)
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    dp0 = build_docpart_index(spark, empty_docs, str(tmp_path / "dp0"), CFG,
                              text_col="text")
    assert search_docpart(spark, dp0, "merge", "and", 5).count() == 0


def test_gc_doc_store_preserves_bucket_spec_by_default(spark):
    """gc_doc_store without an explicit bucket count must preserve the
    store's RECORDED spec (_ax_store_meta.json), not silently rebucket to
    a global default — the paired streaming ingest keeps appending with
    the original spec and would fail its next microbatch otherwise."""
    from alexandria_spark.sources.docstore import (
        _read_buckets_meta,
        _warehouse_dir,
        append_doc_store,
        drop_doc_store,
        gc_doc_store,
        load_doc_store,
        save_doc_store,
    )

    name = "ax_store_spec"
    drop_doc_store(spark, name)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=8)
    tombs = spark.range(5).select(F.col("id").alias("doc_id"))
    assert gc_doc_store(tombs, name)  # no bucket argument
    assert _read_buckets_meta(_warehouse_dir(spark, name), None) == 8
    # the ingest-side append with the original spec still works post-GC
    more = spark.range(100, 110).select(
        F.col("id").alias("doc_id"), F.lit("new").alias("text")
    )
    append_doc_store(more, name, buckets=8)
    assert load_doc_store(spark, name).count() == 105
    drop_doc_store(spark, name)


def test_gc_doc_store_recovers_interrupted_swap(spark):
    """gc_doc_store's rename swap is two metadata ops; a crash between them
    leaves the data parked at {name}_old and no {name}. The next GC must
    restore the parked table before proceeding, and still apply the GC."""
    from alexandria_spark.sources.docstore import gc_doc_store, load_doc_store, save_doc_store

    name = "ax_store_swap_crash"
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=4)
    # simulate the crash window: old renamed away, new never landed
    spark.sql(f"ALTER TABLE {name} RENAME TO {name}_old")
    assert not spark.catalog.tableExists(name)

    tombs = spark.range(10).select(F.col("id").alias("doc_id"))
    assert gc_doc_store(tombs, name, buckets=4)
    store = load_doc_store(spark, name)
    assert store.count() == 90
    assert not spark.catalog.tableExists(f"{name}_old")
    assert not spark.catalog.tableExists(f"{name}_compacting")


def _orphan_store(spark, name, as_name=None):
    """Simulate a fresh session over the in-memory catalog: the catalog
    forgets the table while its warehouse directory survives (optionally
    parked under another name, as a crashed swap leaves it)."""
    import os
    import shutil

    from alexandria_spark.sources.docstore import _warehouse_dir

    d = _warehouse_dir(spark, name)
    aside = d + "_aside"
    shutil.move(d, aside)
    spark.sql(f"DROP TABLE {name}")  # location already moved; drops metadata
    target = _warehouse_dir(spark, as_name or name)
    if os.path.exists(target):
        shutil.rmtree(target)
    shutil.move(aside, target)


def test_doc_store_adoption_after_catalog_amnesia(spark):
    """A fresh session's in-memory catalog knows nothing of the store; the
    warehouse directory is the durable truth. load_doc_store must re-adopt
    it (bucketed, via the recorded _ax_store_meta.json) and decoration must
    stay store-side-shuffle-free."""
    from alexandria_spark.sources.docstore import (
        decorate_from_store,
        load_doc_store,
        save_doc_store,
    )

    name = "ax_store_amnesia"
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=8)
    _orphan_store(spark, name)
    assert not spark.catalog.tableExists(name)

    store = load_doc_store(spark, name)  # adopts
    assert store.count() == 200
    results = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("score"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = decorate_from_store(results, store)
        assert joined.count() == 10
        assert _plan(joined).count("Exchange") == 1  # bucket spec re-attached
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_gc_doc_store_adopts_cross_session_crash_remnant(spark):
    """A GC crash between the two renames in a PREVIOUS session leaves the
    only copy parked at warehouse/{name}_old with an empty catalog. The
    next GC (new session) must adopt it and still apply the tombstones."""
    from alexandria_spark.sources.docstore import gc_doc_store, load_doc_store, save_doc_store

    name = "ax_store_crash_xsession"
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=4)
    _orphan_store(spark, name, as_name=f"{name}_old")
    assert not spark.catalog.tableExists(name)

    tombs = spark.range(5).select(F.col("id").alias("doc_id"))
    assert gc_doc_store(tombs, name, buckets=4)
    store = load_doc_store(spark, name)
    assert store.count() == 75
    assert store.where(F.col("doc_id") < 5).count() == 0


def test_append_refused_during_gc_lock_and_stale_lock_broken(spark):
    """Writer exclusion for the GC rewrite window: an append while the GC
    lock marker exists must FAIL (the stream checkpoint re-delivers the
    batch after GC) instead of being silently dropped by the anti-join
    rewrite; a lock whose holder pid is dead is broken automatically."""
    import json as _json
    import os

    from alexandria_spark.sources.docstore import (
        _acquire_gc_lock,
        _gc_lock_path,
        append_doc_store,
        drop_doc_store,
        gc_in_progress,
        load_doc_store,
        save_doc_store,
    )

    name = "ax_store_gclock"
    drop_doc_store(spark, name)
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=4)

    lock = _acquire_gc_lock(spark, name)  # held by THIS (live) pid
    more = spark.range(50, 60).select(
        F.col("id").alias("doc_id"), F.lit("new").alias("text"))
    with pytest.raises(RuntimeError, match="garbage-collected"):
        append_doc_store(more, name, buckets=4)
    os.remove(lock)

    # stale lock: holder pid no longer exists -> broken, append proceeds
    with open(_gc_lock_path(spark, name), "w") as fh:
        _json.dump({"pid": 2 ** 22 + 77, "op": "gc"}, fh)  # beyond pid_max
    assert not gc_in_progress(spark, name)
    append_doc_store(more, name, buckets=4)
    assert load_doc_store(spark, name).count() == 60
    drop_doc_store(spark, name)


def test_gc_without_meta_reads_catalog_spec(spark):
    """A store created before the meta marker existed (or whose marker was
    lost in a crash window) must GC with the CATALOG's recorded bucket
    count — never a hard-coded default that silently rebuckets the store."""
    import os

    from alexandria_spark.sources.docstore import (
        _catalog_buckets,
        _read_buckets_meta,
        _warehouse_dir,
        append_doc_store,
        drop_doc_store,
        gc_doc_store,
        load_doc_store,
        save_doc_store,
    )

    name = "ax_store_nometa"
    drop_doc_store(spark, name)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=4)
    os.remove(os.path.join(_warehouse_dir(spark, name), "_ax_store_meta.json"))
    assert _catalog_buckets(spark, name) == 4

    tombs = spark.range(5).select(F.col("id").alias("doc_id"))
    assert gc_doc_store(tombs, name)  # no bucket argument, no meta marker
    # spec preserved (from the catalog) and re-recorded in fresh meta
    assert _read_buckets_meta(_warehouse_dir(spark, name), None) == 4
    append_doc_store(  # ingest's original-spec append still works post-GC
        spark.range(100, 105).select(
            F.col("id").alias("doc_id"), F.lit("new").alias("text")),
        name, buckets=4)
    assert load_doc_store(spark, name).count() == 100
    drop_doc_store(spark, name)


def test_adoption_prefers_recorded_meta_over_caller_buckets(spark):
    """append_doc_store's DEFAULT buckets argument adopting an orphaned
    store must not rewrite the store's recorded spec: the recorded meta
    outranks the caller's argument during adoption, and the post-adoption
    append itself sizes bucketBy from the store's authoritative count."""
    from alexandria_spark.sources.docstore import (
        _read_buckets_meta,
        _warehouse_dir,
        append_doc_store,
        drop_doc_store,
        load_doc_store,
        save_doc_store,
        store_buckets,
    )

    name = "ax_store_adopt_spec"
    drop_doc_store(spark, name)
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=16)
    _orphan_store(spark, name)
    assert not spark.catalog.tableExists(name)

    more = spark.range(60, 70).select(
        F.col("id").alias("doc_id"), F.lit("new").alias("text"))
    append_doc_store(more, name)  # default buckets=32 must NOT re-spec
    assert _read_buckets_meta(_warehouse_dir(spark, name), None) == 16
    assert store_buckets(spark, name) == 16
    assert load_doc_store(spark, name).count() == 70
    drop_doc_store(spark, name)


def test_compact_aborts_when_doc_store_missing(spark, tmp_path):
    """compact(doc_store=...) with a name that exists nowhere must raise
    BEFORE clearing the tombstones — silently proceeding would orphan the
    deleted payloads with no record of what to GC."""
    import os

    from alexandria_spark.plans.build import build_index, with_doc_ids
    from alexandria_spark.plans.delete import compact, delete_docs, deletes_path
    from alexandria_spark.sources.tables import synth_corpus

    docs = with_doc_ids(synth_corpus(spark, 30, seed=5))
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG, text_col="content")
    delete_docs(spark, idx, [docs.first().doc_id])
    with pytest.raises(ValueError, match="tombstones retained"):
        compact(spark, idx, CFG, doc_store="ax_no_such_store_anywhere")
    assert os.path.exists(deletes_path(idx))  # tombstones survived the abort


def test_adoption_crash_leaves_no_stranded_copy(spark):
    """A crash in the adoption rewrite's rmtree->rename window leaves the
    only complete copy at warehouse/{name}_adopting; the next entry point
    must recover it (it is a committed copy, marked by _SUCCESS) instead of
    reporting the store missing or silently starting a fresh empty one."""
    from alexandria_spark.sources.docstore import (
        drop_doc_store,
        gc_doc_store,
        load_doc_store,
        save_doc_store,
    )

    name = "ax_store_adopt_crash"
    drop_doc_store(spark, name)
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    save_doc_store(docs, name, buckets=4)
    # crash simulation: the completed adoption output exists, everything
    # else (catalog entry, live dir) is gone
    _orphan_store(spark, name, as_name=f"{name}_adopting")
    assert not spark.catalog.tableExists(name)

    assert load_doc_store(spark, name).count() == 60

    # and the same recovery inside gc (single rewrite, GC applied)
    _orphan_store(spark, name, as_name=f"{name}_adopting")
    tombs = spark.range(6).select(F.col("id").alias("doc_id"))
    assert gc_doc_store(tombs, name, buckets=4)
    assert load_doc_store(spark, name).count() == 54
    drop_doc_store(spark, name)
