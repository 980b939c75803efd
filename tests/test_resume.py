"""Checkpoint/resume: a crashed build must resume without recomputing
finished partitions (north_rule; analogue of the reference's crash-safe
.cache append files, basic_index_builder.h:172-211)."""

import os

import pytest

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import Index, build_index, with_doc_ids
from alexandria_spark.plans.query import LocalIndex, search
from alexandria_spark.sources.tables import synth_corpus

CFG = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                   build_waves=4, max_postings_per_salt=64)


def _mtimes(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def test_resume_skips_done_units(spark, tmp_path):
    docs = with_doc_ids(synth_corpus(spark, 100, seed=11))
    path = str(tmp_path / "idx")

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, docs, path, CFG, text_col="content", fail_after_waves=2)

    idx = Index(path)
    done = {r["unit"] for r in idx.checkpoints()}
    assert "stage1_term_doc" in done and "stage2_stats" in done
    assert {"wave_0", "wave_1"} <= done and "wave_3" not in done

    before_stage1 = _mtimes(os.path.join(path, "term_doc"))
    before_w0 = _mtimes(os.path.join(path, "postings", "wave=0"))
    ckpt_before = {r["unit"]: r["finished_at"] for r in idx.checkpoints()}

    idx2 = build_index(spark, docs, path, CFG, text_col="content")

    # finished units untouched: same files, same mtimes, same checkpoint records
    assert _mtimes(os.path.join(path, "term_doc")) == before_stage1
    assert _mtimes(os.path.join(path, "postings", "wave=0")) == before_w0
    ckpt_after = {r["unit"]: r["finished_at"] for r in idx2.checkpoints()}
    for unit, ts in ckpt_before.items():
        assert ckpt_after[unit] == ts, unit
    assert {"wave_2", "wave_3"} <= set(ckpt_after)

    # resumed index equals a clean build
    clean = build_index(spark, docs, str(tmp_path / "idx_clean"), CFG, text_col="content")
    a = sorted(map(tuple, idx2.postings(spark).drop("wave").collect()))
    b = sorted(map(tuple, clean.postings(spark).drop("wave").collect()))
    assert a == b


def test_checkpoint_metrics_and_lineage(spark, tmp_path):
    docs = with_doc_ids(synth_corpus(spark, 60, seed=13))
    idx = build_index(spark, docs, str(tmp_path / "idx"), CFG, text_col="content")
    recs = idx.checkpoints()
    by_unit = {r["unit"]: r for r in recs}
    assert by_unit["stage2_stats"]["docs_processed"] > 0
    total_postings = sum(
        r["postings_written"] for r in recs if r["unit"].startswith("wave_")
    )
    from pyspark.sql import functions as F

    assert total_postings == idx.postings(spark).agg(F.sum("n")).collect()[0][0]
    for r in recs:
        assert r["input_fingerprint"]
        assert r["status"] == "done"
        assert r["wall_ms"] >= 0
        assert r["run_id"].startswith("run-")
