"""query_submit.py --engine auto: the CLI picks the right layout per query
shape (multi-term -> docpart, single-term -> impact, phrase -> bmw over the
term layout) and returns hits identical to explicit engine selection; a missing
layout raises the engine's actionable FileNotFoundError instead of silently
degrading."""

import importlib.util
import json
import os
import sys

import pyspark.sql.functions as F
import pytest

from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import build_index, with_doc_ids
from alexandria_spark.plans.docpart import build_docpart_index
from alexandria_spark.plans.impact import build_impact_postings
from alexandria_spark.sources.tables import synth_corpus_pdf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = EngineConfig(num_shards=8, block_size=16, shuffle_partitions=8,
                   build_waves=1, max_postings_per_salt=64, n_grams=2)


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "query_submit", os.path.join(REPO, "scripts", "query_submit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_cli(mod, monkeypatch, capsys, *argv) -> dict:
    monkeypatch.setattr(sys, "argv", ["query_submit.py", *argv])
    mod.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def cli_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "idx")
    docs = with_doc_ids(
        spark.createDataFrame(synth_corpus_pdf(n_docs=60, seed=29))
    ).select("doc_id", F.col("content").alias("text"))
    idx = build_index(spark, docs, path, CFG)
    build_docpart_index(spark, docs, path, CFG)
    build_impact_postings(spark, idx, CFG)
    return path


CASES = [
    # (query, mode, expected auto-resolved engine)
    ("def return", "and", "docpart"),
    ("def return", "or", "docpart"),   # multi-term OR: docpart measured-best
    ("def", "or", "impact"),
    ("def", "and", "impact"),      # 1-term AND == 1-term OR -> impact single
    ("def return", "phrase", "bmw"),
]


@pytest.mark.parametrize("query,mode,expect", CASES)
def test_auto_picks_and_matches_explicit(spark, cli_idx, monkeypatch, capsys,
                                         query, mode, expect):
    mod = _load_cli()
    auto = _run_cli(mod, monkeypatch, capsys, "--index", cli_idx,
                    "--query", query, "--mode", mode, "--engine", "auto")
    assert auto["engine"] == expect
    assert auto["engine_requested"] == "auto"
    explicit = _run_cli(mod, monkeypatch, capsys, "--index", cli_idx,
                        "--query", query, "--mode", mode, "--engine", expect)
    assert auto["hits"] == explicit["hits"]
    # and the hits agree with the reference distributed path (rank identity
    # up to f64 near-ties, same tolerance as test_lifecycle)
    dist = _run_cli(mod, monkeypatch, capsys, "--index", cli_idx,
                    "--query", query, "--mode", mode, "--engine", "dist")
    assert len(auto["hits"]) == len(dist["hits"])
    for g, e in zip(auto["hits"], dist["hits"]):
        if g["doc_id"] != e["doc_id"]:
            assert abs(g["score"] - e["score"]) <= 1e-9 * max(1.0, abs(e["score"]))


def test_auto_missing_layout_errors_actionably(spark, tmp_path, monkeypatch,
                                               capsys):
    # an index with ONLY the term layout: auto on a multi-term AND resolves
    # to docpart and must surface the actionable build-it-or-use-dist error
    path = str(tmp_path / "idx_term_only")
    docs = with_doc_ids(
        spark.createDataFrame(synth_corpus_pdf(n_docs=20, seed=31))
    ).select("doc_id", F.col("content").alias("text"))
    build_index(spark, docs, path, CFG)
    mod = _load_cli()
    with pytest.raises(FileNotFoundError, match="build_docpart_index"):
        _run_cli(mod, monkeypatch, capsys, "--index", path,
                 "--query", "def return", "--mode", "and", "--engine", "auto")
    with pytest.raises(FileNotFoundError, match="derive-impact"):
        # single-term routes to impact; multi-term OR routes to docpart now
        _run_cli(mod, monkeypatch, capsys, "--index", path,
                 "--query", "def", "--mode", "or", "--engine", "auto")
