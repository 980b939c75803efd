"""Heaviest-index-entry oracle sweep at sf10-equivalent (~500k docs, 100x
the largest driver-provided scale factor).

Round 5 measured serving at sf10 and the profiling itself found two real
driver-volume scale bugs — which argues the correctness oracle should
follow the measurements up. This sweep synthesizes the driver-shaped
documents table at 500k docs (sources/bench_corpus.testdata_corpus) and
oracle-checks the four heaviest index entries against DuckDB two decades
above the driver gate. Skipped by default (an hour-class run dominated by
the DuckDB positional tokenizer); run with

    AX_SLOW=1 python -m pytest tests/test_suite_sf10.py -q

and record the runtime in BENCH.md.
"""

import os

import pytest

from alexandria_spark import suite
from tests.test_suite import _normalize, _value_hash

pytestmark = pytest.mark.skipif(
    os.environ.get("AX_SLOW") != "1",
    reason="sf10 oracle sweep is hour-class; set AX_SLOW=1 to run",
)

N_DOCS = 500_000

HEAVY = [
    "engines_search_topk",
    "impact_topk",
    "index_serve_full",
    "merge_search_topk",
]


@pytest.fixture(scope="module")
def sf10_dir(spark, tmp_path_factory):
    from alexandria_spark.sources.bench_corpus import testdata_corpus

    d = tmp_path_factory.mktemp("sf10")
    testdata_corpus(spark, N_DOCS).write.mode("overwrite").parquet(
        str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(sf10_dir):
    import duckdb

    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"'{sf10_dir}/documents.parquet/*.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_entry_matches_oracle_sf10(spark, duck, sf10_dir, name):
    fn, sql = suite.ENTRIES[name]
    got = _normalize(fn(spark, sf10_dir).toPandas())
    exp = _normalize(duck.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    assert _value_hash(got) == _value_hash(exp), f"{name}: value-hash mismatch"
