"""Heavy-entry oracle sweep at sf1-equivalent (~50k docs, 10x the largest
driver-provided scale factor).

sf0.1 (5k docs) is the largest driver testdata; salting, the LSH hot-bucket
cap, impact early termination and bmw bucket pruning engage there but
shallowly. This sweep synthesizes a deterministic documents table of the
driver's exact shape at 50k docs (sources/bench_corpus.testdata_corpus) and
runs the same heavy entries against DuckDB one decade up. Skipped by
default (tens of minutes); run with

    AX_SLOW=1 python -m pytest tests/test_suite_sf1.py -q

and record the runtime + the build-throughput curve in BENCH.md.
"""

import os

import pytest

from alexandria_spark import suite
from tests.test_suite import _normalize, _value_hash

pytestmark = pytest.mark.skipif(
    os.environ.get("AX_SLOW") != "1",
    reason="sf1 oracle sweep takes tens of minutes; set AX_SLOW=1 to run",
)

N_DOCS = 50_000

HEAVY = [
    "near_dup_jaccard",
    "contamination_check",
    "lsh_candidates",
    "index_serve_full",
    "impact_topk",
    "merge_search_topk",
    "engines_search_topk",
    "prep_pipeline",
]


@pytest.fixture(scope="module")
def sf1_dir(spark, tmp_path_factory):
    from alexandria_spark.sources.bench_corpus import testdata_corpus

    d = tmp_path_factory.mktemp("sf1")
    testdata_corpus(spark, N_DOCS).write.mode("overwrite").parquet(
        str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(sf1_dir):
    import duckdb

    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"'{sf1_dir}/documents.parquet/*.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_entry_matches_oracle_sf1(spark, duck, sf1_dir, name):
    fn, sql = suite.ENTRIES[name]
    got = _normalize(fn(spark, sf1_dir).toPandas())
    exp = _normalize(duck.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    assert _value_hash(got) == _value_hash(exp), f"{name}: value-hash mismatch"
