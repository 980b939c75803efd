"""Heavy-entry oracle sweep at sf0.1 (AX_SLOW=1 to run).

The regular driver-gate emulation (tests/test_suite.py) runs at sf0.001 and
the driver itself at sf0.01 — small enough that several scale mechanisms
never fire: the LSH hot-bucket cap, hot-term salting, impact early
termination, block-max bucket pruning, and the per-shard pack windows only
bite with real data volume. This sweep runs the heaviest suite entries
against DuckDB at sf0.1 so those paths are oracle-checked where they
actually engage. Skipped by default (several minutes); run with

    AX_SLOW=1 python -m pytest tests/test_suite_sf01.py -q

and record the runtime in BENCH.md.
"""

import os

import duckdb
import pytest

from alexandria_spark import suite
from alexandria_spark.sources.tables import TESTDATA_TABLES
from tests.test_suite import _normalize, _value_hash

pytestmark = pytest.mark.skipif(
    os.environ.get("AX_SLOW") != "1",
    reason="sf0.1 oracle sweep takes minutes; set AX_SLOW=1 to run",
)

SF = "/root/testdata/sf0.1"

# the entries whose scale mechanisms only engage with volume
HEAVY = [
    "near_dup_jaccard",       # shingle->minhash->LSH banding + hot-bucket cap
    "contamination_check",    # exact + near channels over the full corpus
    "lsh_candidates",         # banding bucket join at real bucket sizes
    "index_serve_full",       # composed serve over a salted persisted index
    "impact_topk",            # impact-order early termination actually stops
    "merge_search_topk",      # partial->final merge at volume
    "engines_search_topk",    # bmw bucket pruning + docpart WAND + local TAAT
    "prep_pipeline",          # chunk->pack per-shard windows over real chunks
]


@pytest.fixture(scope="module")
def duck():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_entry_matches_oracle_sf01(spark, duck, name):
    fn, sql = suite.ENTRIES[name]
    got = _normalize(fn(spark, SF).toPandas())
    exp = _normalize(duck.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    assert _value_hash(got) == _value_hash(exp), f"{name}: value-hash mismatch"
