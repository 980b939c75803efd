"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship end-to-end run: build the inverted index over the
                 sf0.001 documents table and answer a conjunctive BM25 top-k
                 query through the block index.
``queries``    — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each a (spark, sf_dir) -> DataFrame.
``oracle_sql`` — the DuckDB-runnable ANSI-SQL equivalent for every entry.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alexandria_spark import suite
from alexandria_spark.config import EngineConfig
from alexandria_spark.plans.build import build_index
from alexandria_spark.plans.query import search
from alexandria_spark.sources.tables import documents


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build index → BM25 AND top-k."""
    sf_dir = "/root/testdata/sf0.001"
    cfg = EngineConfig(num_shards=16, shuffle_partitions=16, build_waves=2,
                       block_size=1024)
    docs = documents(spark, sf_dir)
    index_path = os.path.join(tempfile.mkdtemp(prefix="alexandria_idx_"), "idx")
    idx = build_index(spark, docs, index_path, cfg)
    return search(spark, idx, "table hash join", mode="and", k=100, cfg=cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
