"""SparkSession factory tuned for the engine.

Local mode stands in for a multi-executor cluster (the driver harness runs
local[32]); all pipelines are written against partition counts, not local
threads, so the same code runs unchanged under YARN/K8s.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "alexandria-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    if cores is not None:
        master = f"local[{cores}]"
    else:
        master = os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        # 8g is the sweet spot on this box: 1g starves 32 python-worker
        # pipes, while very large heaps (48g) anti-scale on GC/page-zeroing.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.filterPushdown", "true")
        # lz4 shuffle compression stays ON even locally: it reduces dirty
        # page-cache writeback, which measured faster than raw bytes here
        .config("spark.ui.enabled", "false")
        # the console progress bar writes \r-terminated updates to stderr
        # with no trailing newline, so under a merged-capture harness the
        # final JSON report line can end up byte-adjacent to "[Stage ..]\r"
        # junk. Keep it off: machine-read output stays line-clean and the
        # captured tail spends its bytes on the report, not on bars.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
