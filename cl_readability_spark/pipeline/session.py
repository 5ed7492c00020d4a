"""SparkSession factory with the scale-oriented defaults this engine assumes.

Local mode is the test harness; the same knobs are what a 1000-executor
deployment would set (AQE on incl. skew-join handling, Arrow batching bounded
so multi-MB HTML cells cannot blow Python-worker memory)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "cl-readability-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 512,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big HTML cells: bound the Arrow batch by rows AND bytes — a batch of
        # whale documents must not blow Python-worker memory (512 rows × 10 MB
        # would be 5 GB; the byte cap splits it)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "32m")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/clrs-spark-warehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
