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
        # ...and the same bound for the JVM-side parquet vectorized reader:
        # its default 4096-row column vectors over multi-KB text cells need
        # contiguous on-heap reservations that fail on small-heap drivers
        # (observed FAILED_READ_FILE at 1 GB heap on a 3.5 KB-avg corpus)
        # and would be GBs on whale rows regardless of heap
        .config("spark.sql.parquet.columnarReaderBatchSize", str(arrow_max_records))
        # ...and for the table-cache columnar builder: persist()/cache()
        # assembles spark.sql.inMemoryColumnarStorage.batchSize rows per
        # column batch IN MEMORY before handing it to storage — even at
        # DISK_ONLY.  The 10,000-row default over multi-KB text cells is
        # hundreds of MB per concurrent task (observed: 32-task OOM on an
        # 8 GB heap caching a 2.7 GB-text corpus); bound it to the same
        # whale-safe row budget as the other batch knobs
        .config("spark.sql.inMemoryColumnarStorage.batchSize", str(arrow_max_records))
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/clrs-spark-warehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def get_or_build_session(app_name: str) -> SparkSession:
    """Session for the production scripts: under spark-submit (which sets
    spark.master and the deployment's memory/executor conf) just attach;
    run as plain python, fall back to build_spark's tuned local defaults —
    the bare builder's 1 GB local driver cannot even scan a wide-text
    corpus (see the columnarReaderBatchSize note above)."""
    from pyspark import SparkConf

    if SparkConf().contains("spark.master"):
        conf = SparkConf()
        builder = SparkSession.builder.appName(app_name)
        # ALL the whale-safe batch knobs (they are SQL confs — settable on
        # attach), deferring to anything the deployment set explicitly;
        # forwarding only some of them re-opens the cache-builder OOM the
        # build_spark comments document
        for key, default in (
            ("spark.sql.parquet.columnarReaderBatchSize", "512"),
            ("spark.sql.inMemoryColumnarStorage.batchSize", "512"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "512"),
            ("spark.sql.execution.arrow.maxBytesPerBatch", "32m"),
        ):
            builder = builder.config(key, conf.get(key, default))
        return builder.getOrCreate()
    return build_spark(app_name=app_name)
