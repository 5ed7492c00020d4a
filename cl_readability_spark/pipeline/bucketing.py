"""Bucketed tables for co-located joins (task-brief scale checklist).

At 100 TB, repeated joins of extraction output against conversation-level
dimensions (labels, sampling weights, split assignments) should not re-shuffle
the fact side every time.  Writing both sides bucketed by the join key lets
Catalyst plan a SortMergeJoin with ZERO Exchange on the bucketed sides —
verified by test_bucketing.py asserting the executed plan has no shuffle.

Bucketed writes require a table catalog (``saveAsTable``); local Derby
metastore in tests, any Hive/Glue catalog in production.  Iceberg's
bucket-partition transform plays the same role with the Iceberg sink."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
