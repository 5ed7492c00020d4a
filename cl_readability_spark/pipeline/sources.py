"""Transcript source adapters — schema-enforced readers for the formats
conversation/agent logs actually arrive in (SURVEY §2.11 scans row).

Every adapter returns the authoritative transcripts shape
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp) with an explicit schema — no inference anywhere (schema drift
at 10^12 rows must fail loudly at the scan, not silently downstream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cl_readability_spark.pipeline.transcripts import TRANSCRIPTS_SCHEMA

# wire formats carry ts as epoch seconds (JSON has no timestamp type)
_WIRE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts_epoch", LongType(), True),
    ]
)


def _finalize(df: DataFrame) -> DataFrame:
    out = df.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.coalesce(F.col("role"), F.lit("unknown")).alias("role"),
        F.col("text"),
        F.col("tool"),
        F.to_timestamp(F.from_unixtime(F.col("ts_epoch"))).alias("ts"),
    )
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in TRANSCRIPTS_SCHEMA.fields]
    if got != want:
        raise ValueError(
            f"transcript source schema drift: got {got}, want {want}"
        )
    return out


def transcripts_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)


def transcripts_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines logs: one turn per line, explicit schema (corrupt lines
    fail the scan in the default PERMISSIVE→null shape; use
    ``.option('mode','FAILFAST')`` upstream if strictness is wanted)."""
    return _finalize(spark.read.schema(_WIRE_SCHEMA).json(path))


def transcripts_from_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV exports with quoted multi-line HTML cells."""
    reader = (
        spark.read.schema(_WIRE_SCHEMA)
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
    )
    return _finalize(reader.csv(path))
