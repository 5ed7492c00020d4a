"""Structured Streaming extraction (SURVEY §2.11 streaming row).

The batch job's DAG is stateless per row, so the streaming variant is the
same ``mapInArrow`` stage behind ``readStream``: file-source parquet in,
exactly-once parquet file sink out, with the streaming checkpoint providing
the resume story (the streaming twin of CheckpointedSink's anti-join).

``trigger(availableNow=True)`` gives incremental batch semantics: each
invocation processes exactly the files not yet committed to the checkpoint —
at 10^12-turn scale this is the "catch up on new partitions" mode;
``maxFilesPerTrigger`` bounds micro-batch size for continuous tailing."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from cl_readability_spark.core.config import DEFAULT_CONFIG, ExtractorConfig
from cl_readability_spark.pipeline.transcripts import TRANSCRIPTS_SCHEMA
from cl_readability_spark.pipeline.udfs import (
    EXTRACT_OUTPUT_SCHEMA,
    make_arrow_extractor,
)


def streaming_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    config: ExtractorConfig = DEFAULT_CONFIG,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """transcripts parquet dir (streaming source) → extracted parquet sink.

    Returns the started StreamingQuery; caller awaits termination."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    result = stream.select("conv_id", "turn_idx", "text").mapInArrow(
        make_arrow_extractor(config), EXTRACT_OUTPUT_SCHEMA
    )

    writer = (
        result.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
