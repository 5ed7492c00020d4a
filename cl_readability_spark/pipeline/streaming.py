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


def streaming_turn_rollup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
    window_size: str = "1 hour",
) -> StreamingQuery:
    """Watermarked windowed aggregation over the transcript stream: per
    (event-time window, conv_id) turn counts and byte volumes — the metrics
    rollup as a late-data-tolerant streaming query (SURVEY §2.11)."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "conv_id",
            "n_turns",
            "total_chars",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


CONV_STATE_SCHEMA = "n_turns LONG, total_chars LONG"
CONV_OUTPUT_SCHEMA = (
    "conv_id STRING, n_turns LONG, total_chars LONG, closed BOOLEAN"
)


def streaming_conversation_sessions(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    idle_timeout_ms: int = 1000,
) -> StreamingQuery:
    """Custom stateful operator via applyInPandasWithState: accumulates
    per-conversation turn/char counts across micro-batches, emits the running
    total each update and a final ``closed`` row when the conversation goes
    idle (processing-time timeout) — the streaming twin of the per-conv
    metrics sidecar."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n, chars) = state.get
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [key[0]], "n_turns": [n], "total_chars": [chars],
                 "closed": [True]}
            )
            return
        n, chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            chars += int(pdf["text"].str.len().fillna(0).sum())
        state.update((n, chars))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"conv_id": [key[0]], "n_turns": [n], "total_chars": [chars],
             "closed": [False]}
        )

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_path)
    sessions = (
        stream.select("conv_id", "text")
        .groupBy(F.col("conv_id"))
        .applyInPandasWithState(
            update,
            CONV_OUTPUT_SCHEMA,
            CONV_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
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


def streaming_near_dup_flags(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming MinHash near-dup gate: the batch LSH's band signatures
    are computed per micro-batch by the STATELESS fused Arrow stage
    (``dedup.band_signature_stage``), and
    ``dropDuplicatesWithinWatermark`` keeps the FIRST claimant of every
    (band_idx, band_sig) bucket across micro-batches.  The sink receives
    the surviving band rows; reduce them with ``near_dup_kept_ids`` —
    a doc is kept iff it claimed ALL of its ``bands`` buckets, i.e. no
    earlier-arrived document collided with it on any band.

    Semantics — candidate-level, deliberately: this is the streaming
    twin of the LSH candidate generation, so recall of true near-dups
    follows the (bands, rows/band) LSH curve and a chance band collision
    false-drops at the same (tiny) rate the batch pipeline would pay in
    candidate verification.  The batch ``minhash_near_dups`` + keep-one
    over the corpus at rest remains the exact backstop (the pytest
    replays a corpus through both and asserts the kept sets agree).
    State is bounded by the watermark horizon exactly as in
    ``streaming_exact_dedup``: duplicates arriving later than the
    horizon re-claim buckets and are re-emitted, and the at-rest batch
    dedup catches them — the only viable contract at 10^12 turns.

    The input schema is taken from a static read of ``input_path`` (the
    streaming source requires an explicit schema)."""
    from cl_readability_spark.functions.dedup import band_signature_stage

    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    banded = band_signature_stage(
        stream,
        id_col=id_col,
        text_col=text_col,
        passthrough=(ts_col,),
        k=k,
        n_hashes=n_hashes,
        bands=bands,
    )
    survivors = banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["band_idx", "band_sig"]
    )
    writer = (
        survivors.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_dup_kept_ids(
    spark: SparkSession,
    bands_path: str,
    bands: int = 8,
    id_col: str = "doc_id",
):
    """Batch reduction of ``streaming_near_dup_flags`` output: the ids
    that claimed all their band buckets first (kept set).  One pruned
    two-column scan + one groupBy."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(bands_path)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_owned"))
        .filter(F.col("n_owned") == bands)
        .select(id_col)
    )


def streaming_exact_dedup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact dedup: the batch pipeline's content-fingerprint
    dedup (curation.py stage 1 / sqltwins ``dedup_exact``) as a stateful
    streaming operator — ``dropDuplicatesWithinWatermark`` keeps one row
    per normalized-content fingerprint across micro-batches, with the
    watermark bounding how long a fingerprint stays in the dedup state
    (Spark evicts state older than the watermark, so memory is bounded by
    the duplicate-arrival horizon, not the stream's lifetime — the only
    viable contract at 10^12 turns).

    Duplicates arriving LATER than the watermark horizon are re-emitted by
    construction; downstream exact dedup at rest (the batch gate) remains
    the backstop, exactly like late data in the windowed rollup."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_path)
    fingerprint = F.md5(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]", ""
        )
    )
    deduped = (
        stream.withColumn("_fp", fingerprint)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
