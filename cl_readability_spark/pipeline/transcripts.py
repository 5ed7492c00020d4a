"""Transcript-table construction.

Two sources:
- ``synthetic_transcripts``: the deterministic corpus generator
  (pipeline/corpus.py) materialized as a DataFrame with the authoritative
  input schema (BASELINE.json input_hint).
- ``documents_as_transcripts``: wraps the driver-provided
  ``documents.parquet`` text into deterministic HTML entirely with JVM-side
  expressions (concat/replace — no UDF), so the driver testdata can feed the
  extraction pipeline without synthesizing external data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cl_readability_spark.pipeline.corpus import build_transcript_rows

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)


def synthetic_transcripts(
    spark: SparkSession, n_conversations: int, seed: int = 42
) -> DataFrame:
    rows = build_transcript_rows(n_conversations, seed)
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → transcripts shape.

    The HTML wrapping is deterministic and built from JVM expressions only:
    the document text becomes the article body (sentences → paragraphs), a
    nav/footer boilerplate frame is added so extraction has real work to do.
    conv_id groups 25 docs per conversation to exercise per-conv ordering."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paragraphs = F.concat(
        F.lit("<p>"),
        F.regexp_replace(F.col("text"), r"\. ", ".</p><p>"),
        F.lit("</p>"),
    )
    html = F.concat(
        F.lit('<html lang="'),
        F.col("lang"),
        F.lit('"><head><title>Document '),
        F.col("doc_id").cast("string"),
        F.lit(" Synthetic Benchmark Article | Corpus</title></head><body>"),
        F.lit(
            '<div class="header"><ul><li><a href="/a">Home</a></li>'
            '<li><a href="/b">About</a></li><li><a href="/c">More</a></li></ul></div>'
        ),
        F.lit('<div id="main" class="article-content">'),
        paragraphs,
        F.lit("</div>"),
        F.lit('<div class="sidebar"><p><a href="/r/1">related one</a> '),
        F.lit('<a href="/r/2">related two</a> <a href="/r/3">related three</a></p></div>'),
        F.lit('<div class="footer"><p>Copyright, terms, privacy.</p></div>'),
        F.lit("</body></html>"),
    )
    return (
        docs.select(
            F.concat(F.lit("conv-"), (F.col("doc_id") / 25).cast("long").cast("string"))
            .alias("conv_id"),
            F.pmod(F.col("doc_id"), F.lit(25)).cast("int").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            html.alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        )
    )
