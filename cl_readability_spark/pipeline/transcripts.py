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
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    # Arrow createDataFrame slices the pandas frame into one partition
    # per record batch, i.e. maxRecordsPerBatch (the whale-safe 512) rows
    # each — at sf1.0 that is ~750 partitions of 512 rows, so every
    # downstream map stage pays ~750 task overheads and map-side partial
    # aggregation barely collapses (measured: the trigram explode
    # shuffled 3.6 GB from 746 tasks).  Coalesce (no shuffle, slice
    # order preserved, value-identical) to ~2k-row partitions, floored
    # at the session parallelism.  NOT all the way down to the core
    # count: a 12k-row partition's gram-explode partial-agg map blew an
    # 8 GB heap (measured OOM) and 4k-row partitions spilled 9 GB — the
    # slice merge must keep per-task aggregation state bounded.  A
    # small corpus keeps its fewer slices (coalesce upward is a no-op).
    target = max(spark.sparkContext.defaultParallelism, (len(pdf) + 2047) // 2048)
    return df.coalesce(target)


# Boilerplate frame shared by the per-doc turns and the digest turns.
# KEPT IN LOCKSTEP with functions/sqltwins.py (_TRIAGE_HTML_SQL /
# SQL_READERABLE_TRIAGE), which rebuilds the identical bytes in DuckDB so
# the readerable_triage_sql oracle scores the same <p> blocks.
_HEADER_HTML = (
    '<div class="header"><ul><li><a href="/a">Home</a></li>'
    '<li><a href="/b">About</a></li><li><a href="/c">More</a></li></ul></div>'
)
_SIDEBAR_HTML = (
    '<div class="sidebar"><p><a href="/r/1">related one</a> '
    '<a href="/r/2">related two</a> <a href="/r/3">related three</a></p></div>'
)
_FOOTER_HTML = '<div class="footer"><p>Copyright, terms, privacy.</p></div>'

DIGEST_TURN_IDX = 25  # one past the per-conv doc turns (0..24)


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → transcripts shape.

    The HTML wrapping is deterministic and built from JVM expressions only:
    the document text becomes the article body (sentences → paragraphs), a
    nav/footer boilerplate frame is added so extraction has real work to do.
    conv_id groups 25 docs per conversation to exercise per-conv ordering.

    Each conversation additionally gets ONE digest turn (turn_idx 25): the
    conversation's documents concatenated in doc_id order into a single
    long paragraph.  The driver documents are short word-salad sentences,
    so every per-doc turn's paragraphs stay under the readerable triage
    threshold (sum of floor(sqrt(len-140)) over <p> blocks must exceed 20,
    readability.lisp:634-668) — without the digest rows a triage-gated
    corpus query is vacuously empty (it can't distinguish "gate works"
    from "gate broken"); with them both gate-pass and gate-reject rows
    exist at every sf (pinned in tests/test_readerable.py)."""
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
        F.lit(_HEADER_HTML),
        F.lit('<div id="main" class="article-content">'),
        paragraphs,
        F.lit("</div>"),
        F.lit(_SIDEBAR_HTML),
        F.lit(_FOOTER_HTML),
        F.lit("</body></html>"),
    )
    conv_num = (F.col("doc_id") / 25).cast("long")
    per_doc = docs.select(
        F.concat(F.lit("conv-"), conv_num.cast("string")).alias("conv_id"),
        F.pmod(F.col("doc_id"), F.lit(25)).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        html.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    # Digest turn: doc texts joined by a single space in doc_id order
    # (array_sort on (doc_id, text) structs = DuckDB's
    # string_agg(text, ' ' ORDER BY doc_id), byte-identical), wrapped as
    # ONE paragraph — long enough to clear the triage threshold.
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("doc_id"), F.col("text")))),
            lambda s: s["text"],
        ),
        " ",
    )
    digest_html = F.concat(
        F.lit('<html lang="en"><head><title>Conversation '),
        F.col("_conv_num").cast("string"),
        F.lit(" Digest Synthetic Benchmark Article | Corpus</title></head><body>"),
        F.lit(_HEADER_HTML),
        F.lit('<div id="main" class="article-content"><p>'),
        F.col("_joined"),
        F.lit("</p></div>"),
        F.lit(_SIDEBAR_HTML),
        F.lit(_FOOTER_HTML),
        F.lit("</body></html>"),
    )
    digests = (
        docs.groupBy(conv_num.alias("_conv_num"))
        .agg(joined.alias("_joined"))
        .select(
            F.concat(F.lit("conv-"), F.col("_conv_num").cast("string")).alias(
                "conv_id"
            ),
            F.lit(DIGEST_TURN_IDX).cast("int").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            digest_html.alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        )
    )
    return per_doc.unionByName(digests)
