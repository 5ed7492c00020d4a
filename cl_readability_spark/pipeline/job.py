"""The extraction job — the Spark lifecycle of SURVEY §3.1.

scan → (resume anti-join) → conv_id-salted repartition → vectorized extract
→ stable (conv_id, turn_idx) ordering → output + metrics sidecar.

Scale notes (the design targets a 1000-executor cluster):
- The salted repartition spreads giant-document / long-conversation skew
  across the whole cluster; the salt is pmod(hash(turn_idx), K), derived only
  from data (deterministic, no RNG).  Extraction is per-row pure, so any
  partitioning is semantically safe.
- Only (conv_id, turn_idx, text) are read for extraction — column pruning
  reaches the parquet scan (verify via .explain: ReadSchema).
- The UDF stage is a narrow map after the repartition; AQE handles the
  shuffle's partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cl_readability_spark.core.config import DEFAULT_CONFIG, ExtractorConfig
from cl_readability_spark.pipeline.udfs import (
    EXTRACT_OUTPUT_SCHEMA,
    make_arrow_extractor,
    make_readerable_udf,
)

OUTPUT_COLUMNS = ["conv_id", "turn_idx", "extracted_text", "content_spans"]


def salted_repartition(
    df: DataFrame, num_partitions: int | None = None, salt_buckets: int = 16
) -> DataFrame:
    """conv_id-salted repartition (SURVEY §4.2): same conv_id spreads over up
    to ``salt_buckets`` partitions so a 50-turn conversation of 10 MB docs
    doesn't pin one task; deterministic (hash of turn_idx, no RNG).

    The partition count is ALWAYS pinned explicitly: a bare
    ``repartition(cols)`` is AQE-coalescible, and AQE sizes partitions by
    shuffle *bytes* — blind to the Python-CPU cost of the extraction stage
    that follows.  A few MB of HTML can hold seconds of per-row DOM work, so
    byte-coalescing would serialize the stage onto one task (measured: 11×
    slowdown on small inputs).  Downstream of this exchange the work is
    CPU-proportional to rows, and the salt already bounds per-partition
    skew."""
    salt = F.pmod(F.hash(F.col("turn_idx")), F.lit(salt_buckets))
    if not num_partitions:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    return df.repartition(num_partitions, F.col("conv_id"), salt)


def extract_transcripts(
    df: DataFrame,
    config: ExtractorConfig = DEFAULT_CONFIG,
    salt_buckets: int = 16,
    num_partitions: int | None = None,
    prefilter_readerable: bool | str = False,
    with_metrics: bool = True,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) →
    extracted(conv_id, turn_idx, extracted_text, content_spans [, metrics…]).

    ``prefilter_readerable`` inserts the is_readerable triage stage
    (readability.lisp:634-668) before full extraction — a selectivity win
    when much of the corpus is non-article noise.  Two variants:
    True/"exact" runs the DOM-parsing triage (a python pass — exact, but
    at 10^12 rows it is a second extraction-scale cost); "jvm" runs the
    regexp-expression approximation (sqltwins.readerable_triage_sql's
    scorer — JVM-only, no python workers, ≥99% per-turn agreement
    measured) and is the shape to deploy at the 100 TB target."""
    if prefilter_readerable not in (False, True, "exact", "jvm"):
        # strict: any other truthy string would silently fall through to
        # the expensive exact python pass ("JVM", "off", a typo...)
        raise ValueError(
            f"prefilter_readerable must be False/True/'exact'/'jvm', "
            f"got {prefilter_readerable!r}"
        )
    cols = ["conv_id", "turn_idx", "text"]
    src = df.select(*cols)
    if prefilter_readerable == "jvm":
        from cl_readability_spark.functions.sqltwins import triage_score_col

        src = src.filter(triage_score_col(F.col("text")) > 20)
    elif prefilter_readerable:
        src = src.filter(make_readerable_udf(config)(F.col("text")))
    src = salted_repartition(src, num_partitions, salt_buckets)
    res = src.mapInArrow(make_arrow_extractor(config), EXTRACT_OUTPUT_SCHEMA)
    if not with_metrics:
        res = res.select(*OUTPUT_COLUMNS)
    return res.sortWithinPartitions("conv_id", "turn_idx")


def metrics_sidecar(result_df: DataFrame) -> DataFrame:
    """Per-row lineage sidecar (FIXTURES.md §B metrics_sidecar shape):
    partition id + extraction metrics, written alongside the output."""
    return result_df.select(
        F.spark_partition_id().alias("partition_id"),
        "conv_id",
        "turn_idx",
        "status",
        "candidates_scored",
        "retries",
        "chars_in",
        "chars_kept",
    )


def metrics_rollup(result_df: DataFrame) -> DataFrame:
    """Aggregate metrics per status (plain DataFrame agg — no UDAF needed,
    SURVEY §2.8): row counts, total/avg chars in and kept, retries."""
    return (
        result_df.groupBy("status")
        .agg(
            F.count("*").alias("rows"),
            F.sum("chars_in").alias("total_chars_in"),
            F.sum("chars_kept").alias("total_chars_kept"),
            F.avg("chars_kept").alias("avg_chars_kept"),
            F.sum("retries").alias("total_retries"),
            F.sum("candidates_scored").alias("total_candidates"),
        )
        .orderBy("status")
    )
