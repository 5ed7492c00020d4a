#!/usr/bin/env python
"""Round-7 1M-turn sustained reruns, one session, with the calibration
row the round-6 VERDICT asked for (#8): every sustained session now
opens with a fixed cheap job (min-of-3 extraction of
synthetic_transcripts(400, seed 42), salt 16, 32 partitions) so
cross-round wall-clocks carry their own window-quality denominator.

Then, against /tmp/million_corpus.parquet (the BASELINE.md recipe:
synthetic_transcripts(40_000, seed=42).repartition(128)):
- extraction min-of-2 (metrics_rollup forced) + the chars_in/chars_kept
  byte-determinism check against the 4-round chain;
- gopher_flags min-of-2 (round-7 fully-codegen formulation; r6 burned
  the interpreted alpha HOF at 23.8 s);
- line_dedup min-of-2, reassembly-forced AND counts-only (round-7
  skew-safe agg+join formulation vs r6's window at 26.4 s / 19.8 s),
  with the kept/dropped line counts asserted for determinism.

Appends one JSON line to stdout; prose goes to BENCH/BASELINE.md by
hand afterwards.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CORPUS = "/tmp/million_corpus.parquet"


def main() -> None:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.curation import gopher_flags
    from cl_readability_spark.functions.dedup import line_dedup
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.job import metrics_rollup
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import (
        synthetic_transcripts,
    )

    spark = build_spark(
        app_name="million-rerun-r7", cores=32, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- 0. calibration row (VERDICT r6 #8) ---
    cal_src = synthetic_transcripts(spark, 400, seed=42).persist()
    cal_src.count()
    extract_transcripts(cal_src.limit(64), salt_buckets=16).count()  # warm
    cal = []
    for _ in range(3):
        t0 = time.perf_counter()
        extract_transcripts(
            cal_src, salt_buckets=16, num_partitions=32
        ).select("status").groupBy("status").count().count()
        cal.append(time.perf_counter() - t0)
    out["calibration_extract400_min_s"] = round(min(cal), 2)
    out["calibration_reps_s"] = [round(c, 2) for c in cal]
    cal_src.unpersist()

    # --- corpus (BASELINE.md recipe; reuse if already generated) ---
    gen = True
    if os.path.isdir(CORPUS):
        try:
            n = spark.read.parquet(CORPUS).count()
            gen = n != 1_019_872
        except Exception:  # noqa: BLE001
            gen = True
    if gen:
        t0 = time.perf_counter()
        synthetic_transcripts(spark, 40_000, seed=42).repartition(
            128
        ).write.mode("overwrite").parquet(CORPUS)
        out["corpus_gen_s"] = round(time.perf_counter() - t0, 1)
    src = spark.read.parquet(CORPUS)
    n_turns = src.count()
    out["turns"] = n_turns

    # --- 1. extraction min-of-2 + byte determinism ---
    extract_transcripts(src.limit(64), salt_buckets=16).count()  # warm
    best, chars = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        rows = metrics_rollup(
            extract_transcripts(src, salt_buckets=16, num_partitions=128)
        ).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        chars = (
            sum(r.total_chars_in or 0 for r in rows),
            sum(r.total_chars_kept or 0 for r in rows),
        )
    out["extract_1m_min_s"] = round(best, 1)
    out["extract_1m_turns_per_s"] = round(n_turns / best, 0)
    out["chars_in"], out["chars_kept"] = chars
    out["chars_deterministic_vs_r2_r4_r5_r6"] = chars == (
        3_547_355_036,
        2_756_003_140,
    )

    # --- 2. gopher_flags min-of-2 (fully codegen since r7) ---
    gopher_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        row = (
            gopher_flags(src, text_col="text")
            .agg(
                F.sum(F.col("gopher_ok").cast("long")).alias("ok"),
                F.sum("n_words").alias("w"),
                F.sum("n_alpha_words").alias("a"),
                F.sum("n_stopwords").alias("s"),
            )
            .collect()[0]
        )
        dt = time.perf_counter() - t0
        gopher_best = dt if gopher_best is None else min(gopher_best, dt)
    out["gopher_1m_min_s"] = round(gopher_best, 1)
    out["gopher_1m_turns_per_s"] = round(n_turns / gopher_best, 0)
    out["gopher_ok_docs"] = row.ok
    out["gopher_sums"] = [row.w, row.a, row.s]

    # --- 3. line_dedup min-of-2 (r7 agg+join formulation) ---
    docs = src.select(
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        # EXACT r6 recipe ("</p>" -> "</p>\n") so the line/drop counts
        # are comparable round-over-round
        F.replace(F.col("text"), F.lit("</p>"), F.lit("</p>\n")).alias(
            "text"
        ),
    )
    ld_full, ld_counts = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        row = (
            line_dedup(docs)
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_lines").alias("lines"),
                F.sum("n_kept_lines").alias("kept"),
                F.sum(F.length("deduped_text")).alias("bytes"),
            )
            .collect()[0]
        )
        dt = time.perf_counter() - t0
        ld_full = dt if ld_full is None else min(ld_full, dt)
    out["line_dedup_1m_full_min_s"] = round(ld_full, 1)
    out["line_dedup_1m_turns_per_s"] = round(n_turns / ld_full, 0)
    out["line_dedup_counts"] = [row.docs, row.lines, row.kept, row.bytes]
    for _ in range(2):
        t0 = time.perf_counter()
        line_dedup(docs).agg(
            F.count("*"), F.sum("n_lines"), F.sum("n_kept_lines")
        ).collect()
        dt = time.perf_counter() - t0
        ld_counts = dt if ld_counts is None else min(ld_counts, dt)
    out["line_dedup_1m_counts_only_min_s"] = round(ld_counts, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
