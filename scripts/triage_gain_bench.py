#!/usr/bin/env python
"""Selectivity win of the JVM readerable triage gate (VERDICT r3 #3 /
round-4 bench row `extract_corpus_triaged`).

On the standard bench corpus the gate passes ~87% of turns, so it roughly
breaks even (its cost is one codegen'd regexp pass; the saving is the 13%
of python extraction it skips).  The deploy case is a LOW-readerable
corpus — web crawl sludge, tool logs, chat traffic around the articles —
where most rows never deserve a DOM parse.  This script builds that shape
deterministically (the bench corpus diluted 1:N with non-readerable noise
turns), times full vs triaged extraction in one session, and reports the
gate's recall against the exact DOM triage on the same corpus.

Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_PER_TURN = int(os.environ.get("TRIAGE_BENCH_NOISE", "3"))
N_CONVS = int(os.environ.get("TRIAGE_BENCH_CONVS", "1500"))


def main() -> None:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.sqltwins import triage_score_col
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import synthetic_transcripts
    from cl_readability_spark.pipeline.udfs import make_readerable_udf

    spark = build_spark(app_name="triage-gain", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    articles = synthetic_transcripts(spark, N_CONVS, seed=42)
    # deterministic non-readerable noise: tool-log lines keyed off the
    # article rows (no <p> blocks, no sentence structure — the exact
    # traffic a transcript table carries around its article turns)
    noise = (
        articles.select("conv_id", "turn_idx", "ts")
        .crossJoin(spark.range(NOISE_PER_TURN).select(F.col("id").alias("_n")))
        .select(
            F.concat(F.lit("noise-"), "conv_id").alias("conv_id"),
            (F.col("turn_idx") * NOISE_PER_TURN + F.col("_n"))
            .cast("int")
            .alias("turn_idx"),
            F.lit("tool").alias("role"),
            F.concat(
                F.lit("$ exit_code=0 took_ms="),
                (F.col("turn_idx") * 7 + F.col("_n")).cast("string"),
                F.lit(" stdout: ok bytes_written="),
                (F.col("turn_idx") * 131 + F.col("_n") * 17).cast("string"),
            ).alias("text"),
            F.lit("bash").alias("tool"),
            F.col("ts"),
        )
    )
    corpus = articles.unionByName(noise).cache()
    n = corpus.count()
    n_articles = articles.count()

    extract_transcripts(corpus.limit(64), salt_buckets=4).count()  # warm

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return round(time.perf_counter() - t0, 2), out

    full_s, full_ok = timed(
        lambda: extract_transcripts(corpus, salt_buckets=16, num_partitions=32)
        .filter(F.col("status") == "ok")
        .count()
    )
    triaged_s, triaged_ok = timed(
        lambda: extract_transcripts(
            corpus, salt_buckets=16, num_partitions=32, prefilter_readerable="jvm"
        )
        .filter(F.col("status") == "ok")
        .count()
    )
    # gate quality on this corpus: agreement with the exact DOM triage
    flags = corpus.select(
        (triage_score_col(F.col("text")) > 20).alias("j"),
        make_readerable_udf()(F.col("text")).alias("e"),
    ).cache()
    agree = flags.filter(F.col("j") == F.col("e")).count() / n
    noise_passed = (
        corpus.filter(F.col("conv_id").startswith("noise-"))
        .filter(triage_score_col(F.col("text")) > 20)
        .count()
    )

    out = {
        "metric": "triaged vs full extraction on a low-readerable corpus",
        "turns": n,
        "article_turns": n_articles,
        "noise_turns": n - n_articles,
        "full_seconds": full_s,
        "triaged_seconds": triaged_s,
        "speedup": round(full_s / triaged_s, 2),
        "full_ok_rows": full_ok,
        "triaged_ok_rows": triaged_ok,
        "gate_agreement_with_exact": round(agree, 4),
        "noise_rows_passing_gate": noise_passed,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Triage gate on a low-readerable corpus — {n} turns "
            f"({n_articles} article + {n - n_articles} tool-noise, 16 cores)\n\n"
            f"| variant | seconds | ok rows |\n|---|---|---|\n"
            f"| full extraction | {full_s} | {full_ok} |\n"
            f"| JVM triage gate + extraction | {triaged_s} | {triaged_ok} |\n\n"
            f"**Speedup {out['speedup']}×** — the codegen'd regexp gate "
            f"rejects the noise rows before any python worker sees them "
            f"({noise_passed} of {n - n_articles} noise rows leak through; "
            f"per-turn agreement with the exact DOM triage "
            f"{out['gate_agreement_with_exact']:.2%}).  On the all-article "
            f"bench corpus the same gate is ~break-even "
            f"(`extract_corpus_triaged` vs `extract_corpus` bench rows) — "
            f"the win scales with the non-article fraction, which at the "
            f"10^12-turn transcript target dominates.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
