#!/usr/bin/env python
"""Scale + skew evidence for substring_dedup (ExactSubstr, Lee et al.
2021), following the round-7 sustained-session protocol:

1. Calibration row (min-of-3 extraction of synthetic_transcripts(400,
   seed 42), salt 16, 32 partitions) — the cross-round window-quality
   denominator.
2. 1M-turn run over the canonical corpus (/tmp/million_corpus.parquet,
   the BASELINE.md recipe — run scripts/make_million_corpora.py first)
   at the paper's k=50 and a tighter k=20, min-of-2, full reassembly
   forced (sum of dedup_text lengths — Catalyst prunes unreferenced
   aggregate outputs), with kept/removed token counts printed for
   cross-round determinism.
3. Hot-gram skew A/B: ONE 25-token boilerplate sentence planted in
   EVERY doc of a 200k-doc corpus (~6 duplicated gram keys with 200k
   occurrences each at k=20 — the Zipfian pathology), dup_join_salt=1
   vs the default 8, ALTERNATING reps in one session, pooled per-task
   p50/p99/max from the status API, output counts asserted identical.

Appends one JSON line to stdout; prose goes to BENCH/BASELINE.md.
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
HOT_RUN = (
    "please enable javascript to view the comments powered by disqus "
    "this content requires a modern browser with scripting support "
    "thank you for understanding"
)  # 25 tokens


def main() -> None:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.dedup import substring_dedup
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import (
        synthetic_transcripts,
    )

    n_skew_docs = int(os.environ.get("SSD_SKEW_DOCS", "200000"))
    # ~390M exploded token rows at 1M turns: the doc window + gram agg
    # need real execution memory — 8g/32-task default OOMs ("unable to
    # acquire 16384 bytes"); 48g + 256 shuffle partitions holds
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = build_spark(
        app_name="substring-dedup-bench",
        cores=32,
        shuffle_partitions=256,
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4909"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    import urllib.request

    ui_base = spark.sparkContext.uiWebUrl

    def _api(path: str):
        with urllib.request.urlopen(f"{ui_base}/api/v1{path}") as r:
            return json.load(r)

    app_id = _api("/applications")[0]["id"]

    def _completed_stages() -> dict:
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _api(f"/applications/{app_id}/stages?status=complete")
        }

    def _task_percentiles(before: dict) -> dict:
        new = [
            s for k, s in _completed_stages().items() if k not in before
        ]
        durs: list[int] = []
        for stage in new:
            tasks = _api(
                f"/applications/{app_id}/stages/{stage['stageId']}/"
                f"{stage['attemptId']}/taskList?length=2000"
            )
            durs.extend(t["duration"] for t in tasks if "duration" in t)
        durs.sort()
        if not durs:
            return {}

        def pct(p: float) -> int:
            return durs[min(len(durs) - 1, int(p * (len(durs) - 1) + 0.5))]

        return {
            "n_tasks": len(durs),
            "task_p50_ms": pct(0.50),
            "task_p99_ms": pct(0.99),
            "task_max_ms": durs[-1],
        }

    # --- 0. calibration row ---
    cal_src = synthetic_transcripts(spark, 400, seed=42).persist()
    cal_src.count()
    extract_transcripts(cal_src.limit(64), salt_buckets=16).count()
    cal = []
    for _ in range(3):
        t0 = time.perf_counter()
        extract_transcripts(
            cal_src, salt_buckets=16, num_partitions=32
        ).select("status").groupBy("status").count().count()
        cal.append(time.perf_counter() - t0)
    out["calibration_extract400_min_s"] = round(min(cal), 2)
    cal_src.unpersist()

    # --- 1. 1M-turn substring dedup over raw transcript HTML ---
    src = spark.read.parquet(CORPUS)
    n_turns = src.count()
    out["turns"] = n_turns
    docs = src.select(
        F.concat_ws(
            ":", "conv_id", F.col("turn_idx").cast("string")
        ).alias("doc_id"),
        "text",
    )
    # k=20 carries the corpus's real dup mass (min-of-2); k=50 — the
    # paper's threshold — finds no >=50-token duplicated run in the
    # synthetic corpus (verified by the counts), so one shot records the
    # scan-everything-remove-nothing cost
    for k, reps in ((20, 2), (50, 1)):
        best, counts = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            row = (
                substring_dedup(docs, k=k)
                .agg(
                    F.count("*").alias("docs"),
                    F.sum("n_tokens").alias("toks"),
                    F.sum("n_kept_tokens").alias("kept"),
                    F.sum(F.length("dedup_text")).alias("bytes"),
                )
                .collect()[0]
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            counts = [row.docs, row.toks, row.kept, row.bytes]
        out[f"ssd_1m_k{k}_min_s"] = round(best, 1)
        out[f"ssd_1m_k{k}_turns_per_s"] = round(n_turns / best, 0)
        out[f"ssd_1m_k{k}_counts"] = counts
        out[f"ssd_1m_k{k}_dup_token_pct"] = round(
            100.0 * (counts[1] - counts[2]) / counts[1], 2
        )

    # --- 2. hot-gram skew A/B (salt 1 vs 8), alternating ---
    skew = (
        spark.range(n_skew_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat(F.lit("title"), F.col("id")),
                F.lit(HOT_RUN),
                *[
                    F.concat(F.lit(f"body{j}w"), F.col("id"))
                    for j in range(20)
                ],
            ).alias("text"),
        )
        .repartition(64)
        .persist()
    )
    skew.count()

    def run(salt: int):
        before = _completed_stages()
        t0 = time.perf_counter()
        row = (
            substring_dedup(skew, k=20, dup_join_salt=salt)
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_kept_tokens").alias("kept"),
                F.sum(F.length("dedup_text")).alias("bytes"),
            )
            .collect()[0]
        )
        dt = time.perf_counter() - t0
        return dt, [row.docs, row.kept, row.bytes], _task_percentiles(before)

    results: dict[int, list] = {1: [], 8: []}
    counts_seen = set()
    run(8)  # warm
    for _ in range(2):
        for salt in (1, 8):
            dt, counts, pcts = run(salt)
            results[salt].append((dt, pcts))
            counts_seen.add(tuple(counts))
    assert len(counts_seen) == 1, counts_seen
    out["skew_docs"] = n_skew_docs
    out["skew_counts"] = list(counts_seen.pop())
    for salt in (1, 8):
        best = min(results[salt], key=lambda r: r[0])
        out[f"skew_salt{salt}_min_s"] = round(best[0], 2)
        out[f"skew_salt{salt}_task_pcts"] = best[1]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
