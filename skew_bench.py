#!/usr/bin/env python
"""Skew evidence (SURVEY §6: "skew tail before/after salting").

Builds a deliberately skewed corpus — one conversation holding all the
giant documents, many small conversations — and runs the identical
extraction job with salt_buckets=1 (conv_id-only partitioning: the whole
giant conversation pins one task) vs salt_buckets=16 (turn-hash salt spreads
it).  Reports wall-clock and per-task p50/p99 from the Spark status API.

Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import pandas as pd

    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.corpus import make_article_html
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import TRANSCRIPTS_SCHEMA

    spark = build_spark(
        app_name="skew-bench", cores=16, shuffle_partitions=32,
        # the per-task percentiles come from the REST status API
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4901"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import urllib.request

    # the requested port may be taken (Spark then binds 4902+); read the
    # ACTUAL bound UI address so the percentiles come from THIS app
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
        """p50/p99/max task duration (ms) of the heaviest NEW stage (by
        executorRunTime — the extraction stage) completed since ``before``."""
        new = [s for k, s in _completed_stages().items() if k not in before]
        if not new:
            return {}
        stage = max(new, key=lambda s: s.get("executorRunTime", 0))
        tasks = _api(
            f"/applications/{app_id}/stages/{stage['stageId']}/"
            f"{stage['attemptId']}/taskList?length=2000"
        )
        durs = sorted(t["duration"] for t in tasks if "duration" in t)
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

    rows = []
    # the whale: one conversation, 240 giant documents
    for t in range(240):
        rows.append(
            ("conv-whale", t, "assistant",
             make_article_html(10_000 + t, n_paragraphs=120), None, 1_700_000_000 + t)
        )
    # the school: 600 small single-turn conversations
    for c in range(600):
        rows.append(
            (f"conv-{c:04d}", 0, "assistant",
             make_article_html(c, n_paragraphs=3), None, 1_700_000_000 + c)
        )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    df = spark.createDataFrame(pdf, TRANSCRIPTS_SCHEMA).cache()
    n = df.count()

    def run(salt_buckets: int) -> dict:
        extract_transcripts(df.limit(32), salt_buckets=salt_buckets).count()  # warm
        before = _completed_stages()
        t0 = time.perf_counter()
        extract_transcripts(df, salt_buckets=salt_buckets, num_partitions=32).filter(
            F.col("status") == "ok"
        ).count()
        dt = time.perf_counter() - t0
        return {"salt_buckets": salt_buckets, "seconds": round(dt, 2),
                "turns_per_sec": round(n / dt, 1),
                **_task_percentiles(before)}

    unsalted = run(1)
    salted = run(16)
    speedup = round(unsalted["seconds"] / salted["seconds"], 2)
    out = {
        "metric": "skew defusal via conv_id-salted repartition",
        "turns": n,
        "whale_turns": 240,
        "unsalted": unsalted,
        "salted": salted,
        "speedup": speedup,
    }
    print(json.dumps(out))

    def _row(r: dict) -> str:
        return (
            f"| salt_buckets={r['salt_buckets']} | {r['seconds']} | "
            f"{r['turns_per_sec']} | {r.get('task_p50_ms', '—')} | "
            f"{r.get('task_p99_ms', '—')} | {r.get('task_max_ms', '—')} |"
        )

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Skew run — 1 whale conversation (240 giant docs) + 600 small "
            f"({n} turns, 16 cores, 32 partitions)\n\n"
            f"Task percentiles are per-task durations of the extraction stage "
            f"from the Spark status API (BASELINE.md protocol step 3).\n\n"
            f"| variant | seconds | turns/sec | task p50 ms | task p99 ms | "
            f"task max ms |\n|---|---|---|---|---|---|\n"
            f"{_row(unsalted)}\n{_row(salted)}\n\n"
            f"**Salting speedup on the skewed corpus: {speedup}×** — the whale "
            f"conversation spreads over up to 16 partitions instead of pinning "
            f"one straggler task (the unsalted p99≈max straggler vs the "
            f"salted tail).\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
