#!/usr/bin/env python
"""Scale + whale-conversation evidence for conversation_flags
(functions/transcript_quality.py).

- **throughput**: N turns (default 1M) of closed-form JVM-built
  transcripts (20-turn conversations, user/assistant/tool/assistant
  cycles, ~1% planted pathologies of each kind) through
  conversation_flags, forced by summing every output column.  Input is
  persisted and counted before timing.  Min-of-2.
- **whale**: the same corpus with conversation 0 blown up to
  WHALE_TURNS turns.  Both the adjacency window and the aggregation key
  on conv_id, so the whale can amplify only ITS OWN task — pooled task
  percentiles document p50/p99 at the normal cost with only task_max
  carrying the whale.

Prints one JSON line per probe; recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.transcript_quality import (
        conversation_flags,
    )
    from cl_readability_spark.pipeline.session import build_spark

    n_turns = int(os.environ.get("TQ_BENCH_TURNS", "1000000"))
    whale_turns = int(os.environ.get("TQ_WHALE_TURNS", "200000"))
    turns_per_conv = 20
    cores = int(os.environ.get("TQ_BENCH_CPUS", "32"))

    spark = build_spark(
        app_name="transcript-quality-bench", cores=cores,
        shuffle_partitions=max(cores, 32),
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4911"},
    )
    spark.sparkContext.setLogLevel("ERROR")

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
        new = [s for k, s in _completed_stages().items() if k not in before]
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

    def build_corpus(n: int, whale: bool):
        base = spark.range(n)
        tid = F.col("id")
        if whale:
            # conversation 0 owns the first `whale_turns` rows; the rest
            # fall into normal-size convs numbered from 10**9
            conv_num = F.when(
                tid < whale_turns, F.lit(0)
            ).otherwise(
                F.lit(1_000_000_000)
                + F.floor((tid - whale_turns) / turns_per_conv)
            )
            idx = F.when(tid < whale_turns, tid).otherwise(
                (tid - whale_turns) % turns_per_conv
            )
        else:
            conv_num = F.floor(tid / turns_per_conv)
            idx = tid % turns_per_conv
        pos = idx % 4
        role = F.when(
            F.pmod(F.xxhash64(tid, F.lit("viol")), 97) == 0, F.lit("user")
        ).otherwise(
            F.element_at(
                F.array(
                    F.lit("user"),
                    F.lit("assistant"),
                    F.lit("tool"),
                    F.lit("assistant"),
                ),
                (pos + 1).cast("int"),
            )
        )
        text = F.when(
            F.pmod(F.xxhash64(tid, F.lit("empty")), 97) == 1, F.lit(" \t ")
        ).otherwise(
            F.concat(
                F.lit("turn body "),
                tid.cast("string"),
                F.lit(" with some plausible sentence content here t"),
                F.pmod(F.xxhash64(tid), 997).cast("string"),
            )
        )
        ep = (
            F.lit(1_600_000_000)
            + idx * 30
            - F.when(
                F.pmod(F.xxhash64(tid, F.lit("late")), 211) == 2, F.lit(90)
            ).otherwise(F.lit(0))
        )
        df = (
            base.select(
                conv_num.cast("string").alias("conv_id"),
                idx.cast("int").alias("turn_idx"),
                role.alias("role"),
                text.alias("text"),
                F.timestamp_seconds(ep).alias("ts"),
            )
            .repartition(max(cores, 32))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        df.count()
        return df

    def run_once(df):
        t0 = time.perf_counter()
        row = (
            conversation_flags(df)
            .agg(
                F.count("*").alias("convs"),
                F.sum(F.col("conv_ok").cast("long")).alias("ok"),
                F.sum("role_violations").alias("viol"),
                F.sum("total_chars").alias("chars"),
                F.sum("n_empty_turns").alias("empty"),
                F.sum(F.col("ts_monotonic").cast("long")).alias("mono"),
                F.sum("duration_s").alias("dur"),
            )
            .collect()[0]
        )
        return time.perf_counter() - t0, row.asDict()

    corpus = build_corpus(n_turns, whale=False)
    walls, stats = [], None
    for _ in range(2):
        w, stats = run_once(corpus)
        walls.append(round(w, 2))
    wall = min(walls)
    print(json.dumps({
        "probe": "throughput",
        "n_turns": n_turns,
        "walls_sec": walls,
        "wall_sec": wall,
        "turns_per_sec": round(n_turns / wall, 1),
        "stats": stats,
    }))
    corpus.unpersist()

    for whale, tag in ((False, "uniform"), (True, "whale")):
        df = build_corpus(n_turns, whale=whale)
        before = _completed_stages()
        w, stats = run_once(df)
        pcts = _task_percentiles(before)
        print(json.dumps({
            "probe": f"whale-{tag}",
            "n_turns": n_turns,
            "whale_turns": whale_turns if whale else turns_per_conv,
            "wall_sec": round(w, 2),
            **pcts,
            "stats": stats,
        }))
        df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
