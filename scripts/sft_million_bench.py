#!/usr/bin/env python
"""Scale + skew evidence for the round-8 transcript last-mile ops:

- **sft-throughput**: N turns (default 1M) of closed-form JVM-built
  20-turn conversations (user/assistant/tool/assistant cycles, ~40-word
  turns) through ``sft_examples`` (budget 256), forced by summing
  context_tokens AND the rendered context_text bytes (count() alone
  would still run the Arrow stage, but the byte sum pins the string
  assembly in the measurement).  Input persisted + counted before
  timing.  Min-of-2.
- **sft-whale**: conversation 0 blown up to WHALE_TURNS turns.  The
  assembly is keyed by conv_id only (one exchange, one Arrow stage), so
  the whale can amplify only ITS OWN task — pooled task percentiles
  document p50/p99 at the normal cost with only task_max carrying the
  whale.
- **leak-throughput**: 1M-row split corpus (12/2/2-sixteenths
  train/val/test via the split_assign md5 recipe) with every 100th
  train row copied into test, through ``split_leakage`` (exact mode).
- **leak-hotkey**: the same corpus with ONE boilerplate text shared by
  10% of all rows across every split — the protected-side fingerprint
  aggregate collapses map-side (collect_set is partial-aggregatable)
  and the train-side fan-out is a join, so AQE's skew-join handles it;
  task percentiles document the bound.

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

    from cl_readability_spark.functions.decontam import split_leakage
    from cl_readability_spark.functions.sft import sft_examples
    from cl_readability_spark.pipeline.session import build_spark

    n_turns = int(os.environ.get("SFT_BENCH_TURNS", "1000000"))
    whale_turns = int(os.environ.get("SFT_WHALE_TURNS", "200000"))
    turns_per_conv = 20
    cores = int(os.environ.get("SFT_BENCH_CPUS", "32"))

    spark = build_spark(
        app_name="sft-million-bench", cores=cores,
        shuffle_partitions=max(cores, 32),
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4912"},
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

    filler = " ".join(f"w{i}" for i in range(36))

    def build_transcripts(n: int, whale: bool):
        base = spark.range(n)
        tid = F.col("id")
        if whale:
            conv_num = F.when(tid < whale_turns, F.lit(0)).otherwise(
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
        role = F.element_at(
            F.array(
                F.lit("user"),
                F.lit("assistant"),
                F.lit("tool"),
                F.lit("assistant"),
            ),
            (pos + 1).cast("int"),
        )
        text = F.concat(
            F.lit("turn body "),
            tid.cast("string"),
            F.lit(" " + filler + " t"),
            F.pmod(F.xxhash64(tid), 997).cast("string"),
        )
        df = (
            base.select(
                conv_num.cast("string").alias("conv_id"),
                idx.cast("long").alias("turn_idx"),
                role.alias("role"),
                text.alias("text"),
            )
            .repartition(max(cores, 32))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        df.count()
        return df

    def run_sft(df):
        t0 = time.perf_counter()
        row = (
            sft_examples(
                df,
                max_context_tokens=256,
                num_partitions=max(cores, 32),
            )
            .agg(
                F.count("*").alias("examples"),
                F.sum("context_tokens").alias("ctx_tokens"),
                F.sum(F.length("context_text")).alias("ctx_bytes"),
                F.sum(F.col("truncated").cast("long")).alias("truncated"),
            )
            .collect()[0]
        )
        return time.perf_counter() - t0, row.asDict()

    corpus = build_transcripts(n_turns, whale=False)
    walls, stats = [], None
    for _ in range(2):
        w, stats = run_sft(corpus)
        walls.append(round(w, 2))
    wall = min(walls)
    print(json.dumps({
        "probe": "sft-throughput",
        "n_turns": n_turns,
        "walls_sec": walls,
        "wall_sec": wall,
        "turns_per_sec": round(n_turns / wall, 1),
        "stats": stats,
    }))
    corpus.unpersist()

    for whale, tag in ((False, "uniform"), (True, "whale")):
        df = build_transcripts(n_turns, whale=whale)
        before = _completed_stages()
        w, stats = run_sft(df)
        pcts = _task_percentiles(before)
        print(json.dumps({
            "probe": f"sft-{tag}",
            "n_turns": n_turns,
            "whale_turns": whale_turns if whale else turns_per_conv,
            "wall_sec": round(w, 2),
            **pcts,
            "stats": stats,
        }))
        df.unpersist()

    # --- split_leakage at 1M ---
    n_docs = int(os.environ.get("LEAK_BENCH_DOCS", "1000000"))

    def build_split_corpus(n: int, hotkey: bool):
        base = spark.range(n)
        did = F.col("id")
        bucket = F.substring(F.md5(did.cast("string")), 1, 1)
        split = (
            F.when(bucket.isin("c", "d"), "val")
            .when(bucket.isin("e", "f"), "test")
            .otherwise("train")
        )
        text = F.concat(
            F.lit("document body "),
            did.cast("string"),
            F.lit(" " + filler),
        )
        if hotkey:
            text = F.when(
                F.pmod(did, F.lit(10)) == 0, F.lit("hot boilerplate " + filler)
            ).otherwise(text)
        rows = base.select(did.alias("doc_id"), split.alias("split"), text.alias("text"))
        planted = (
            base.filter((did % 100 == 0) & ~bucket.isin("c", "d", "e", "f"))
            .select(
                (did + 10_000_000).alias("doc_id"),
                F.lit("test").alias("split"),
                text.alias("text"),
            )
        )
        df = (
            rows.unionByName(planted)
            .repartition(max(cores, 32))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        df.count()
        return df

    for hotkey, tag in ((False, "throughput"), (True, "hotkey")):
        df = build_split_corpus(n_docs, hotkey=hotkey)
        before = _completed_stages()
        t0 = time.perf_counter()
        row = (
            split_leakage(df)
            .agg(
                F.count("*").alias("leaks"),
                F.sum("n_protected_matches").alias("matches"),
            )
            .collect()[0]
        )
        w = time.perf_counter() - t0
        pcts = _task_percentiles(before)
        print(json.dumps({
            "probe": f"leak-{tag}",
            "n_docs": n_docs,
            "wall_sec": round(w, 2),
            "docs_per_sec": round(n_docs / w, 1),
            **pcts,
            "stats": row.asDict(),
        }))
        df.unpersist()

    # --- composed sft_dataset at 1M: conversation gate (all convs pass
    # by construction — the probe prices the gate, dedup, and split
    # stages on top of plain assembly) ---
    from cl_readability_spark.functions.sft import sft_dataset

    df = build_transcripts(n_turns, whale=False)
    t0 = time.perf_counter()
    row = (
        sft_dataset(
            df,
            ts_col=None,
            max_context_tokens=256,
            conv_gate_opts={"require_user_start": False},
            num_partitions=max(cores, 32),
        )
        .agg(
            F.count("*").alias("examples"),
            F.count_distinct("split").alias("splits"),
            F.sum("context_tokens").alias("ctx_tokens"),
        )
        .collect()[0]
    )
    w = time.perf_counter() - t0
    print(json.dumps({
        "probe": "sft-dataset-composed",
        "n_turns": n_turns,
        "wall_sec": round(w, 2),
        "turns_per_sec": round(n_turns / w, 1),
        "stats": row.asDict(),
    }))
    df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
