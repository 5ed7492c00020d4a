#!/usr/bin/env python
"""Streaming near-dup gate throughput — JVM window-aggregation variant
vs the python-stateful reference, on the 1M-turn planted corpus.

Protocol (BENCH/BASELINE.md "streaming near-dup gate"):
  input = the sustained-scale transcript corpus + 5% planted copies
  (1,070,811 turns), projected to (doc_id, text, ts).  The JVM gate
  batches ownership per event-time window, so the run is two trigger
  invocations: (1) the corpus, (2) a one-row horizon batch whose event
  time closes the corpus window — the window's flag rows are emitted
  (and sunk) during run 2, so BOTH walls count toward throughput.
  Kept set reduced with first-window-wins (near_dup_kept_ids_windowed).

Reports one JSON line: rows, wall per phase, turns/s, kept/dropped
counts, and the ratio vs the recorded python-state reference gate
(2,252 turns/s at the same corpus, round 4).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="/tmp/million_dups_corpus.parquet")
    p.add_argument("--workdir", default="/tmp/gate_jvm_bench")
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--shuffle-partitions", type=int, default=64)
    p.add_argument("--reference-turns-per-sec", type=float, default=2252.0)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.streaming import (
        near_dup_kept_ids_windowed,
        streaming_near_dup_flags_jvm,
    )

    spark = build_spark(
        app_name="streaming-gate-bench",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )

    shutil.rmtree(args.workdir, ignore_errors=True)
    inp = os.path.join(args.workdir, "in")
    out = os.path.join(args.workdir, "out")
    cp = os.path.join(args.workdir, "cp")

    # stage the corpus as (doc_id, text, ts): a dense deterministic id
    # (conv/turn-derived, unique by construction) and one shared event
    # time — the whole corpus lands in a single ownership window, the
    # exact per-ingestion-window batch-gate shape
    t_stage = time.monotonic()
    corpus = spark.read.parquet(args.corpus)
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    # xxhash64 over both key columns: unique across the corpus (asserted
    # below; 1M keys over a 64-bit space — collision odds ~5e-8)
    staged = corpus.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        "text",
        F.lit(t0).alias("ts"),
    )
    staged.write.parquet(os.path.join(inp, "b1"))
    n_rows = spark.read.parquet(os.path.join(inp, "b1")).count()
    n_distinct = (
        spark.read.parquet(os.path.join(inp, "b1")).select("doc_id").distinct().count()
    )
    assert n_rows == n_distinct, f"id collision: {n_rows} rows, {n_distinct} ids"
    stage_wall = time.monotonic() - t_stage

    # run 1: the corpus through the gate (window stays open — state built)
    t1 = time.monotonic()
    q = streaming_near_dup_flags_jvm(spark, inp + "/*", out, cp)
    # a False return means the budget elapsed mid-stream — the numbers
    # below would describe a partially-gated corpus; fail instead
    assert q.awaitTermination(3600), "ingest run exceeded its time budget"
    q.stop()
    wall_ingest = time.monotonic() - t1

    # run 2: horizon batch closes the corpus window → flag rows emitted
    horizon = datetime.datetime(2026, 1, 1, 15, 0, 0)
    spark.createDataFrame(
        [(-1, "horizon sentinel row", horizon)],
        "doc_id long, text string, ts timestamp",
    ).write.parquet(os.path.join(inp, "b2"))
    t2 = time.monotonic()
    q = streaming_near_dup_flags_jvm(spark, inp + "/*", out, cp)
    assert q.awaitTermination(3600), "flush run exceeded its time budget"
    q.stop()
    wall_flush = time.monotonic() - t2

    t3 = time.monotonic()
    kept = near_dup_kept_ids_windowed(spark, out).count()
    wall_reduce = time.monotonic() - t3

    wall_gate = wall_ingest + wall_flush
    tps = n_rows / wall_gate
    result = {
        "metric": "streaming_near_dup_gate_jvm",
        "rows": n_rows,
        "stage_wall_sec": round(stage_wall, 1),
        "wall_ingest_sec": round(wall_ingest, 1),
        "wall_flush_sec": round(wall_flush, 1),
        "wall_reduce_sec": round(wall_reduce, 1),
        "turns_per_sec": round(tps, 1),
        "kept": kept,
        "dropped": n_rows - kept,
        "vs_reference_gate": round(tps / args.reference_turns_per_sec, 2),
        "cores": args.cores,
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
