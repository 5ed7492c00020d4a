#!/usr/bin/env python
"""1M-scale BPE probe: fit (one distributed word-count pass + the
driver-side merge loop) and encode (stateless Arrow stage) over the
canonical 1M corpus (/tmp/million_corpus.parquet).  Prints one JSON
line; recorded in BENCH/BASELINE.md."""

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

    from cl_readability_spark.functions.bpe import bpe_encode, bpe_fit
    from cl_readability_spark.pipeline.session import build_spark

    cores = int(os.environ.get("BPE_BENCH_CPUS", "32"))
    n_merges = int(os.environ.get("BPE_BENCH_MERGES", "8000"))

    spark = build_spark(
        app_name="bpe-bench", cores=cores, shuffle_partitions=max(cores, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS).select("text")
    n_turns = docs.count()

    t0 = time.perf_counter()
    merges = bpe_fit(docs, n_merges=n_merges)
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    row = (
        bpe_encode(docs, merges)
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.size("bpe_tokens")).alias("tokens"),
        )
        .collect()[0]
    )
    enc_s = time.perf_counter() - t0
    print(json.dumps({
        "probe": "bpe_1m",
        "n_turns": n_turns,
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "fit_sec": round(fit_s, 2),
        "encode_sec": round(enc_s, 2),
        "encode_turns_per_sec": round(n_turns / enc_s, 1),
        "tokens": row["tokens"],
        "tokens_per_turn": round(row["tokens"] / n_turns, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
