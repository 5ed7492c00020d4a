#!/usr/bin/env python
"""1M-scale probe of the COMPOSED real-subword shard chain (round-7
verdict task 5): bpe_fit (once) → bpe_encode → token_chunks (exact
subword windows) → pack_sequences on n_chunk_tokens, forced end to end
by one aggregation over the packs.  The round-7 record benched
bpe_encode alone and doc_chunks with the regex counter; this is the
deployment path (one Arrow stage + one pack exchange, plan-goldened in
tests/test_packing.py).  Prints one JSON line; recorded in
BENCH/BASELINE.md.

Usage: python scripts/bpe_chain_million_bench.py [--reps 2] [--cores 32]
       [--merges 8000] [--max-tokens 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CORPUS = "/tmp/million_corpus.parquet"


def main(argv) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--merges", type=int, default=8000)
    p.add_argument("--max-tokens", type=int, default=512)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.bpe import bpe_encode, bpe_fit
    from cl_readability_spark.functions.packing import (
        pack_sequences,
        token_chunks,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        "bpe-chain-1m", cores=args.cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the 1M corpus is transcript-shaped (conv_id, turn_idx, ..., text):
    # one doc per turn, keyed like the pipeline row key
    docs = spark.read.parquet(CORPUS).select(
        F.concat_ws("-", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    n_turns = docs.count()

    t0 = time.perf_counter()
    merges = bpe_fit(docs, n_merges=args.merges)
    fit_s = time.perf_counter() - t0

    def chain():
        encoded = bpe_encode(docs, merges)
        chunks = token_chunks(
            encoded, max_tokens=args.max_tokens, stride=args.max_tokens
        )
        packed = pack_sequences(
            chunks.select(
                F.concat_ws(
                    "-", F.col("doc_id"), F.col("chunk_idx")
                ).alias("doc_id"),
                F.col("n_chunk_tokens").alias("n_tokens"),
            ),
            max_tokens=2048,
            num_partitions=128,
        )
        return packed.agg(
            F.count("*").alias("chunks"),
            F.count_distinct("pack_id").alias("packs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum(F.col("oversize").cast("long")).alias("oversize"),
        ).collect()[0]

    best, row = None, None
    for _ in range(max(1, args.reps)):
        t0 = time.perf_counter()
        row = chain()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best

    print(
        json.dumps(
            {
                "probe": "bpe_chain_1m",
                "n_turns": n_turns,
                "n_merges": len(merges),
                "max_tokens": args.max_tokens,
                "fit_sec": round(fit_s, 2),
                "chain_sec_min": round(best, 2),
                "chain_turns_per_sec": round(n_turns / best, 1),
                "tokens": row["tokens"],
                "tokens_per_sec": round(row["tokens"] / best, 1),
                "chunks": row["chunks"],
                "packs": row["packs"],
                "oversize": row["oversize"],
                "cores": args.cores,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
