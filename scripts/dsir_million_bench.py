#!/usr/bin/env python
"""DSIR at 1M turns (BENCH/BASELINE.md "Round-7 DSIR scale evidence").

Runs dsir_sample over the pinned 1M transcript corpus
(scripts/make_million_corpora.py → /tmp/million_corpus.parquet):
row id = conv_id:turn_idx, target = turns of a deterministic ~2%
conversation subset (xxhash64(conv_id) % 50 == 0), source = the corpus
itself (the paper's raw-corpus setting — so the bench includes BOTH fit
passes AND the weight pass), k = 10,000 via Gumbel-top-k.  min-of-N
reps in one session, first rep reported separately (cold JVM/broadcast).

Usage: python scripts/dsir_million_bench.py [--reps 2] [--cores 32]
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
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.selection import dsir_sample
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        "dsir-1m", cores=args.cores, shuffle_partitions=max(args.cores, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(CORPUS)

    def project(frame):
        return frame.select(
            F.concat_ws(
                ":", "conv_id", F.col("turn_idx").cast("string")
            ).alias("doc_id"),
            "text",
        )

    docs = project(raw)
    n = docs.count()
    target = project(
        raw.filter(F.pmod(F.xxhash64(F.col("conv_id")), F.lit(50)) == 0)
    )

    times, picked = [], 0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        picked = dsir_sample(
            docs, target, k=10_000, id_col="doc_id", text_col="text"
        ).count()
        times.append(round(time.perf_counter() - t0, 2))
    print(
        json.dumps(
            {
                "rows": n,
                "cores": args.cores,
                "k": 10_000,
                "picked": picked,
                "reps_sec": times,
                "sec": min(times),
                "turns_per_sec": round(n / min(times), 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
