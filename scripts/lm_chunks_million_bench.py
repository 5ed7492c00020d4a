#!/usr/bin/env python
"""1M-turn scale evidence for round-7's doc_chunks and lm_perplexity.

Over the pinned 1M transcript corpus (scripts/make_million_corpora.py
→ /tmp/million_corpus.parquet, raw ~3 KB HTML turns):

- ``doc_chunks``: max_tokens=512, stride=448 (overlapping), forced via
  count + sum(n_chunk_tokens) + sum(length(chunk_text)).
- ``lm_perplexity``: model fit on a deterministic ~5% conversation
  subset (xxhash64(conv_id) % 20 == 0), vocab 16384, then every turn
  scored; forced via count + sum(lm_logp_per_token).

min-of-N in one session; first rep carries the cold JVM/broadcast cost.

Usage: python scripts/lm_chunks_million_bench.py [--reps 2] [--cores 32]
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

    from cl_readability_spark.functions.lm import lm_perplexity
    from cl_readability_spark.functions.packing import doc_chunks
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        "lm-chunks-1m", cores=args.cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(CORPUS)
    docs = raw.select(
        F.concat_ws(
            ":", "conv_id", F.col("turn_idx").cast("string")
        ).alias("doc_id"),
        "text",
    )
    n = docs.count()
    out = {"rows": n, "cores": args.cores}

    def chunks_job():
        ch = doc_chunks(docs, max_tokens=512, stride=448, id_col="doc_id")
        r = ch.agg(
            F.count("*"),
            F.sum("n_chunk_tokens"),
            F.sum(F.length("chunk_text")),
        ).collect()[0]
        return tuple(r)

    def lm_job():
        ref = docs.filter(
            F.pmod(F.xxhash64(F.split(F.col("doc_id"), ":")[0]), F.lit(20))
            == 0
        )
        scored = lm_perplexity(
            docs, reference=ref, vocab_size=16384, min_bigram_count=2
        )
        r = scored.agg(
            F.count("*"), F.round(F.sum("lm_logp_per_token"), 3)
        ).collect()[0]
        return tuple(r)

    for name, job in [("doc_chunks", chunks_job), ("lm_perplexity", lm_job)]:
        times, check = [], None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            check = job()
            times.append(round(time.perf_counter() - t0, 2))
        out[name] = {
            "reps_sec": times,
            "sec": min(times),
            "turns_per_sec": round(n / min(times), 1),
            "check": [str(x) for x in check],
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
