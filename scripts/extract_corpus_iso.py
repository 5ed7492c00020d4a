#!/usr/bin/env python
"""Isolated extract_corpus measurement (guide §1.4): the bench's exact
corpus (synthetic_transcripts cached) through extract_transcripts, reps.

Usage: PYTHONPATH=/root/repo python scripts/extract_corpus_iso.py [sf] [reps]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

    spark = build_spark(app_name="extract-corpus-iso", cores=32,
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_conversations = max(20, int(15000 * sf))
    corpus = synthetic_transcripts(spark, n_conversations, seed=42).cache()
    n = corpus.count()
    print(f"corpus turns={n} partitions={corpus.rdd.getNumPartitions()}")
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"extract_corpus rep{i}")
        t0 = time.perf_counter()
        ok = (
            extract_transcripts(corpus, salt_buckets=16)
            .filter(F.col("status") == "ok")
            .count()
        )
        dt = time.perf_counter() - t0
        print(f"rep{i}: {dt:.3f}s ok={ok} {n/dt:.0f} turns/s")
    spark.stop()


if __name__ == "__main__":
    main()
