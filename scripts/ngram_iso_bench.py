#!/usr/bin/env python
"""Isolated ngram_counts measurement over the bench corpus (guide §1.4).

Reproduces the bench's exact corpus (synthetic_transcripts, cached) and
times ngram_counts(n=3, min_count=10).count() over several reps.

Usage: PYTHONPATH=/root/repo python scripts/ngram_iso_bench.py [sf] [reps]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from cl_readability_spark.functions.ngrams import ngram_counts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

    import os, shutil
    evdir = "/tmp/spark-events-ngram"
    shutil.rmtree(evdir, ignore_errors=True); os.makedirs(evdir)
    spark = build_spark(app_name="ngram-iso", cores=32, shuffle_partitions=32,
                        extra_confs={"spark.eventLog.enabled": "true",
                                     "spark.eventLog.dir": evdir,
                                     "spark.eventLog.compress": "false",
                                     "spark.eventLog.rolling.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    n_conversations = max(20, int(15000 * sf))
    corpus = synthetic_transcripts(spark, n_conversations, seed=42).cache()
    n = corpus.count()
    print(f"corpus turns={n} partitions={corpus.rdd.getNumPartitions()}")
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"ngram rep{i}")
        t0 = time.perf_counter()
        c = ngram_counts(corpus, text_col="text", n=3, min_count=10).count()
        print(f"rep{i}: {time.perf_counter() - t0:.3f}s  n={c}")
    spark.stop()


if __name__ == "__main__":
    main()
