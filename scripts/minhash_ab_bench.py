#!/usr/bin/env python
"""Same-window A/B for the recall-sized minhash banding (VERDICT r5 #2).

Round 5 flipped the default banding from the fixed 32 hashes x 8 bands to
recall-sized auto banding (69x23 at threshold 0.5), and the driver bench
window showed dedup_minhash_real 1.68 -> 4.66 s — but across windows, on a
VM with a documented ±25-40% hypervisor swing, so the recall price was
confounded with window noise.  This script isolates it: ONE Spark session,
ALTERNATING min-of-3 reps of each variant, so both variants share any
window-level drift:

- dedup_minhash_real: auto banding (69x23) vs pinned 32x8
- curation_pipeline:  auto banding vs minhash_banding=(32, 8)
- embedding_near_dups: 3 reps (VERDICT r5 #6 — the +75% driver-window
  outlier with no code or input change; no variant axis, just min-of-3)

Prints one JSON line; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

# runnable from any cwd (cron/background runners don't inherit the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("AB_REPS", "3"))

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.curation import curate, curation_report
    from cl_readability_spark.functions.dedup import minhash_near_dups
    from cl_readability_spark.functions.pins import release_all_pins
    from cl_readability_spark.functions.similarity import (
        embedding_near_dups,
        plant_near_dups,
    )
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import documents_as_transcripts

    spark = build_spark(app_name="minhash-ab-bench", cores=cpus,
                        shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py so first-rep JVM/python-worker costs are paid
    extract_transcripts(
        documents_as_transcripts(spark, sf_dir).limit(64), salt_buckets=4
    ).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def minhash_auto():
        return minhash_near_dups(docs, jaccard_threshold=0.5).count()

    def minhash_pinned():
        return minhash_near_dups(
            docs, jaccard_threshold=0.5, n_hashes=32, bands=8
        ).count()

    def curation(banding):
        n = curation_report(
            curate(
                extract_transcripts(
                    documents_as_transcripts(spark, sf_dir), salt_buckets=8
                ),
                min_stopword_bp=0,
                minhash_banding=banding,
            )
        ).count()
        release_all_pins(spark)
        return n

    def embed():
        return embedding_near_dups(
            plant_near_dups(
                spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
                every=5, gamma=0.43, seed=7,
            ),
            threshold=0.9,
            dim=64,
        ).count()

    variants = {
        "dedup_minhash_real/auto-69x23": minhash_auto,
        "dedup_minhash_real/pinned-32x8": minhash_pinned,
        "curation_pipeline/auto": lambda: curation(None),
        "curation_pipeline/pinned-32x8": lambda: curation((32, 8)),
        "embedding_near_dups": embed,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for _rep in range(reps):
        # alternate variants within the rep so window drift hits both sides
        for name, fn in variants.items():
            t0 = time.perf_counter()
            counts[name] = fn()
            times[name].append(round(time.perf_counter() - t0, 3))

    out = {
        "metric": "minhash banding A/B (same-window, alternating)",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps": reps,
        "times": times,
        "min": {k: min(v) for k, v in times.items()},
        "rows": counts,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
