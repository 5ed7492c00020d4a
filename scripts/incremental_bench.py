#!/usr/bin/env python
"""1M-scale probe of incremental dedup vs the naive re-dedup it
replaces (functions/incremental.py).  Catalog = the canonical 1M-turn
corpus' fingerprints, written ONCE as a bucketed table; batch = 100k
rows (half planted catalog copies, half fresh).  Measures:

- catalog build (the one-time corpus pass);
- incremental EXACT probe (batch joins the bucketed catalog —
  catalog side unshuffled);
- naive exact re-dedup of catalog-corpus ∪ batch (the full
  1.1M-row groupBy every batch pays without a catalog);
- incremental MINHASH probe (band rows vs the bucketed band catalog).

At deployment the corpus:batch ratio is 1000:1, not 10:1 — the naive
column scales with the CORPUS, the incremental column with the BATCH.
Prints one JSON line; recorded in BENCH/BASELINE.md.

Usage: python scripts/incremental_bench.py [--reps 2] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CORPUS = "/tmp/million_corpus.parquet"
BATCH_N = 100_000


def main(argv) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.incremental import (
        incremental_exact_dedup,
        incremental_minhash_dedup,
        write_exact_catalog,
        write_minhash_catalog,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        "incremental-1m", cores=args.cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("inc_exact_1m", "inc_mh_1m"):
        for sfx in ("", "__meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{sfx}")
            shutil.rmtree(f"{warehouse}/{t}{sfx}", ignore_errors=True)

    docs = spark.read.parquet(CORPUS).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
    )
    n_corpus = docs.count()

    # batch: 50k planted catalog copies (re-keyed) + 50k fresh rows
    half = BATCH_N // 2
    planted = docs.limit(half).select(
        (F.col("doc_id") + 1).alias("doc_id"), "text"
    )
    fresh = (
        spark.range(half)
        .select(
            (F.col("id") - 10_000_000_000).alias("doc_id"),
            F.concat(
                F.lit("entirely fresh document body number "),
                F.col("id"),
                F.lit(" with words the corpus never saw before at all"),
            ).alias("text"),
        )
    )
    batch = planted.unionByName(fresh)
    batch.write.mode("overwrite").parquet("/tmp/inc_batch.parquet")
    batch = spark.read.parquet("/tmp/inc_batch.parquet")

    def best(fn):
        out = None
        for _ in range(max(1, args.reps)):
            t0 = time.perf_counter()
            r = fn()
            dt = time.perf_counter() - t0
            out = (dt, r) if out is None or dt < out[0] else out
        return round(out[0], 2), out[1]

    t0 = time.perf_counter()
    write_exact_catalog(docs, "inc_exact_1m", n_buckets=128)
    exact_build_s = round(time.perf_counter() - t0, 2)

    exact_probe_s, exact_hits = best(
        lambda: incremental_exact_dedup(batch, "inc_exact_1m")
        .agg(F.sum(F.col("in_catalog").cast("long")))
        .collect()[0][0]
    )

    def naive():
        both = docs.unionByName(batch)
        fp = F.md5(
            F.regexp_replace(
                F.lower(F.coalesce(F.col("text"), F.lit(""))),
                "[^a-z0-9]",
                "",
            )
        )
        return (
            both.select(fp.alias("f"), "doc_id")
            .groupBy("f")
            .agg(F.min("doc_id"))
            .count()
        )

    naive_s, naive_groups = best(naive)

    t0 = time.perf_counter()
    write_minhash_catalog(docs, "inc_mh_1m", n_buckets=128)
    mh_build_s = round(time.perf_counter() - t0, 2)

    mh_probe_s, mh_hits = best(
        lambda: incremental_minhash_dedup(
            batch, "inc_mh_1m", threshold=0.8
        )
        .agg(F.sum(F.col("near_dup_in_catalog").cast("long")))
        .collect()[0][0]
    )

    print(
        json.dumps(
            {
                "probe": "incremental_dedup_1m",
                "n_corpus": n_corpus,
                "n_batch": BATCH_N,
                "exact_catalog_build_sec": exact_build_s,
                "exact_probe_sec": exact_probe_s,
                "exact_probe_hits": int(exact_hits),
                "naive_rededup_sec": naive_s,
                "naive_groups": int(naive_groups),
                "exact_speedup_vs_naive": round(naive_s / exact_probe_s, 2),
                "minhash_catalog_build_sec": mh_build_s,
                "minhash_probe_sec": mh_probe_s,
                "minhash_probe_hits": int(mh_hits),
                "cores": args.cores,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
