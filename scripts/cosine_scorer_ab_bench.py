#!/usr/bin/env python
"""1M-vector A/B of the top-k cosine scorer paths (round-7 verdict
task 6): the interpreted lambda-HOF JVM expression (zip_with/aggregate
— the oracle-twin default) vs the fused Arrow batch scorer
(score_arrow=True).  Corpus: 1M deterministic hash-derived dim-64
vectors materialized once to /tmp; probe = brute_force_topk (scores
EVERY row — the worst case an unlucky IVF/LSH probe set degrades to)
and ivf_topk at n_probe=4/16 (the realistic ~250k-row probe volume).
Prints one JSON line; recorded in BENCH/BASELINE.md.

Usage: python scripts/cosine_scorer_ab_bench.py [--reps 2] [--cores 32]
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

VECS = "/tmp/million_vectors_64d.parquet"
N = 1_000_000
DIM = 64


def main(argv) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        "cosine-ab-1m", cores=args.cores, shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(VECS):
        # deterministic hash-derived vectors, components in [-1, 1)
        base = spark.range(N).select(F.col("id").alias("vec_id"))
        comps = [
            (
                (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2000))
                 - F.lit(1000)) / F.lit(1000.0)
            ).cast("double")
            for j in range(DIM)
        ]
        base.select(
            "vec_id", F.array(*comps).alias("embedding")
        ).repartition(64).write.mode("overwrite").parquet(VECS)

    embs = spark.read.parquet(VECS)
    q = list(embs.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = embs.filter(F.col("vec_id") != 0)

    def run(fn, **kw):
        best = None
        for _ in range(max(1, args.reps)):
            t0 = time.perf_counter()
            fn(corpus, q, k=10, **kw).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    out = {
        "probe": "cosine_scorer_ab_1m",
        "n_vectors": N,
        "dim": DIM,
        "brute_jvm_sec": run(brute_force_topk),
        "brute_arrow_sec": run(brute_force_topk, score_arrow=True),
        "ivf_p4_jvm_sec": run(ivf_topk, n_cells=16, n_probe=4),
        "ivf_p4_arrow_sec": run(
            ivf_topk, n_cells=16, n_probe=4, score_arrow=True
        ),
        "cores": args.cores,
    }
    out["brute_speedup"] = round(
        out["brute_jvm_sec"] / out["brute_arrow_sec"], 2
    )
    out["ivf_p4_speedup"] = round(
        out["ivf_p4_jvm_sec"] / out["ivf_p4_arrow_sec"], 2
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
