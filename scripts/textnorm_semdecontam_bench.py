#!/usr/bin/env python
"""1M-scale throughput probes for the two newest Arrow-stage operators.

- **textnorm**: the full CCNet chain (NFC + accent strip in the Arrow
  stage, lowercase/digits/whitespace in codegen) over the canonical 1M
  transcript corpus (/tmp/million_corpus.parquet — regenerate with
  scripts/make_million_corpora.py), forced by summing output lengths.
- **semantic_decontam**: 1M JVM-built dim-64 embeddings screened
  against a 1,000-row benchmark (64M cosine pairs as per-batch numpy
  matmuls in one stateless Arrow stage).

Min-of-2 each; prints one JSON line per probe; recorded in
BENCH/BASELINE.md.
"""

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
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.decontam import semantic_decontam
    from cl_readability_spark.functions.textnorm import normalize_text
    from cl_readability_spark.pipeline.session import build_spark

    cores = int(os.environ.get("TN_BENCH_CPUS", "32"))
    n_vec = int(os.environ.get("SD_BENCH_VECS", "1000000"))
    n_bench = int(os.environ.get("SD_BENCH_BENCH", "1000"))

    spark = build_spark(
        app_name="textnorm-semdecontam-bench", cores=cores,
        shuffle_partitions=max(cores, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(CORPUS).select("conv_id", "turn_idx", "text")
    n_turns = docs.count()

    def run_textnorm():
        out = normalize_text(
            docs,
            text_col="text",
            form="NFC",
            strip_accents=True,
            lowercase=True,
            fold_digits=True,
            collapse_ws=True,
        )
        t0 = time.perf_counter()
        row = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.length("norm_text")).alias("chars"),
        ).collect()[0]
        return time.perf_counter() - t0, row.asDict()

    walls, stats = [], None
    for _ in range(2):
        w, stats = run_textnorm()
        walls.append(round(w, 2))
    wall = min(walls)
    print(json.dumps({
        "probe": "textnorm_1m",
        "n_turns": n_turns,
        "walls_sec": walls,
        "wall_sec": wall,
        "turns_per_sec": round(n_turns / wall, 1),
        "stats": stats,
    }))

    # JVM-built embeddings: vec = f(id) via xxhash, the semdedup recipe
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id").cast("string"), i, F.lit("sd")),
                   F.lit(2001)) - 1000
        ).cast("double") / 100.0,
    )
    embs = (
        spark.range(n_vec)
        .select(F.col("id").alias("doc_id"), vec.alias("embedding"))
        .repartition(max(cores, 32))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    embs.count()
    bench = embs.filter(F.col("doc_id") % (n_vec // n_bench) == 0).select(
        "embedding"
    )

    def run_sd():
        out = semantic_decontam(embs, bench, threshold_x10k=9999)
        t0 = time.perf_counter()
        row = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("semantically_contaminated").cast("long")).alias(
                "flagged"
            ),
        ).collect()[0]
        return time.perf_counter() - t0, row.asDict()

    walls, stats = [], None
    for _ in range(2):
        w, stats = run_sd()
        walls.append(round(w, 2))
    wall = min(walls)
    print(json.dumps({
        "probe": "semantic_decontam_1m",
        "n_vecs": n_vec,
        "n_bench": n_bench,
        "walls_sec": walls,
        "wall_sec": wall,
        "vecs_per_sec": round(n_vec / wall, 1),
        "stats": stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
