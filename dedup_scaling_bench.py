#!/usr/bin/env python
"""N→4N scaling bench for the dedup/near-dup stacks (BENCH/BASELINE.md
"Dedup-stack N→4N scaling").

Runs embedding_near_dups (and optionally minhash_near_dups) over a
deterministic corpus at two parallelism levels, fresh JVM per level,
min-of-reps, and prints one JSON line with throughputs + efficiency.

Corpus: 100k random dim-64 vectors (hash-derived, seedless determinism)
+ planted perturbed copies of every 5th vector (cosine 0.903-0.95), LSH
knobs sized via near_dup_params — the exact protocol of the round-2
measurement this tracks.

Usage: python dedup_scaling_bench.py [--rows 100000] [--levels 8,32]
       [--reps 2] [--stack embedding]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# corpus paths encode the row count: a stale corpus from a previous --rows
# must never be silently reused (the bench would report the wrong scale)
def corpus_path(rows: int) -> str:
    return f"/tmp/clrs-dedup-bench-vectors-{rows}.parquet"


def text_corpus_path(rows: int) -> str:
    return f"/tmp/clrs-dedup-bench-texts-{rows}.parquet"


def write_corpus(rows: int) -> None:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.similarity import plant_near_dups
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("dedup-bench-gen", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(0, rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                F.pmod(F.xxhash64(F.concat_ws(":", F.col("id"), i)), F.lit(2001))
                - 1000
            ).cast("float")
            / 100.0,
        ).alias("embedding"),
    )
    corpus = plant_near_dups(base, every=5, gamma=0.43, seed=7)
    corpus.repartition(32).write.mode("overwrite").parquet(corpus_path(rows))
    spark.stop()


def write_text_corpus(rows: int) -> None:
    """Deterministic text corpus for the minhash stack: ~60-word docs of
    hash-derived vocabulary; every 5th doc gets a near-identical twin
    (last 3 words changed → word-5-gram Jaccard ≈ 0.9)."""
    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("dedup-bench-textgen", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    def words(idcol, n, salt):
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.concat_ws(":", idcol, i, F.lit(salt))),
                        F.lit(5000),
                    ).cast("string"),
                ),
            ),
        )
    base = spark.range(0, rows).select(
        F.col("id").alias("doc_id"), words(F.col("id"), 60, "a").alias("text")
    )
    twins = (
        spark.range(0, rows)
        .filter(F.col("id") % 5 == 0)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ", words(F.col("id"), 57, "a"), words(F.col("id"), 3, "b")
            ).alias("text"),
        )
    )
    base.unionByName(twins).repartition(32).write.mode("overwrite").parquet(
        text_corpus_path(rows)
    )
    spark.stop()


def run_level(cores: int, reps: int, stack: str, rows: int) -> dict:
    """One JVM at local[cores]; min-of-reps steady state."""
    from pyspark.sql import functions as F  # noqa: F401

    from cl_readability_spark.functions.dedup import minhash_near_dups
    from cl_readability_spark.functions.similarity import (
        embedding_near_dups,
        near_dup_params,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(f"dedup-bench-{cores}", cores=cores,
                        shuffle_partitions=max(cores * 4, 32))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(
        text_corpus_path(rows) if stack == "minhash" else corpus_path(rows)
    )
    n = df.count()  # warm scan
    extra = {}
    if stack == "minhash":
        job = lambda: minhash_near_dups(df, jaccard_threshold=0.8).count()  # noqa: E731
    elif stack == "semdedup":
        # the FULL SemDeDup chain: Arrow cell/centroid-sim stage →
        # within-cell banded LSH → components → keep-one.  n_cells sized
        # to ~2k rows/cell; banding sized as the embedding stack (the
        # cell key in the bucket only shrinks buckets further).  The
        # returned count is the KEPT rows (the 'pairs' field below).
        from cl_readability_spark.functions.pins import release_pinned
        from cl_readability_spark.functions.similarity import semantic_dedup

        n_bands, n_planes = near_dup_params(n, threshold=0.9)
        n_cells = max(16, n // 2000)
        extra = {"n_bands": n_bands, "n_planes": n_planes, "n_cells": n_cells}

        def job():
            out = semantic_dedup(
                df, threshold=0.9, n_cells=n_cells,
                n_bands=n_bands, n_planes=n_planes, dim=64,
            )
            kept = out.filter("kept").count()
            release_pinned(out)
            return kept

    else:
        n_bands, n_planes = near_dup_params(n, threshold=0.9)
        extra = {"n_bands": n_bands, "n_planes": n_planes}
        job = lambda: embedding_near_dups(  # noqa: E731
            df, threshold=0.9, n_bands=n_bands, n_planes=n_planes, dim=64
        ).count()
    times, pairs = [], 0
    for _ in range(reps):
        t0 = time.perf_counter()
        pairs = job()
        times.append(round(time.perf_counter() - t0, 2))
    spark.stop()
    return {
        "cores": cores, "rows": n, **extra,
        "reps_sec": times, "sec": min(times), "pairs": pairs,
        "rows_per_sec": round(n / min(times), 1),
    }


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=100_000)
    p.add_argument("--levels", default="8,32")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--stack", default="embedding")
    p.add_argument("--_level", type=int, default=None)  # internal: child mode
    args = p.parse_args(argv)

    if args._level is not None:
        print("RESULT " + json.dumps(run_level(args._level, args.reps,
                                               args.stack, args.rows)))
        return 0

    if args.stack == "minhash":
        if not os.path.exists(os.path.join(text_corpus_path(args.rows), "_SUCCESS")):
            write_text_corpus(args.rows)
    elif not os.path.exists(os.path.join(corpus_path(args.rows), "_SUCCESS")):
        write_corpus(args.rows)
    results = []
    for lvl in [int(x) for x in args.levels.split(",")]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_level", str(lvl),
             "--reps", str(args.reps), "--rows", str(args.rows),
             "--stack", args.stack],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            return 1
        results.append(json.loads(line[-1][len("RESULT "):]))
    summary = {"stack": args.stack, "levels": results}
    if len(results) == 2:
        a, b = results
        ratio = b["cores"] / a["cores"]
        summary["efficiency"] = round(
            (a["sec"] / b["sec"]) / ratio, 3
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
