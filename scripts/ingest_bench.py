#!/usr/bin/env python
"""1M-scale probe of the incremental ingest loop (pipeline/ingest.py):
the canonical 1M-turn corpus split into 4 conv-keyed growth batches
ingested sequentially into one sink + catalogs, then a 5th batch that
is ~100k re-keyed COPIES of batch 0 (guaranteed catalog work).

The claim under test is the scaling law: per-batch ingest wall stays
~flat as the corpus grows 4× behind it (probe cost scales with the
BATCH — the catalogs never re-shuffle), and the dup batch is CHEAPER
than a fresh batch of the same size because catalog hits skip the
intra-batch curation stages.  Prints one JSON line; recorded in
BENCH/BASELINE.md.

Usage: python scripts/ingest_bench.py [--cores 32]
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
SINK_ROOT = "/tmp/ingest_bench_corpus"
CURATE = {"min_chars": 10, "min_stopword_bp": 0, "materialize": "disk"}


def main(argv) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.incremental import (
        write_exact_catalog,
        write_minhash_catalog,
    )
    from cl_readability_spark.pipeline.ingest import ingest_batch
    from cl_readability_spark.pipeline.resume import CheckpointedSink
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        "ingest-1m", cores=args.cores, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("ingb_exact", "ingb_mh"):
        for sfx in ("", "__meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{sfx}")
            shutil.rmtree(f"{warehouse}/{t}{sfx}", ignore_errors=True)
    shutil.rmtree(SINK_ROOT, ignore_errors=True)

    empty = spark.createDataFrame(
        [], "_ingest_id string, extracted_text string"
    )
    write_exact_catalog(
        empty, "ingb_exact", text_col="extracted_text",
        id_col="_ingest_id", n_buckets=128,
    )
    write_minhash_catalog(
        empty, "ingb_mh", text_col="extracted_text",
        id_col="_ingest_id", n_buckets=128,
    )

    src = spark.read.parquet(CORPUS)
    sink = CheckpointedSink(SINK_ROOT)

    batches = []
    for i in range(4):
        batches.append(
            src.filter(F.pmod(F.xxhash64("conv_id"), F.lit(4)) == i)
        )
    # dup batch: re-keyed copies of batch 0's first ~100k rows (whole
    # conversations, deterministic conv choice)
    dup = (
        batches[0]
        .filter(F.pmod(F.xxhash64("conv_id", F.lit(7)), F.lit(3)) == 0)
        .withColumn("conv_id", F.concat(F.lit("dup-"), F.col("conv_id")))
    )

    out = {"probe": "ingest_1m", "cores": args.cores, "batches": []}
    for name, b in [(f"b{i}", batches[i]) for i in range(4)] + [
        ("dup_of_b0", dup)
    ]:
        n = b.count()
        t0 = time.perf_counter()
        r = ingest_batch(
            b, sink, exact_table="ingb_exact", minhash_table="ingb_mh",
            curate_opts=CURATE,
        )
        dt = time.perf_counter() - t0
        out["batches"].append(
            {
                "batch": name,
                "rows": n,
                "wall_sec": round(dt, 2),
                "turns_per_sec": round(n / dt, 1),
                "exact_in_catalog": r["exact_in_catalog"],
                "near_dup_in_catalog": r["near_dup_in_catalog"],
                "rows_kept": r["rows_kept"],
                "catalog_rows_after": spark.table("ingb_exact").count(),
            }
        )
        print(json.dumps(out["batches"][-1]), flush=True)

    b = out["batches"]
    out["flatness_b4_vs_b1"] = round(
        (b[3]["wall_sec"] / b[3]["rows"]) / (b[0]["wall_sec"] / b[0]["rows"]),
        3,
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
