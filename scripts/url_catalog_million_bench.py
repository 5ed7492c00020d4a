#!/usr/bin/env python
"""1M-scale probe of the incremental URL catalog
(functions/incremental.py write_url_catalog / incremental_url_dedup):
catalog = 1M canonical page URLs (one per corpus turn), batch = 100k
rows — half RAW VARIANTS of catalog pages (www/case/utm/slash noise the
canonicalizer must fold before the probe can hit), half fresh pages.
Measures catalog build (the one-time corpus pass) and the probe
(min-of-2; catalog side rides its buckets unshuffled — the plan-golden
contract), plus hit counts as a correctness anchor.

Prints one JSON line; recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

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


def main() -> int:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.incremental import (
        incremental_url_dedup,
        write_url_catalog,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("url-cat-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for sfx in ("", "__meta"):
        spark.sql(f"DROP TABLE IF EXISTS url_cat_1m{sfx}")
        shutil.rmtree(f"{warehouse}/url_cat_1m{sfx}", ignore_errors=True)

    docs = spark.read.parquet(CORPUS).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id")
    )
    page = F.abs(F.col("doc_id"))  # one distinct page per turn
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://site"), (page % 97).cast("string"),
            F.lit(".com/page/"), page.cast("string"),
        ).alias("url"),
    )
    n_corpus = corpus.count()

    half = BATCH_N // 2
    # variants of catalog pages: shouty scheme/host + www + utm + slash
    variants = corpus.limit(half).select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat(
            F.lit("HTTP://WWW."),
            F.upper(F.regexp_extract("url", r"^http://([^/]*)", 1)),
            F.regexp_extract("url", r"^http://[^/]*(/.*)$", 1),
            F.lit("/?utm_source=feed"),
        ).alias("url"),
    )
    fresh = spark.range(half).select(
        (F.col("id") - 10_000_000_000).alias("doc_id"),
        F.concat(
            F.lit("http://brandnew"), (F.col("id") % 97).cast("string"),
            F.lit(".org/item/"), F.col("id").cast("string"),
        ).alias("url"),
    )
    batch = variants.unionByName(fresh)
    batch.write.mode("overwrite").parquet("/tmp/url_batch.parquet")
    batch = spark.read.parquet("/tmp/url_batch.parquet")

    t0 = time.perf_counter()
    write_url_catalog(corpus, "url_cat_1m", n_buckets=128)
    build_s = round(time.perf_counter() - t0, 2)

    def probe():
        return (
            incremental_url_dedup(batch, "url_cat_1m")
            .agg(F.sum(F.col("in_catalog").cast("long")))
            .collect()[0][0]
        )

    walls, hits = [], None
    for _ in range(2):
        t0 = time.perf_counter()
        hits = probe()
        walls.append(round(time.perf_counter() - t0, 2))

    out = {
        "probe": "url_catalog_1m",
        "cores": 32,
        "n_corpus": n_corpus,
        "n_batch": BATCH_N,
        "catalog_build_sec": build_s,
        "probe_sec": min(walls),
        "probe_reps_s": walls,
        "probe_hits": int(hits),
        "batch_rows_per_sec": round(BATCH_N / min(walls), 1),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
