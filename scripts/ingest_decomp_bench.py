#!/usr/bin/env python
"""Component decomposition of one ingest_batch at the 1M-corpus point
(explains scripts/ingest_bench.py's per-batch growth curve).  Rebuilds
the catalogs + committed-key state from the 1M corpus, then times each
ingest component as its own action over a 100k fresh batch:

- resume anti-join vs 1M committed keys (the one O(corpus) JOIN term);
- exact-catalog probe (bucketed scan grows with corpus, no shuffle);
- minhash-catalog probe (band-catalog scan grows with corpus);
- extraction alone (O(batch));
- curate() gates alone (O(batch));
- catalog appends (O(batch)).

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

    from cl_readability_spark.functions.curation import (
        curate,
        release_curated,
    )
    from cl_readability_spark.functions.incremental import (
        incremental_exact_dedup,
        incremental_minhash_dedup,
        write_exact_catalog,
        write_minhash_catalog,
    )
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.resume import pending_rows
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("ingest-decomp", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("dec_exact", "dec_mh"):
        for sfx in ("", "__meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{sfx}")
            shutil.rmtree(f"{warehouse}/{t}{sfx}", ignore_errors=True)

    src = spark.read.parquet(CORPUS)
    corpus = src.select(
        F.concat_ws(
            "\x1f", "conv_id", F.col("turn_idx").cast("string")
        ).alias("_ingest_id"),
        F.col("text").alias("extracted_text"),
    )
    out = {"probe": "ingest_decomp_1m", "cores": 32}

    t0 = time.perf_counter()
    write_exact_catalog(
        corpus, "dec_exact", text_col="extracted_text",
        id_col="_ingest_id", n_buckets=128,
    )
    out["exact_catalog_build_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    write_minhash_catalog(
        corpus, "dec_mh", text_col="extracted_text",
        id_col="_ingest_id", n_buckets=128,
    )
    out["minhash_catalog_build_sec"] = round(time.perf_counter() - t0, 2)

    committed = src.select("conv_id", "turn_idx")

    fresh = spark.range(BATCH_N).select(
        F.concat(F.lit("fresh-"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit("<html><body><p>entirely fresh paragraph number "),
            F.col("id"),
            F.lit(
                " with several distinct words the corpus never saw, "
                "long enough for the shingle stage to produce "
                "five-word shingles of its own.</p></body></html>"
            ),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    fresh.write.mode("overwrite").parquet("/tmp/dec_batch.parquet")
    fresh = spark.read.parquet("/tmp/dec_batch.parquet")

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 2)
        return r

    timed(
        "anti_join_sec",
        lambda: pending_rows(fresh, committed).count(),
    )
    # the committed_filter path (pipeline/ingest.py): scope the
    # committed-keys scan to the batch's key partition — here the
    # filter excludes every corpus key, the cross-partition-disjoint
    # case (a real deployment keys batches by crawl date / id prefix)
    timed(
        "anti_join_scoped_sec",
        lambda: pending_rows(
            fresh, committed.filter(F.col("conv_id").startswith("fresh-"))
        ).count(),
    )

    def run_extract():
        df = (
            extract_transcripts(fresh)
            .withColumn(
                "_ingest_id",
                F.concat_ws(
                    "\x1f", "conv_id", F.col("turn_idx").cast("string")
                ),
            )
            .persist()
        )
        df.count()  # materialize INSIDE the timer
        return df

    extracted = timed("extract_sec", run_extract)

    timed(
        "exact_probe_sec",
        lambda: incremental_exact_dedup(
            extracted, "dec_exact", text_col="extracted_text",
            id_col="_ingest_id", with_batch_keep=False,
        )
        .agg(F.sum(F.col("in_catalog").cast("long")))
        .collect(),
    )
    timed(
        "minhash_probe_sec",
        lambda: incremental_minhash_dedup(
            extracted, "dec_mh", text_col="extracted_text",
            id_col="_ingest_id",
        )
        .agg(F.sum(F.col("near_dup_in_catalog").cast("long")))
        .collect(),
    )

    def run_curate():
        c = curate(
            extracted, text_col="extracted_text",
            key_cols=("conv_id", "turn_idx"), min_chars=10,
            min_stopword_bp=0, materialize="disk",
        )
        c.write.mode("overwrite").parquet("/tmp/dec_curated.parquet")
        release_curated(c)

    timed("curate_write_sec", run_curate)

    kept = spark.read.parquet("/tmp/dec_curated.parquet").filter("kept")
    timed(
        "exact_append_sec",
        lambda: kept.select(
            F.md5(
                F.regexp_replace(
                    F.lower(F.coalesce(F.col("extracted_text"), F.lit(""))),
                    "[^a-z0-9]", "",
                )
            ).alias("fingerprint"),
            F.col("_ingest_id").alias("keep_id"),
        )
        .write.mode("append")
        .bucketBy(128, "fingerprint")
        .sortBy("fingerprint")
        .saveAsTable("dec_exact"),
    )
    from cl_readability_spark.functions.incremental import (
        append_minhash_catalog,
    )

    timed(
        "minhash_append_sec",
        lambda: append_minhash_catalog(
            kept, "dec_mh", text_col="extracted_text",
            id_col="_ingest_id",
        ),
    )
    extracted.unpersist()
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
