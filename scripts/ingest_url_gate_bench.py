#!/usr/bin/env python
"""Prices the ingest loop's pre-extraction URL gate
(pipeline/ingest.py ingest_batch(url_table=)): the same 100k-row batch
— half REFETCHES of already-kept pages under raw URL variants, half
fresh pages — ingested

- arm A (content catalogs only): every row pays the Arrow extraction,
  refetches are caught AFTER it by the exact-fingerprint probe;
- arm B (+ URL catalog): refetches are caught BEFORE extraction by the
  canonical-URL probe and never reach the Arrow stage.

The corpus behind the catalogs is 200k turns extracted once and staged;
each arm gets fresh catalogs and a fresh sink (appends mutate state).
The delta prices exactly what moving the dedup probe ahead of the
expensive stage buys at a crawl's typical refetch fraction.

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


def main() -> int:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.incremental import (
        write_exact_catalog,
        write_url_catalog,
    )
    from cl_readability_spark.pipeline.ingest import ingest_batch
    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.resume import CheckpointedSink
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import (
        synthetic_transcripts,
    )

    spark = build_spark("url-gate-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    out = {"probe": "ingest_url_gate", "cores": 32}

    # --- corpus: 200k turns with one page url per row, extracted once ---
    page = F.concat_ws(
        "/", F.lit("http://ex.com"), "conv_id",
        F.col("turn_idx").cast("string"),
    )
    corpus = (
        synthetic_transcripts(spark, 8_000, seed=11)
        .withColumn("url", page)
        .persist()
    )
    n_corpus = corpus.count()
    out["corpus_turns"] = n_corpus
    t0 = time.perf_counter()
    ext = extract_transcripts(corpus, salt_buckets=16).join(
        corpus.select("conv_id", "turn_idx", "url"),
        ["conv_id", "turn_idx"],
    )
    ext.write.mode("overwrite").parquet("/tmp/urlgate_corpus_ext.parquet")
    out["corpus_extract_stage_sec"] = round(time.perf_counter() - t0, 2)
    ext = spark.read.parquet("/tmp/urlgate_corpus_ext.parquet")

    # --- batch: 50k refetches (url VARIANTS, identical content) + 50k
    # fresh pages ---
    half_src = corpus.orderBy("conv_id", "turn_idx").limit(50_000)
    refetch = (
        half_src.withColumn(
            "conv_id", F.concat(F.lit("re-"), "conv_id")
        )
        .withColumn(
            "url",
            F.concat(
                F.lit("HTTP://WWW."),
                F.regexp_replace("url", r"^http://", ""),
                F.lit("/?utm_source=feed"),
            ),
        )
    )
    fresh = (
        synthetic_transcripts(spark, 2_000, seed=77)
        .withColumn("conv_id", F.concat(F.lit("fr-"), "conv_id"))
        .withColumn("url", page)
        .limit(50_000)
    )
    batch = refetch.unionByName(fresh)
    batch.write.mode("overwrite").parquet("/tmp/urlgate_batch.parquet")
    batch = spark.read.parquet("/tmp/urlgate_batch.parquet")
    out["batch_rows"] = batch.count()
    corpus.unpersist()

    curate_opts = {
        "min_chars": 10, "min_stopword_bp": 0, "materialize": "none",
    }

    def arm(tag, with_url):
        exact_t, url_t = f"ug_exact_{tag}", f"ug_url_{tag}"
        for t in (exact_t, url_t):
            for sfx in ("", "__meta"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{sfx}")
                shutil.rmtree(f"{warehouse}/{t}{sfx}", ignore_errors=True)
        write_exact_catalog(
            ext, exact_t, text_col="extracted_text",
            id_col="conv_id", n_buckets=64,
        )
        kw = {}
        if with_url:
            write_url_catalog(
                ext, url_t, url_col="url", id_col="conv_id", n_buckets=64
            )
            kw = {"url_table": url_t, "url_col": "url"}
        shutil.rmtree(f"/tmp/urlgate_sink_{tag}", ignore_errors=True)
        sink = CheckpointedSink(f"/tmp/urlgate_sink_{tag}")
        t0 = time.perf_counter()
        r = ingest_batch(
            batch, sink, exact_table=exact_t,
            curate_opts=curate_opts, **kw,
        )
        wall = round(time.perf_counter() - t0, 2)
        return wall, r

    wall_a, ra = arm("noui", with_url=False)
    wall_b, rb = arm("url", with_url=True)
    out["arm_content_only_sec"] = wall_a
    out["arm_content_only"] = {
        k: ra[k] for k in ("rows_in", "exact_in_catalog", "rows_kept")
    }
    out["arm_url_gate_sec"] = wall_b
    out["arm_url_gate"] = {
        k: rb[k]
        for k in (
            "rows_in", "url_in_catalog", "url_batch_dup",
            "exact_in_catalog", "rows_kept",
        )
    }
    out["url_gate_speedup"] = round(wall_a / wall_b, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
