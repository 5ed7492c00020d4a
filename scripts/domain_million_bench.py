#!/usr/bin/env python
"""1M-turn benches for domain-level filtering (functions/urls.py
domain_stats + domain_gate) over the canonical 1M corpus:

- domain_stats_uniform: per-host aggregates over ~9.7k hosts (100
  pages/host planted), keep flag planted per row;
- gate_uniform: stats -> condemned set -> broadcast gate join,
  counting survivors;
- domain_hot: the SAME stats+gate with ONE host planted on ~30% of all
  rows — the skew probe: the stats agg must collapse the hot host
  map-side (partial agg) and the gate join must stay a broadcast (no
  host-keyed shuffle for the hot key to skew).

Prints one JSON line; recorded in BENCH/BASELINE.md.
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


def main() -> int:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.urls import domain_gate, domain_stats
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("domain-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(CORPUS).select(
        F.concat_ws(
            "\x1f", "conv_id", F.col("turn_idx").cast("string")
        ).alias("doc_id"),
    )
    n = src.count()
    out = {"probe": "domain_1m", "cores": 32, "rows": n}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name + "_sec"] = round(time.perf_counter() - t0, 2)
        return r

    hid = F.abs(F.xxhash64("doc_id")) % 9700
    kept = (F.abs(F.xxhash64("doc_id", F.lit(1))) % 100) < (hid % 100)
    uni = src.select(
        "doc_id",
        F.concat(
            F.lit("http://WWW.Host"), hid.cast("string"),
            F.lit(".com/p/"), F.col("doc_id"),
        ).alias("url"),
        kept.alias("kept"),
    )

    def stats_and_gate(frame, tag):
        stats = timed(
            tag + "_stats",
            lambda: domain_stats(frame, keep_col="kept").persist(),
        )
        out[tag + "_hosts"] = stats.count()
        survivors = timed(
            tag + "_gate",
            lambda: domain_gate(
                frame, stats=stats, min_kept_frac=0.5, min_docs=10
            ).filter("domain_keep").count(),
        )
        out[tag + "_survivors"] = survivors
        out[tag + "_turns_per_sec"] = round(
            n / (out[tag + "_stats_sec"] + out[tag + "_gate_sec"]), 1
        )
        stats.unpersist()

    stats_and_gate(uni, "uniform")

    # hot probe: ~30% of rows on ONE host (kept_frac ~0.49 there — the
    # condemnation decision rides the aggregate, so the hot host is
    # also a CONDEMNED host: worst case for the gate join)
    hot = src.select(
        "doc_id",
        F.when(
            F.abs(F.xxhash64("doc_id", F.lit(2))) % 10 < 3,
            F.lit("http://Whale.com/page"),
        ).otherwise(
            F.concat(
                F.lit("http://WWW.Host"), hid.cast("string"),
                F.lit(".com/p/"), F.col("doc_id"),
            )
        ).alias("url"),
        (F.abs(F.xxhash64("doc_id", F.lit(3))) % 100 < 49).alias("kept"),
    )
    stats_and_gate(hot, "hot")

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
