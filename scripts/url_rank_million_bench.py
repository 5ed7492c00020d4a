#!/usr/bin/env python
"""1M-turn benches for URL dedup (functions/urls.py) and stratified
rank bucketing (functions/assembly.py:rank_buckets) over the canonical
1M corpus (/tmp/million_corpus.parquet):

- url_dedup_uniform: canonicalize + winner-select over ~340k canonical
  groups (3 raw variants per page);
- url_dedup_hot: same job with ONE canonical URL planted on ~10% of
  all rows — the skew probe for the min(struct) map-side collapse
  (a crawl with a million copies of one page must not make one task
  the job);
- rank_buckets_1m: per-"lang" (5 strata) head/middle/tail thirds by
  text length at 1M rows — the two-phase prefix COUNT.

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

    from cl_readability_spark.functions.assembly import rank_buckets
    from cl_readability_spark.functions.pins import release_pinned
    from cl_readability_spark.functions.urls import url_dedup
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("url-rank-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(CORPUS).select(
        F.concat_ws(
            "\x1f", "conv_id", F.col("turn_idx").cast("string")
        ).alias("doc_id"),
        "text",
    )
    n = src.count()
    out = {"probe": "url_rank_1m", "cores": 32, "rows": n}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name + "_sec"] = round(time.perf_counter() - t0, 2)
        return r

    page = F.abs(F.xxhash64("doc_id")) % 340000
    variant = F.abs(F.xxhash64("doc_id", F.lit(1))) % 3
    raw = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("HTTP://WWW.Site"), (page % 97).cast("string"),
                F.lit(".COM/page/"), page.cast("string"),
                F.lit("?utm_source=feed&x=1&b=2"),
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("http://site"), (page % 97).cast("string"),
                F.lit(".com:80/page/"), page.cast("string"),
                F.lit("/?b=2&x=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://site"), (page % 97).cast("string"),
                F.lit(".com/page/"), page.cast("string"),
                F.lit("#frag"),
            ),
        )
    )
    uni = src.withColumn("url", raw)
    kept = timed(
        "url_dedup_uniform",
        lambda: url_dedup(uni).filter("url_keep").count(),
    )
    out["url_uniform_kept"] = kept
    out["url_uniform_turns_per_sec"] = round(
        n / out["url_dedup_uniform_sec"], 1
    )

    # hot probe: ~10% of rows share ONE canonical URL
    hot = src.withColumn(
        "url",
        F.when(
            F.abs(F.xxhash64("doc_id", F.lit(2))) % 10 == 0,
            F.lit("http://WWW.Hot.com/the/page?utm_campaign=x"),
        ).otherwise(raw),
    )
    out["url_hot_kept"] = timed(
        "url_dedup_hot", lambda: url_dedup(hot).filter("url_keep").count()
    )

    # rank_buckets at 1M: 5 strata, thirds by text length
    scored = src.select(
        "doc_id",
        F.length("text").cast("long").alias("score"),
        (F.abs(F.xxhash64("doc_id", F.lit(3))) % 5).cast("string").alias(
            "lang"
        ),
    )
    def _rank():
        rb = rank_buckets(
            scored, "score", n_buckets=3, group_cols=("lang",),
            id_col="doc_id", join_back=False,
        )
        k = rb.groupBy("rank_bucket").count().count()
        release_pinned(rb)
        return k

    out["rank_distinct_buckets"] = timed("rank_buckets_1m", _rank)
    out["rank_turns_per_sec"] = round(n / out["rank_buckets_1m_sec"], 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
