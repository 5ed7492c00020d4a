#!/usr/bin/env python
"""1M-turn A/B for the composed curate(url_col=) chain: the same
curate() run over the canonical 1M corpus (/tmp/million_corpus.parquet)
WITHOUT and WITH the URL-dedup first stage (3 raw variants per planted
page -> ~2/3 of URL-carrying rows lose), min-of-2 each, deployment
materialize="disk" with the pin released between reps.  The delta
prices the stage's marginal cost in the composition (canonicalize
projection + min(struct) winner agg + composite-row-key join) — NOT
a standalone url_dedup bench (that's url_rank_million_bench.py).

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

    from cl_readability_spark.functions.curation import (
        curate,
        curation_report,
        release_curated,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("url-curate-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(CORPUS).select("conv_id", "turn_idx", "text")
    n = src.count()
    out = {"probe": "url_curate_1m", "cores": 32, "rows": n}

    # the url_rank_million_bench variant recipe, keyed off the row key
    rk = F.concat_ws("\x1f", "conv_id", F.col("turn_idx").cast("string"))
    page = F.abs(F.xxhash64(rk)) % 340000
    variant = F.abs(F.xxhash64(rk, F.lit(1))) % 3
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
    with_url = src.withColumn("url", raw)

    def run(name, frame, **kw):
        walls = []
        rep = None
        for _ in range(2):
            t0 = time.perf_counter()
            cur = curate(
                frame, text_col="text", min_stopword_bp=0,
                materialize="disk", **kw,
            )
            rep = curation_report(cur).collect()[0]
            walls.append(time.perf_counter() - t0)
            release_curated(cur)
        out[name + "_sec"] = round(min(walls), 2)
        out[name + "_reps_s"] = [round(w, 2) for w in walls]
        out[name + "_turns_per_sec"] = round(n / min(walls), 1)
        return rep

    base = run("curate_base", src)
    url = run("curate_url", with_url, url_col="url")

    out["base_report"] = {
        k: base[k] for k in ("rows_in", "dropped_quality", "rows_kept")
    }
    out["url_report"] = {
        k: url[k] for k in ("rows_in", "dropped_quality", "rows_kept")
    }
    # sanity: the URL arm's extra quality drops are exactly the URL
    # losers that the base arm kept
    out["url_marginal_sec"] = round(
        out["curate_url_sec"] - out["curate_base_sec"], 2
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
