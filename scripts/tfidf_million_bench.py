#!/usr/bin/env python
"""1M-turn bench for tfidf_topk (functions/keywords.py) over the
canonical 1M corpus: top-5 salient terms per turn, broadcast vs
shuffle-join idf attachment on the same input.  Prints one JSON line;
recorded in BENCH/BASELINE.md."""

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

    from cl_readability_spark.functions.keywords import (
        doc_frequencies,
        tfidf_topk,
    )
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("tfidf-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(CORPUS).select(
        F.concat_ws(
            "\x1f", "conv_id", F.col("turn_idx").cast("string")
        ).alias("doc_id"),
        "text",
    )
    n = src.count()
    out = {"probe": "tfidf_1m", "cores": 32, "rows": n}
    out["vocab"] = doc_frequencies(src).count()

    for strat in ("broadcast", "join"):
        t0 = time.perf_counter()
        k = tfidf_topk(
            src, k=5, strategy=strat, n_docs=n
        ).count()
        out[f"{strat}_sec"] = round(time.perf_counter() - t0, 2)
        out[f"{strat}_rows"] = k
        out[f"{strat}_turns_per_sec"] = round(n / out[f"{strat}_sec"], 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
