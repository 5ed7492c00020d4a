#!/usr/bin/env python
"""1M-turn benches for the dataset-assembly + n-gram operators
(functions/assembly.py, functions/ngrams.py) over the canonical 1M
corpus (/tmp/million_corpus.parquet):

- epoch_shard_write: the one shard exchange + sorted partitioned write
  (the whole epoch materialization cost);
- token_budget: the scalable two-phase prefix-sum cut at a 50%% budget;
- ngram_exact: exact trigram heavy hitters (explode -> partial agg ->
  ONE gram exchange);
- ngram_cms: the count-min-sketch alternative (NO shuffle of the gram
  stream — fixed-size sketches merge up the tree), same gram volume.

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


def main() -> int:
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.assembly import (
        token_budget_sample,
        write_epoch_shards,
    )
    from cl_readability_spark.functions.ngrams import (
        fit_gram_cms,
        ngram_counts,
    )
    from cl_readability_spark.functions.pins import release_pinned
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark("assembly-1m", cores=32, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(CORPUS)
    n = src.count()
    out = {"probe": "assembly_1m", "cores": 32, "rows": n}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name + "_sec"] = round(time.perf_counter() - t0, 2)
        return r

    shutil.rmtree("/tmp/epoch_shards", ignore_errors=True)
    timed(
        "epoch_shard_write",
        lambda: write_epoch_shards(
            src, "/tmp/epoch_shards", seed=11,
            id_cols=("conv_id", "turn_idx"), n_shards=128,
        ),
    )
    out["epoch_turns_per_sec"] = round(n / out["epoch_shard_write_sec"], 1)

    toks = src.select(
        F.concat_ws(
            "\x1f", "conv_id", F.col("turn_idx").cast("string")
        ).alias("doc_id"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
        F.length("text").cast("long").alias("prio"),
    )
    total = toks.agg(F.sum("n_tokens")).first()[0]
    out["total_tokens"] = int(total)

    def _budget():
        sel = token_budget_sample(
            toks, int(total) // 2, token_col="n_tokens",
            priority_col="prio", id_col="doc_id", join_back=False,
        )
        k = sel.filter("selected").count()
        release_pinned(sel)
        return k

    out["budget_selected"] = timed("token_budget", _budget)

    out["ngram_exact_rows"] = timed(
        "ngram_exact",
        lambda: ngram_counts(
            src, text_col="text", n=3, min_count=100
        ).count(),
    )
    cms = timed(
        "ngram_cms",
        lambda: fit_gram_cms(
            src, text_col="text", n=3, eps=0.0001, confidence=0.99
        ),
    )
    out["cms_bytes"] = len(cms)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
