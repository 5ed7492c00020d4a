#!/usr/bin/env python
"""Canonical 1M-turn rerun corpora (BENCH/BASELINE.md protocol).

The cross-round value-determinism chains (chars_in/chars_kept, curation
gate counts) are only meaningful if the corpora are BYTE-IDENTICAL
every round — this script pins both constructions, including the exact
trailing-sentence literal of the planted near-duplicates (round 7
briefly regenerated it with a different literal and the curation counts
moved by ~650 rows; the drift was the corpus, not the engine).

- /tmp/million_corpus.parquet:
  synthetic_transcripts(40_000, seed=42).repartition(128)
  -> 1,019,872 turns.  Extraction/gopher/line-dedup records run here.
- /tmp/million_dups_corpus.parquet: the above + 5%% planted
  near-duplicate turns (every 20th turn by xxhash64(conv_id, turn_idx)
  mod 20, conv_id prefixed "dup-", html + ONE trailing sentence
  paragraph -> extracted-text Jaccard >= ~0.9 vs the original)
  -> 1,070,811 turns.  Curation gate-count records run here
  (r4: 47,615 near-dup drops under 32x8 banding; r5/r6/r7: 47,592
  under recall-sized 91x13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# THE canonical literal — do not edit: changing it invalidates every
# cross-round curation gate-count comparison
DUP_TAIL = "<p>One extra trailing sentence changes very little of the body.</p>"
PLAIN = "/tmp/million_corpus.parquet"
DUPS = "/tmp/million_dups_corpus.parquet"


def main() -> None:
    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import (
        synthetic_transcripts,
    )

    spark = build_spark(
        app_name="make-million-corpora", cores=32, shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")

    def count_or_none(path):
        try:
            return spark.read.parquet(path).count()
        except Exception:  # noqa: BLE001
            return None

    if count_or_none(PLAIN) != 1_019_872:
        synthetic_transcripts(spark, 40_000, seed=42).repartition(
            128
        ).write.mode("overwrite").parquet(PLAIN)
        print("plain corpus written:", spark.read.parquet(PLAIN).count())
    else:
        print("plain corpus present: 1019872")

    if count_or_none(DUPS) != 1_070_811:
        src = spark.read.parquet(PLAIN)
        dups = (
            src.filter(
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(20)) == 0
            )
            .withColumn("conv_id", F.concat(F.lit("dup-"), "conv_id"))
            .withColumn("text", F.concat("text", F.lit(DUP_TAIL)))
        )
        src.unionByName(dups).repartition(128).write.mode(
            "overwrite"
        ).parquet(DUPS)
        print("dups corpus written:", spark.read.parquet(DUPS).count())
    else:
        print("dups corpus present: 1070811")
    spark.stop()


if __name__ == "__main__":
    main()
