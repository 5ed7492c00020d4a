#!/usr/bin/env python
"""extract_corpus rep0-vs-warm composition: event-log task metrics.

Usage: PYTHONPATH=/root/repo python scripts/extract_corpus_iso2.py [sf] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    evdir = "/tmp/spark-events-xc"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)

    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.job import extract_transcripts
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

    spark = build_spark(
        app_name="xc-iso",
        cores=32,
        shuffle_partitions=32,
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_conversations = max(20, int(15000 * sf))
    corpus = synthetic_transcripts(spark, n_conversations, seed=42).cache()
    n = corpus.count()
    print(f"corpus turns={n}")
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"xc rep{i}")
        t0 = time.perf_counter()
        ok = (
            extract_transcripts(corpus, salt_buckets=16)
            .filter(F.col("status") == "ok")
            .count()
        )
        print(f"rep{i}: {time.perf_counter() - t0:.3f}s ok={ok}")
    spark.stop()

    # parse: per (rep, stage) sums of task metrics
    stage_rep = {}
    agg = defaultdict(lambda: defaultdict(float))
    tmax = defaultdict(float)
    nt = defaultdict(int)
    for f in os.listdir(evdir):
        for line in open(os.path.join(evdir, f)):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for si in ev.get("Stage Infos", []):
                    stage_rep[si["Stage ID"]] = desc
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                info = ev.get("Task Info") or {}
                key = (stage_rep.get(sid, "?"), sid)
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3
                agg[key]["wall_sum"] += dur
                agg[key]["run"] += m.get("Executor Run Time", 0) / 1e3
                agg[key]["gc"] += m.get("JVM GC Time", 0) / 1e3
                agg[key]["deser"] += m.get("Executor Deserialize Time", 0) / 1e3
                agg[key]["fetch"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Fetch Wait Time", 0
                ) / 1e3
                agg[key]["swrite"] += (
                    (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Write Time", 0
                    )
                    / 1e9
                )
                agg[key]["pyboot"] = agg[key].get("pyboot", 0)
                tmax[key] = max(tmax[key], dur)
                nt[key] += 1
    for key in sorted(agg, key=lambda k: (k[0], k[1])):
        a = agg[key]
        print(
            f"{key[0][:12]:12s} stage {key[1]:3d} n={nt[key]:4d} "
            f"wallsum={a['wall_sum']:8.1f} run={a['run']:8.1f} "
            f"gc={a['gc']:6.1f} deser={a['deser']:6.1f} "
            f"fetch={a['fetch']:6.1f} swrite={a['swrite']:6.1f} "
            f"taskmax={tmax[key]:6.1f}"
        )


if __name__ == "__main__":
    main()
