#!/usr/bin/env python
"""Isolated sft_dataset profiling over the bench corpus with event log.

Usage: PYTHONPATH=/root/repo python scripts/sft_dataset_iso.py [sf] [reps]
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
    evdir = "/tmp/spark-events-sft"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)

    from pyspark.sql import functions as F

    from cl_readability_spark.functions.sft import sft_dataset
    from cl_readability_spark.pipeline.session import build_spark
    from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

    spark = build_spark(
        app_name="sft-iso", cores=32, shuffle_partitions=32,
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
    print("turns:", corpus.count())
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"sft rep{i}")
        t0 = time.perf_counter()
        out = sft_dataset(
            corpus, max_context_tokens=256,
            conv_gate_opts={"require_user_start": False},
        )
        n = int(out.agg(F.count("*")).collect()[0][0])
        print(f"rep{i}: {time.perf_counter() - t0:.3f}s n={n}")
    spark.stop()

    jobs = {}
    stage_rep = {}
    stsum = defaultdict(lambda: [0.0, 0, 0.0])
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
                jobs[ev["Job ID"]] = {"start": ev["Submission Time"], "desc": desc}
                for si in ev.get("Stage Infos", []):
                    stage_rep[si["Stage ID"]] = desc
            elif e == "SparkListenerJobEnd":
                jobs.setdefault(ev["Job ID"], {})["end"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                info = ev.get("Task Info") or {}
                s = stsum[(stage_rep.get(sid, "?"), sid)]
                s[0] += (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3
                s[1] += 1
                s[2] = max(s[2], (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3)
    order = sorted((j for j in jobs.items() if "end" in j[1] and "start" in j[1]),
                   key=lambda kv: kv[1]["start"])
    prev = None
    for jid, j in order:
        dur = (j["end"] - j["start"]) / 1000
        gap = 0 if prev is None else max(0, (j["start"] - prev) / 1000)
        print(f"job {jid:3d} exec {dur:7.3f} gap {gap:7.3f}  {j.get('desc','')[:30]}")
        prev = j["end"]
    for key in sorted(stsum):
        s = stsum[key]
        print(f"{key[0][:10]:10s} stage {key[1]:3d} n={s[1]:4d} wallsum={s[0]:8.1f} taskmax={s[2]:6.1f}")


if __name__ == "__main__":
    main()
