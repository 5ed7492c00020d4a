#!/usr/bin/env python
"""Ad-hoc profiling harness: run one registered twin query with the Spark
event log on, then print the job timeline (exec vs driver gaps).

Usage: python scripts/profile_query.py <query_name> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    evdir = "/tmp/spark-events-profile"
    os.makedirs(evdir, exist_ok=True)
    import shutil
    shutil.rmtree(evdir)
    os.makedirs(evdir)

    from cl_readability_spark.functions.sqltwins import SQL_TWINS
    from cl_readability_spark.pipeline.session import build_spark

    spark = build_spark(
        app_name=f"profile-{name}",
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
    entry = SQL_TWINS[name]
    fn = entry[0] if isinstance(entry, tuple) else entry
    marks = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        marks.append(dt)
        print(f"rep{i}: {dt:.3f}s")
    spark.stop()

    # parse the event log: job spans and gaps
    logs = []
    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        if os.path.isdir(p):
            logs += [os.path.join(p, g) for g in os.listdir(p)
                     if g.startswith("events_")]
        else:
            logs.append(p)
    jobs = {}
    for lf in logs:
        for line in open(lf):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
    order = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = None
    tot_exec = 0.0
    tot_gap = 0.0
    for jid, j in order:
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = 0.0 if prev_end is None else max(0.0, (j["start"] - prev_end) / 1000.0)
        tot_exec += dur
        tot_gap += gap
        print(f"job {jid:3d} exec {dur:7.3f}s gap {gap:7.3f}s  {j['desc']}")
        prev_end = j["end"]
    print(f"TOTAL exec {tot_exec:.2f}s gaps {tot_gap:.2f}s reps {marks}")


if __name__ == "__main__":
    main()
