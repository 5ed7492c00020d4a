#!/usr/bin/env python
"""Hot-line skew evidence for the round-7 line_dedup reformulation.

Builds a Zipfian-pathology corpus — ONE boilerplate line ("please enable
javascript...") planted in EVERY document, ~10% of all line occurrences —
and runs cross-document line dedup two ways on the identical input:

- ``window``: the round-6 formulation, ``row_number()`` over
  ``Window.partitionBy(line_key)`` — every occurrence of the hot line
  lands in ONE window partition, which AQE cannot split: one task sorts
  the hot line's entire population (the 10^12-scale straggler the
  round-6 VERDICT marked ``weak``).
- ``agg_join``: the shipped operator (functions/dedup.py:line_dedup) —
  ``groupBy(key).agg(min(struct(id, idx)))`` partial-aggregates map-side
  (the hot key crosses the shuffle as one slim row per input partition)
  and keeps are marked by joining winners back on (id, line_idx), a
  unique-per-row key on both sides: skew-free by construction, no AQE
  skew-split reliance (which provably does NOT fire on the line-key
  join shape — see the operator docstring).

Both variants force the full reassembly with sum(length(deduped_text))
(Catalyst prunes unreferenced aggregate outputs — BENCH/BASELINE.md
round-6 note) and both are asserted to produce IDENTICAL
(n_docs, sum n_kept_lines, sum length(deduped_text)) triples.

Reports wall-clock and per-task p50/p99/max of the heaviest stage from
the Spark status API; appends to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

HOT_LINE = "please enable javascript to view the comments powered by disqus"


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cl_readability_spark.functions.dedup import line_dedup
    from cl_readability_spark.pipeline.session import build_spark

    n_docs = int(os.environ.get("LD_SKEW_DOCS", "300000"))
    spark = build_spark(
        app_name="line-dedup-skew-bench", cores=16, shuffle_partitions=64,
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4907"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import urllib.request

    ui_base = spark.sparkContext.uiWebUrl

    def _api(path: str):
        with urllib.request.urlopen(f"{ui_base}/api/v1{path}") as r:
            return json.load(r)

    app_id = _api("/applications")[0]["id"]

    def _completed_stages() -> dict:
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _api(f"/applications/{app_id}/stages?status=complete")
        }

    def _task_percentiles(before: dict) -> dict:
        """Task-duration percentiles POOLED across every stage the run
        created (picking only the heaviest-by-executorRunTime stage can
        miss the straggler stage entirely — the window's hot task lives
        in the window exchange stage, which AQE-coalesced runs don't
        always make the heaviest)."""
        new = [s for k, s in _completed_stages().items() if k not in before]
        if not new:
            return {}
        durs: list[int] = []
        for stage in new:
            tasks = _api(
                f"/applications/{app_id}/stages/{stage['stageId']}/"
                f"{stage['attemptId']}/taskList?length=2000"
            )
            durs.extend(t["duration"] for t in tasks if "duration" in t)
        durs.sort()
        if not durs:
            return {}

        def pct(p: float) -> int:
            return durs[min(len(durs) - 1, int(p * (len(durs) - 1) + 0.5))]

        return {
            "n_tasks": len(durs),
            "task_p50_ms": pct(0.50),
            "task_p99_ms": pct(0.99),
            "task_max_ms": durs[-1],
        }

    def make_docs(hot_copies: int):
        """~(8+hot) lines/doc: the hot boilerplate line planted
        ``hot_copies`` times in EVERY doc (hot_copies*n occurrences of
        ONE 128-bit key — the knob that models a 10^8-occurrence
        boilerplate line), 3 semi-shared lines (1k-doc sharing groups),
        5 doc-unique lines.  Deterministic: pure column exprs."""
        return (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    "\n",
                    F.concat(F.lit("title of document "), F.col("id")),
                    *[F.lit(HOT_LINE) for _ in range(hot_copies)],
                    F.concat(F.lit("group line a "), F.col("id") % 1000),
                    F.concat(F.lit("group line b "), F.col("id") % 1000),
                    F.concat(F.lit("group line c "), F.col("id") % 1000),
                    F.concat(F.lit("body one "), F.col("id")),
                    F.concat(F.lit("body two "), F.col("id")),
                    F.concat(F.lit("body three "), F.col("id")),
                    F.concat(F.lit("body four "), F.col("id")),
                ).alias("text"),
            )
            .repartition(64)
            .persist()
        )

    def window_variant(df):
        """The round-6 row_number-window formulation, verbatim shape."""
        lines = df.select(
            F.col("doc_id").alias("_id"),
            F.posexplode_outer(F.split(F.col("text"), "\n")).alias(
                "_line_idx", "_line"
            ),
        )
        norm = F.lower(
            F.regexp_replace(
                F.col("_line"), r"^[ \t\f\r\x0B]+|[ \t\f\r\x0B]+$", ""
            )
        )
        lines = lines.withColumn(
            "_is_blank", F.coalesce(norm, F.lit("")) == ""
        )
        lines = lines.withColumn(
            "_lkey",
            F.when(
                F.col("_is_blank"),
                F.xxhash64(F.col("_id").cast("string"), F.col("_line_idx")),
            ).otherwise(F.xxhash64(norm)),
        ).withColumn(
            "_lkey2",
            F.when(F.col("_is_blank"), F.lit(0).cast("long")).otherwise(
                F.xxhash64(norm, F.lit("ld2"))
            ),
        )
        w = Window.partitionBy("_is_blank", "_lkey", "_lkey2").orderBy(
            "_id", "_line_idx"
        )
        ranked = lines.withColumn(
            "_keep",
            F.col("_line").isNotNull()
            & (F.col("_is_blank") | (F.row_number().over(w) == 1)),
        )
        return (
            ranked.groupBy("_id")
            .agg(
                F.count("_line").cast("long").alias("n_lines"),
                F.sum(F.col("_keep").cast("long")).alias("n_kept_lines"),
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_keep"),
                                    F.struct(
                                        F.col("_line_idx"), F.col("_line")
                                    ),
                                )
                            )
                        ),
                        lambda s: s["_line"],
                    ),
                ).alias("deduped_text"),
            )
            .select(
                F.col("_id").alias("doc_id"),
                "n_lines",
                F.coalesce("n_kept_lines", F.lit(0)).alias("n_kept_lines"),
                F.when(F.col("n_lines") > 0, F.col("deduped_text")).alias(
                    "deduped_text"
                ),
            )
        )

    def force(out_df):
        # reference EVERY expensive output column or Catalyst prunes the
        # reassembly (BASELINE.md round-6 benchmarking note)
        return out_df.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_kept_lines").alias("kept"),
            F.sum(F.length("deduped_text")).alias("bytes"),
        ).collect()[0]

    variants = {
        "window_r6": window_variant,
        "agg_join_r7": line_dedup,
    }
    reps = int(os.environ.get("LD_SKEW_REPS", "2"))
    hot_sweep = [int(x) for x in os.environ.get("LD_SKEW_HOT", "1,5").split(",")]
    # the straggler claim is about GROWTH: the window's hot task grows
    # linearly with the hot line's multiplicity (one unsplittable window
    # partition sorts every occurrence), the aggregation's does not
    # (map-side partial_min collapses the hot key per input partition,
    # and kept output is identical at every multiplicity, so the shared
    # reassembly stage is constant across the sweep)
    results: dict[tuple, dict] = {}
    for hot in hot_sweep:
        docs = make_docs(hot)
        n = docs.count()
        small = docs.limit(64)
        for make in variants.values():
            force(make(small))  # warm code paths
        checks = {}
        for rep in range(reps):
            for name, make in variants.items():
                before = _completed_stages()
                t0 = time.perf_counter()
                row = force(make(docs))
                dt = time.perf_counter() - t0
                pcts = _task_percentiles(before)
                cur = results.get((name, hot))
                if cur is None or dt < cur["seconds"]:
                    results[(name, hot)] = {"seconds": round(dt, 2), **pcts}
                checks[name] = (row.n_docs, row.kept, row.bytes)
        assert len(set(checks.values())) == 1, f"variants differ: {checks}"
        results[("equal_outputs", hot)] = list(checks.values())[0]
        docs.unpersist()

    out = {
        "metric": "line_dedup hot-line skew sweep (hot multiplicity)",
        "docs": n_docs,
        "hot_sweep": hot_sweep,
        "results": {f"{k[0]}@hot{k[1]}": v for k, v in results.items()},
    }
    print(json.dumps(out))

    def _row(name: str, hot: int) -> str:
        r = results[(name, hot)]
        return (
            f"| {name} | {hot} | {hot * n_docs:,} | {r['seconds']} | "
            f"{r.get('task_p50_ms', '—')} | {r.get('task_p99_ms', '—')} | "
            f"{r.get('task_max_ms', '—')} |"
        )

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## line_dedup hot-line skew sweep — round 7\n\n"
            f"{n_docs:,} docs, ONE boilerplate line planted `hot` times in "
            f"every doc; min-of-{reps} alternating per multiplicity in one "
            f"session, 16 cores / 64 shuffle partitions; task percentiles "
            f"pooled over every stage of the run; per-multiplicity outputs "
            f"asserted identical across variants (kept output is the same "
            f"at every multiplicity — dup copies always drop — so growth "
            f"in task-max is pure keep-decision cost).\n\n"
            f"| variant | hot copies/doc | hot-key rows | seconds | "
            f"task p50 ms | task p99 ms | task max ms |\n"
            f"|---|---|---|---|---|---|---|\n"
            + "\n".join(
                _row(name, hot)
                for hot in hot_sweep
                for name in ("window_r6", "agg_join_r7")
            )
            + f"\n\nThe r6 window formulation funnels the hot key into one "
            f"unsplittable task — its straggler grows with the hot line's "
            f"multiplicity; the r7 formulation collapses the hot key "
            f"map-side (partial_min) and joins winners back on "
            f"(id, line_idx) — unique per row on both sides — so every "
            f"exchange is skew-free BY CONSTRUCTION (no AQE skew-split "
            f"reliance) and its task tail stays bounded at any "
            f"multiplicity.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
