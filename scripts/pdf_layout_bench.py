#!/usr/bin/env python
"""Scale + whale-skew evidence for the PDF/layout front-end
(pipeline/pdf_layout.py).

Two probes over JVM-built toy payloads (no driver-side corpus loops):

- **throughput**: N docs x 3 pages x 34 boxes (repeated header/footer,
  tiny watermark, 30 body lines in 6 paragraphs) through
  decode -> assembly, forced via sum(chars_out) (Catalyst prunes
  unreferenced aggregate outputs).  Payload frame is persisted and
  counted BEFORE timing so the measured wall is the operator, not the
  synthetic payload construction.  Min-of-2 reported.
- **whale**: the same corpus with doc 0 blown up to WHALE_PAGES pages
  (a 100x document).  Every window/aggregation in the assembly is
  doc-keyed, so the whale can amplify only ITS OWN task — pooled task
  percentiles from the status API document that p50/p99 stay at the
  normal-doc cost while only task_max carries the whale.

Prints one JSON line per probe; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from cl_readability_spark.pipeline.pdf_layout import pdf_extract
    from cl_readability_spark.pipeline.session import build_spark

    n_docs = int(os.environ.get("PDF_BENCH_DOCS", "100000"))
    whale_docs = int(os.environ.get("PDF_WHALE_DOCS", "20000"))
    whale_pages = int(os.environ.get("PDF_WHALE_PAGES", "300"))
    cores = int(os.environ.get("PDF_BENCH_CPUS", "32"))

    spark = build_spark(
        app_name="pdf-layout-bench", cores=cores,
        shuffle_partitions=max(cores, 32),
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4909"},
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
        new = [s for k, s in _completed_stages().items() if k not in before]
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

    LINES_PER_PAGE = 30

    def payload_expr(n_pages_col):
        d = F.col("doc_id").cast("string")

        def page_arr(pg):
            y0 = lambda k: (F.lit(120) + k * 14 + (k / 5).cast("int") * 10)
            body = F.transform(
                F.sequence(F.lit(0), F.lit(LINES_PER_PAGE - 1)),
                lambda k: F.concat(
                    F.lit("box 50 "),
                    y0(k).cast("string"),
                    F.lit(" 270 "),
                    (y0(k) + 12).cast("string"),
                    F.lit(" 10 body "),
                    d,
                    F.lit(" p"),
                    pg.cast("string"),
                    F.lit(" l"),
                    k.cast("string"),
                    F.lit(" t"),
                    F.pmod(
                        F.xxhash64(d, k.cast("string"), pg.cast("string")),
                        F.lit(997),
                    ).cast("string"),
                ),
            )
            head = F.array(
                F.lit("page 612 792"),
                F.lit("box 50 20 250 32 10 Corp Report"),
                F.concat(F.lit("box 280 760 330 770 9 Page "), pg.cast("string")),
                F.lit("box 560 300 568 380 4 draft note"),
            )
            return F.concat(head, body)

        pages = F.flatten(
            F.transform(F.sequence(F.lit(1), n_pages_col), page_arr)
        )
        return F.encode(
            F.concat_ws(
                "\n", F.concat(F.array(F.lit("PDFFAKE1")), pages)
            ),
            "UTF-8",
        )

    def build_corpus(n: int, n_pages_col):
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                payload_expr(n_pages_col).alias("payload"),
            )
            .repartition(max(cores, 32))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        df.count()
        return df

    def run_once(df):
        t0 = time.perf_counter()
        row = (
            pdf_extract(df)
            .filter(F.col("status") == "ok")
            .agg(
                F.count("*").alias("docs"),
                F.sum("chars_out").alias("chars"),
                F.sum("n_boxes").alias("boxes"),
                F.sum("n_paragraphs").alias("paras"),
                F.sum("n_repeated_removed").alias("rep"),
            )
            .collect()[0]
        )
        return time.perf_counter() - t0, row.asDict()

    # --- probe 1: throughput, min-of-2 -------------------------------
    corpus = build_corpus(n_docs, F.lit(3))
    walls, stats = [], None
    for _ in range(2):
        w, stats = run_once(corpus)
        walls.append(round(w, 2))
    wall = min(walls)
    boxes = stats["boxes"] + stats.get("rep", 0) * 0  # real boxes forced
    print(json.dumps({
        "probe": "throughput",
        "n_docs": n_docs,
        "walls_sec": walls,
        "wall_sec": wall,
        "docs_per_sec": round(n_docs / wall, 1),
        "boxes_per_sec": round(boxes / wall, 1),
        "stats": stats,
    }))
    corpus.unpersist()

    # --- probe 2: whale doc ------------------------------------------
    for pages, tag in ((3, "uniform"), (whale_pages, "whale")):
        npg = (
            F.when(F.col("id") == 0, F.lit(pages)).otherwise(F.lit(3))
            if tag == "whale"
            else F.lit(3)
        )
        df = build_corpus(whale_docs, npg)
        before = _completed_stages()
        w, stats = run_once(df)
        pcts = _task_percentiles(before)
        print(json.dumps({
            "probe": f"whale-{tag}",
            "n_docs": whale_docs,
            "whale_pages": pages if tag == "whale" else 3,
            "wall_sec": round(w, 2),
            **pcts,
            "stats": stats,
        }))
        df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
