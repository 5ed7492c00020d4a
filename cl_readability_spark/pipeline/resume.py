"""Snapshot-checkpointed, idempotently-resumable extraction sink.

Production target is an Iceberg table: each batch append is one atomic
snapshot, and resume = left-anti join of the source against the committed
keys of the last snapshot (SURVEY §2.11 joins row).  This sandbox has no
Iceberg jars (offline; checked at build time), so the same contract is
implemented on parquet, exactly as SURVEY §7 step 4 specifies the fallback:

- output root holds ``batch=N/`` directories; a batch is committed iff Spark
  finished writing it (``_SUCCESS`` marker — atomic at job-commit, exactly
  the snapshot-manifest role).
- committed keys = union of (conv_id, turn_idx) over committed batches.
- a re-run after a mid-job kill neither duplicates nor drops rows: the
  half-written batch has no _SUCCESS → invisible; the anti-join re-selects
  its rows.

Swapping in Iceberg is a sink-level change only (writeTo(...).append() and
``VALID_FROM`` snapshot reads); the job DAG is identical.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from cl_readability_spark.core.config import DEFAULT_CONFIG, ExtractorConfig
from cl_readability_spark.pipeline.job import (
    OUTPUT_COLUMNS,
    extract_transcripts,
    metrics_sidecar,
)

KEY_COLUMNS = ["conv_id", "turn_idx"]


class CheckpointedSink:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- snapshot bookkeeping ---
    def committed_batches(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.root)):
            path = os.path.join(self.root, name)
            if name.startswith("batch=") and os.path.exists(
                os.path.join(path, "_SUCCESS")
            ):
                out.append(path)
        return out

    def _next_batch_path(self) -> str:
        existing = [
            int(n.split("=", 1)[1])
            for n in os.listdir(self.root)
            if n.startswith("batch=")
        ]
        return os.path.join(self.root, f"batch={max(existing, default=-1) + 1}")

    def cleanup_uncommitted(self) -> None:
        """Drop half-written batch dirs (no _SUCCESS) before resuming."""
        for name in os.listdir(self.root):
            path = os.path.join(self.root, name)
            if name.startswith("batch=") and not os.path.exists(
                os.path.join(path, "_SUCCESS")
            ):
                shutil.rmtree(path)

    def committed_keys(self, spark: SparkSession) -> DataFrame | None:
        batches = self.committed_batches()
        if not batches:
            return None
        return spark.read.parquet(*batches).select(*KEY_COLUMNS)

    def read(self, spark: SparkSession) -> DataFrame:
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        return spark.read.parquet(*batches)

    # --- the resumable job ---
    def run(
        self,
        transcripts: DataFrame,
        config: ExtractorConfig = DEFAULT_CONFIG,
        salt_buckets: int = 16,
        num_partitions: int | None = None,
        metrics_root: str | None = None,
    ) -> int:
        """Extract every not-yet-committed turn; returns rows written.

        The anti-join is broadcast-friendly when the committed side is small;
        at scale both sides shuffle on (conv_id, turn_idx) and AQE picks the
        strategy — exactly the Iceberg MERGE-style resume plan."""
        spark = transcripts.sparkSession
        self.cleanup_uncommitted()
        committed = self.committed_keys(spark)
        remaining = transcripts
        if committed is not None:
            remaining = transcripts.join(committed, on=KEY_COLUMNS, how="left_anti")
        result = extract_transcripts(
            remaining,
            config=config,
            salt_buckets=salt_buckets,
            num_partitions=num_partitions,
        )
        batch_path = self._next_batch_path()
        t0 = time.time()
        result.write.mode("errorifexists").parquet(batch_path)
        written = spark.read.parquet(batch_path)
        if metrics_root is not None:
            metrics_sidecar(written).write.mode("append").parquet(metrics_root)
        n = written.count()
        self._write_manifest(written, batch_path, n, time.time() - t0, config,
                             salt_buckets)
        return n

    def _write_manifest(self, written: DataFrame, batch_path: str, n_rows: int,
                        seconds: float, config: ExtractorConfig,
                        salt_buckets: int) -> None:
        """Snapshot-manifest equivalent: per-batch lineage (row/status/char
        counts, config, timing) next to the data — the operational metadata
        an Iceberg snapshot summary would carry."""
        by_status = {
            r["status"]: {
                "rows": r["rows"],
                "chars_in": r["ci"] or 0,
                "chars_kept": r["ck"] or 0,
                "retries": r["rt"] or 0,
            }
            for r in written.groupBy("status")
            .agg(
                F.count("*").alias("rows"),
                F.sum("chars_in").alias("ci"),
                F.sum("chars_kept").alias("ck"),
                F.sum("retries").alias("rt"),
            )
            .collect()
        }
        cfg = dataclasses.asdict(config)
        cfg["preserved_classes"] = sorted(cfg["preserved_classes"])
        vc = cfg.get("visibility_checker")
        cfg["visibility_checker"] = getattr(vc, "__qualname__", None) if vc else None
        manifest = {
            "batch": os.path.basename(batch_path),
            "rows": n_rows,
            "seconds": round(seconds, 3),
            "by_status": by_status,
            "salt_buckets": salt_buckets,
            "config": cfg,
        }
        with open(os.path.join(batch_path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)
