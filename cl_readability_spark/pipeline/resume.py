"""Snapshot-checkpointed, idempotently-resumable extraction job.

The job logic (``run_resumable``) is sink-agnostic and written against
``sink.KeyedSink``: resume = left-anti join of the source against the
committed keys, then one atomic batch append (SURVEY §2.11 joins row).
The production sink is Iceberg (``sink.IcebergSink`` — one snapshot per
append, time-travel resume); this sandbox has no Iceberg jars (offline;
checked at build time), so the default sink implements the identical
contract on parquet, exactly as SURVEY §7 step 4 specifies the fallback:

- output root holds ``batch=N/`` directories; a batch is committed iff Spark
  finished writing it (``_SUCCESS`` marker — atomic at job-commit, exactly
  the snapshot-manifest role).
- committed keys = union of (conv_id, turn_idx) over committed batches.
- a re-run after a mid-job kill neither duplicates nor drops rows: the
  half-written batch has no _SUCCESS → invisible; the anti-join re-selects
  its rows.

Swapping in Iceberg is a sink-object change only; the job DAG upstream of
the write is identical (asserted by the plan-identity test in
tests/test_spark_pipeline.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from cl_readability_spark.core.config import DEFAULT_CONFIG, ExtractorConfig
from cl_readability_spark.pipeline.job import extract_transcripts, metrics_sidecar
from cl_readability_spark.pipeline.sink import KEY_COLUMNS, KeyedSink


def pending_rows(transcripts: DataFrame, committed: DataFrame | None) -> DataFrame:
    """The resume anti-join: source rows whose keys are not yet committed.
    Broadcast-friendly when the committed side is small; at scale both
    sides shuffle on (conv_id, turn_idx) and AQE picks the strategy —
    exactly the Iceberg MERGE-style resume plan."""
    if committed is None:
        return transcripts
    return transcripts.join(committed, on=KEY_COLUMNS, how="left_anti")


def run_resumable(
    transcripts: DataFrame,
    sink: KeyedSink,
    config: ExtractorConfig = DEFAULT_CONFIG,
    salt_buckets: int = 16,
    num_partitions: int | None = None,
    metrics_root: str | None = None,
    prefilter_readerable: bool | str = False,
) -> int:
    """Extract every not-yet-committed turn into ``sink``; returns rows
    written.  Sink-agnostic: the same call works against parquet
    checkpoints here and an Iceberg table in production."""
    spark = transcripts.sparkSession
    sink.prepare(spark)
    committed = sink.committed_keys(spark)
    remaining = pending_rows(transcripts, committed)
    # fully-resumed RERUN: nothing pending → do not append an empty batch
    # (IcebergSink.write_batch REQUIRES each append to commit a child
    # snapshot and raises otherwise; an empty append may legitimately
    # commit nothing).  Guarded on prior commits existing: a FIRST run
    # over an empty source still writes its empty batch so sink.read()
    # keeps returning an empty frame rather than raising.  take(1) stops
    # at the first pending row, so a normal run pays at most one extra
    # partial anti-join pass.
    if committed is not None and not remaining.take(1):
        return 0
    result = extract_transcripts(
        remaining,
        config=config,
        salt_buckets=salt_buckets,
        num_partitions=num_partitions,
        prefilter_readerable=prefilter_readerable,
    )
    handle = sink.write_batch(result)
    # batch-scoped read-back via the sink protocol (NOT the cumulative
    # table): the returned count and the metrics sidecar must cover only
    # the rows THIS run wrote, for every sink — parquet batch dir here,
    # Iceberg incremental snapshot read in production
    written = sink.read_batch(spark, handle)
    if metrics_root is not None:
        metrics_sidecar(written).write.mode("append").parquet(metrics_root)
    return written.count()


class CheckpointedSink:
    """Parquet implementation of the KeyedSink contract (see module doc)."""

    def __init__(self, root: str):
        self.root = root
        self.key_columns = list(KEY_COLUMNS)
        self._last_write: dict | None = None
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

    # --- KeyedSink protocol ---
    def prepare(self, spark: SparkSession) -> None:
        # reset the per-run write handle: a fully-resumed rerun performs
        # NO write, and a stale handle from a previous run would make
        # run() rewrite a committed batch's manifest with rows=0
        self._last_write = None
        self.cleanup_uncommitted()

    def committed_keys(self, spark: SparkSession) -> DataFrame | None:
        batches = self.committed_batches()
        if not batches:
            return None
        return spark.read.parquet(*batches).select(*KEY_COLUMNS)

    def write_batch(self, df: DataFrame) -> str:
        batch_path = self._next_batch_path()
        t0 = time.time()
        df.write.mode("errorifexists").parquet(batch_path)
        self._last_write = {"path": batch_path, "seconds": time.time() - t0}
        return batch_path

    def read_batch(self, spark: SparkSession, handle: str) -> DataFrame:
        return spark.read.parquet(handle)

    def read(self, spark: SparkSession) -> DataFrame:
        batches = self.committed_batches()
        if not batches:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        return spark.read.parquet(*batches)

    # --- the resumable job (kept API; delegates to the generic runner) ---
    def run(
        self,
        transcripts: DataFrame,
        config: ExtractorConfig = DEFAULT_CONFIG,
        salt_buckets: int = 16,
        num_partitions: int | None = None,
        metrics_root: str | None = None,
        prefilter_readerable: bool | str = False,
    ) -> int:
        spark = transcripts.sparkSession
        n = run_resumable(
            transcripts,
            self,
            config=config,
            salt_buckets=salt_buckets,
            num_partitions=num_partitions,
            metrics_root=metrics_root,
            prefilter_readerable=prefilter_readerable,
        )
        last = self._last_write or {}
        batch_path = last.get("path")
        if batch_path:
            written = spark.read.parquet(batch_path)
            self._write_manifest(
                written, batch_path, n, last.get("seconds", 0.0), config,
                salt_buckets,
            )
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
