"""Sink protocol for snapshot-checkpointed, idempotently-resumable writes.

The resume job (``resume.run_resumable``) is sink-agnostic: it needs only
(a) the committed key set to anti-join away, and (b) an atomic batch
append.  Two implementations:

- ``resume.CheckpointedSink`` — parquet + ``_SUCCESS`` markers (the
  sandbox implementation; jars-free).
- ``IcebergSink`` — the production target (SURVEY §7 step 4):
  ``writeTo(table).append()`` is one atomic snapshot, committed keys come
  from the table (optionally pinned to a snapshot id for time-travel
  resume).  Requires an Iceberg catalog on the session; its constructor
  fails loudly when none is configured (this sandbox ships no Iceberg
  jars, so the class is exercised via the plan-identity test only — the
  job DAG upstream of the sink is asserted identical for both sinks).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession

KEY_COLUMNS = ["conv_id", "turn_idx"]


@runtime_checkable
class KeyedSink(Protocol):
    """Atomic-append sink with a committed-key view for resume."""

    key_columns: list[str]

    def prepare(self, spark: SparkSession) -> None:
        """Pre-run housekeeping (e.g. drop half-written batches)."""

    def committed_keys(self, spark: SparkSession) -> DataFrame | None:
        """Keys already durably written, or None when nothing is."""

    def write_batch(self, df: DataFrame) -> str:
        """Atomically append one batch; returns a batch/snapshot handle."""

    def read(self, spark: SparkSession) -> DataFrame:
        """The committed table contents."""


class IcebergSink:
    """Iceberg-table implementation of the KeyedSink contract.

    Append atomicity and resume visibility are exactly Iceberg's snapshot
    semantics: ``writeTo(...).append()`` commits one snapshot; a killed job
    leaves no visible rows, so the next run's anti-join re-selects its
    work.  ``snapshot_id`` pins ``committed_keys``/``read`` to a past
    snapshot (time-travel resume: replays everything after that snapshot).
    """

    def __init__(
        self,
        table: str,
        key_columns: list[str] | None = None,
        snapshot_id: int | None = None,
    ):
        self.table = table
        self.key_columns = list(key_columns or KEY_COLUMNS)
        self.snapshot_id = snapshot_id

    @staticmethod
    def is_available(spark: SparkSession) -> bool:
        """True when an Iceberg catalog is configured on this session."""
        confs = spark.sparkContext.getConf().getAll()
        return any(
            k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
            for k, v in confs
        )

    def _require(self, spark: SparkSession) -> None:
        if not self.is_available(spark):
            raise RuntimeError(
                "IcebergSink needs an Iceberg catalog "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
                "none configured on this session — use CheckpointedSink, which "
                "implements the identical resume contract on parquet."
            )

    def prepare(self, spark: SparkSession) -> None:
        # Iceberg needs no cleanup: uncommitted writes are invisible by
        # construction (no snapshot was committed).
        self._require(spark)

    def _table_df(self, spark: SparkSession) -> DataFrame:
        if self.snapshot_id is not None:
            return (
                spark.read.option("snapshot-id", str(self.snapshot_id))
                .format("iceberg")
                .load(self.table)
            )
        return spark.table(self.table)

    def committed_keys(self, spark: SparkSession) -> DataFrame | None:
        self._require(spark)
        try:
            return self._table_df(spark).select(*self.key_columns)
        except Exception:  # table does not exist yet → first run
            return None

    def write_batch(self, df: DataFrame) -> str:
        self._require(df.sparkSession)
        df.writeTo(self.table).append()
        return self.table

    def read(self, spark: SparkSession) -> DataFrame:
        self._require(spark)
        return self._table_df(spark)
