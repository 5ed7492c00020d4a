"""Training-dataset assembly — the last mile of the pipeline: turning a
curated corpus into the thing a trainer actually reads.

Three operators:

- ``epoch_shuffle`` / ``write_epoch_shards`` — deterministic global
  shuffle of the training order + shard assignment.  The shuffle key is
  ``md5(seed \\x1f id...)``: engine-portable (the ``split_assign`` /
  ``mix_sample`` md5 recipe — Spark and DuckDB agree exactly on md5 hex
  strings while sharing no integer hash), run-stable, and cluster-size-
  independent — re-running the job on 10 or 1000 executors yields the
  SAME order and the SAME shard membership, which is what makes a
  training run reproducible and resumable mid-epoch.
- ``token_budget_sample`` — deterministic greedy assembly of a
  token-budgeted dataset: order candidate documents by a priority
  column (quality score, DSIR weight, ...), take documents while the
  running token total is under ``budget``.  The running total is a
  SCALABLE two-phase prefix sum (range-partition → per-partition
  window + broadcast partition offsets), never a single-partition
  global window — see the plan-shape note on the function.

Reference parity note: the reference (atlas-engineer/cl-readability)
is a single-document extraction library with no corpus surface; these
operators are part of the training-data-pipeline extension the build
brief asks for (dataset assembly over the extracted corpus).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from cl_readability_spark.functions.pins import attach_pins

_SEP = "\x1f"


def _shuffle_key(seed: int, id_cols: tuple[str, ...]) -> Column:
    return F.md5(
        F.concat_ws(
            _SEP,
            F.lit(str(int(seed))),
            *[F.col(c).cast("string") for c in id_cols],
        )
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int = 0,
    id_cols: tuple[str, ...] = ("doc_id",),
    n_shards: int = 64,
) -> DataFrame:
    """Adds ``shuffle_key`` (md5 hex of ``seed \\x1f id...``) and
    ``shard`` (first 8 hex chars as a 32-bit int, mod ``n_shards`` —
    the ``dsir_logweights`` bucket recipe).  The training order of an
    epoch is (``shard`` asc, ``shuffle_key`` asc): uniform, seeded, and
    identical on every engine and cluster size.  A new ``seed`` is a
    new epoch-order permutation over the same corpus.

    This is a pure projection — no shuffle, no python; the actual data
    movement happens once, in ``write_epoch_shards``."""
    key = _shuffle_key(seed, tuple(id_cols))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
        F.lit(int(n_shards)),
    )
    return df.withColumn("shuffle_key", key).withColumn("shard", shard)


def write_epoch_shards(
    df: DataFrame,
    path: str,
    seed: int = 0,
    id_cols: tuple[str, ...] = ("doc_id",),
    n_shards: int = 64,
    mode: str = "error",
) -> None:
    """Materialize one epoch's training order as ``shard=K/`` parquet
    directories: rows land in their shard's directory in
    ``shuffle_key`` order (a reader streaming shard dirs in shard order
    and each file sequentially sees the epoch permutation).

    Plan shape: ONE hash exchange on ``shard`` (``repartition(n_shards,
    shard)`` — explicit count, so each task writes whole shards) + a
    partition-local sort.  At 100 TB: the exchange moves each byte
    once; ``n_shards`` bounds output file count independent of executor
    count; no global sort, no single-partition stage."""
    out = epoch_shuffle(df, seed=seed, id_cols=id_cols, n_shards=n_shards)
    (
        out.repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "shuffle_key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    priority_col: str | None = None,
    id_col: str = "doc_id",
    n_ranges: int | None = None,
    join_back: bool = True,
) -> DataFrame:
    """Deterministic greedy token-budget assembly: order documents by
    (``priority_col`` DESC, ``id_col`` ASC) — ``id_col`` must be unique,
    making the order total — and select each document while the running
    token total BEFORE it is under ``budget`` (the selected set
    overshoots by less than one document, the standard greedy cut).
    NULL token counts ride as 0.  Adds ``cum_before_tokens`` and
    ``selected``; with ``join_back=False`` returns only (id, tokens,
    cum_before_tokens, selected) — the cheap frame to anti-join or
    report on.

    The running total is the classic scalable prefix sum, NOT a global
    window (``SUM() OVER (ORDER BY ...)`` with no partition spec puts
    the whole corpus through one task):

    1. range-partition the narrow (id, priority, tokens) projection on
       the total order into ``n_ranges`` contiguous ranges;
    2. stamp ``spark_partition_id()`` and PIN the stamped frame
       (DISK_ONLY) — range boundaries are sampled per-execution, so the
       stamp must be computed exactly once for the offsets and the
       window to agree;
    3. per-partition token totals → prefix offsets via a window over
       ``n_ranges`` ROWS (single-partition, but bounded by the
       partition COUNT, never by data);
    4. broadcast-join offsets back, in-partition cumulative window.

    Plan golden (tests/test_assembly.py): exactly one SinglePartition
    exchange, and it sits above the per-partition AGGREGATE, not the
    data.  The returned frame carries the pin — release with
    ``functions.pins.release_pinned`` when done.

    The DuckDB LOCAL twin (``token_budget``) re-derives the same
    selection with a plain global window — the oracle can afford the
    single-threaded form; the engine cannot.
    """
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    order_cols = []
    narrow_cols = [F.col(id_col)]
    if priority_col is not None:
        order_cols.append(F.col(priority_col).desc())
        narrow_cols.append(F.col(priority_col))
    order_cols.append(F.col(id_col).asc())
    narrow_cols.append(
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("_tok")
    )

    stamped = (
        df.select(*narrow_cols)
        .repartitionByRange(int(n_ranges), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.DISK_ONLY)
    )
    # prefix offsets: one row per RANGE, so the global window is over
    # n_ranges rows — bounded by partition count, not by data
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        stamped.groupBy("_pid")
        .agg(F.sum("_tok").alias("_ptot"))
        .select(
            "_pid",
            F.coalesce(F.sum("_ptot").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    w_cum = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        stamped.join(F.broadcast(offsets), "_pid")
        .withColumn("_cum", F.sum("_tok").over(w_cum) + F.col("_off"))
        .select(
            id_col,
            F.col("_tok").alias("budget_tokens"),
            (F.col("_cum") - F.col("_tok")).alias("cum_before_tokens"),
            (F.col("_cum") - F.col("_tok") < F.lit(int(budget))).alias(
                "selected"
            ),
        )
    )
    if join_back:
        out = df.join(cum.drop("budget_tokens"), id_col)
    else:
        out = cum
    return attach_pins(out, stamped)
