"""Training-dataset assembly — the last mile of the pipeline: turning a
curated corpus into the thing a trainer actually reads.

Four operators:

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
- ``rank_buckets`` — stratify a corpus into N equal-size buckets by
  global score rank, optionally within groups (per-language) — the
  CCNet head/middle/tail partition (Wenzek et al. 2020 §4.4) and the
  general tool for building quality-stratified training mixes.  Same
  two-phase machinery: the rank is a scalable prefix COUNT, never an
  ``ntile() OVER (ORDER BY score)`` single-partition window.

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

    # pin the narrow projection BEFORE the range partitioner: range
    # boundaries are derived from a SAMPLING job that evaluates the
    # projection once, and the exchange then evaluates it again — for a
    # token-count projection (a tokenize per row) that doubles the real
    # work.  The pin is narrow (id + one or two longs), so both the
    # sampler and the exchange read it instead (one source evaluation).
    narrow = df.select(*narrow_cols).persist(StorageLevel.DISK_ONLY)
    stamped = (
        narrow.repartitionByRange(int(n_ranges), *order_cols)
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
    return attach_pins(out, stamped, narrow)


def rank_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    group_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
    ascending: bool = True,
    labels: tuple[str, ...] | None = None,
    n_ranges: int | None = None,
    join_back: bool = True,
    bucket_col: str = "rank_bucket",
) -> DataFrame:
    """Stamp every row with its global score-rank bucket ``1..n_buckets``
    (optionally per ``group_cols`` stratum): bucket =
    ``1 + floor((rank - 1) * n_buckets / group_count)`` over the total
    order (``score_col`` asc-or-desc, ``id_col`` asc — ``id_col`` must
    be unique, making ties deterministic).  NULL scores sort FIRST when
    ascending / LAST when descending (Spark's default null ordering is
    mirrored explicitly so the DuckDB twin agrees).  With 3 buckets and
    ascending perplexity this is exactly the CCNet head/middle/tail
    corpus partition (Wenzek et al. 2020 §4.4).  ``labels`` (length
    ``n_buckets``) adds a ``<bucket_col>_label`` column.

    Scale shape — the naive form is ``ntile(n) OVER (PARTITION BY grp
    ORDER BY score)``, a per-group SinglePartition window (one task
    sorts the whole stratum; with no groups, the whole corpus).  Here
    the global rank is a two-phase prefix COUNT, the
    ``token_budget_sample`` recipe:

    1. range-partition the narrow (group, score, id) projection on the
       total order (groups lead the range key, so a stratum occupies a
       contiguous run of ranges);
    2. stamp ``spark_partition_id()`` + PIN (range boundaries are
       sampled per-execution — the offsets job and the rank job must
       see the same assignment);
    3. per-(partition, group) row counts → per-group prefix offsets +
       group totals via windows over the COUNTS frame (≤ n_ranges +
       n_groups rows — bounded by partition/group count, never data);
    4. broadcast offsets back; rank = offset + in-partition
       ``row_number`` keyed by (partition, group) — no global sort, no
       single-partition stage over rows.

    The returned frame carries the pin — release with
    ``functions.pins.release_pinned`` when done.  The DuckDB LOCAL twin
    (``ppl_buckets``) re-derives the same bucket with the plain
    ``row_number()/count(*)`` global window the oracle can afford.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if labels is not None and len(labels) != int(n_buckets):
        raise ValueError(
            f"labels must have exactly n_buckets={n_buckets} entries, "
            f"got {len(labels)}"
        )
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    score = F.col(score_col)
    order_cols = [
        score.asc_nulls_first() if ascending else score.desc_nulls_last(),
        F.col(id_col).asc(),
    ]
    range_cols = [*[F.col(c) for c in group_cols], *order_cols]
    grp = [F.col(c) for c in group_cols]

    # narrow pre-range pin: the range sampler + the exchange would each
    # evaluate the projection (see token_budget_sample)
    narrow = df.select(id_col, *group_cols, score_col).persist(
        StorageLevel.DISK_ONLY
    )
    stamped = (
        narrow.repartitionByRange(int(n_ranges), *range_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.DISK_ONLY)
    )
    # counts frame: one row per (range, stratum) cell — strata are
    # contiguous under the range key, so cells ≤ n_ranges + n_groups
    counts = stamped.groupBy("_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_pn")
    )
    w_base = (
        Window.partitionBy(*grp).orderBy("_pid")
        if group_cols
        else Window.orderBy("_pid")
    )
    # offsets + totals share one window spec → ONE Window operator /
    # exchange over the bounded counts frame
    offsets = counts.select(
        "_pid",
        *group_cols,
        F.coalesce(
            F.sum("_pn").over(
                w_base.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
        F.sum("_pn")
        .over(
            w_base.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_gn"),
    )
    w_rn = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    rank = F.col("_off") + F.row_number().over(w_rn)
    bucket = (
        F.lit(1)
        + F.floor(
            (rank - F.lit(1)) * F.lit(int(n_buckets)) / F.col("_gn")
        )
    ).cast("int")
    ranked = (
        stamped.join(
            F.broadcast(offsets), ["_pid", *group_cols]
        )
        .withColumn("score_rank", rank)
        .withColumn(bucket_col, bucket)
        .select(id_col, "score_rank", bucket_col)
    )
    if labels is not None:
        ranked = ranked.withColumn(
            bucket_col + "_label",
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col(bucket_col)
            ),
        )
    out = df.join(ranked, id_col) if join_back else ranked
    return attach_pins(out, stamped, narrow)
