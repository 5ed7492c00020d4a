"""Spark-shell tests: UDF↔core equivalence, salting, ordering, resume
idempotence, metrics (SURVEY §5 layer 3)."""

import pytest

from pyspark.sql import functions as F

from cl_readability_spark.core.extract import extract
from cl_readability_spark.pipeline.job import (
    extract_transcripts,
    metrics_rollup,
    metrics_sidecar,
)
from cl_readability_spark.pipeline.resume import CheckpointedSink
from cl_readability_spark.pipeline.transcripts import (
    documents_as_transcripts,
    synthetic_transcripts,
)

pytestmark = pytest.mark.spark

N_CONV = 6  # small but multi-partition


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synthetic_transcripts(spark, N_CONV, seed=42).cache()
    df.count()
    return df


def test_transcripts_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert dict(transcripts.dtypes)["turn_idx"] == "int"
    assert dict(transcripts.dtypes)["ts"] == "timestamp"


def test_spark_matches_core_exactly(spark, transcripts):
    """Row-for-row equality between the vectorized UDF path and direct
    Python calls — the Arrow plumbing must add nothing."""
    result = extract_transcripts(transcripts).collect()
    via_spark = {
        (r.conv_id, r.turn_idx): (
            r.extracted_text,
            tuple((s.start, s.end) for s in r.content_spans),
            r.status,
        )
        for r in result
    }
    rows = transcripts.select("conv_id", "turn_idx", "text").collect()
    assert len(rows) == len(via_spark)
    for row in rows:
        r = extract(row.text)
        assert via_spark[(row.conv_id, row.turn_idx)] == (
            r.extracted_text,
            tuple(r.content_spans),
            r.status,
        ), f"mismatch at {row.conv_id}/{row.turn_idx}"


def test_statuses_present(spark, transcripts):
    statuses = {
        r.status
        for r in extract_transcripts(transcripts).select("status").distinct().collect()
    }
    assert "ok" in statuses
    # corpus has malformed/plain rows but they still parse (html.parser is
    # forgiving) — so only assert no hard errors slipped through as nulls
    assert None not in statuses


def test_ordering_within_partitions(spark, transcripts):
    result = extract_transcripts(transcripts, salt_buckets=4)
    parts = result.select(
        F.spark_partition_id().alias("pid"), "conv_id", "turn_idx"
    ).collect()
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r.pid, []).append((r.conv_id, r.turn_idx))
    for pid, keys in by_pid.items():
        assert keys == sorted(keys), f"partition {pid} not ordered"


def test_salting_spreads_conversations(spark):
    """One giant conversation must land on >1 partition."""
    df = synthetic_transcripts(spark, 1, seed=7)
    n_turns = df.count()
    if n_turns < 4:
        pytest.skip("conversation too short to observe spread")
    from cl_readability_spark.pipeline.job import salted_repartition

    pids = (
        salted_repartition(df.select("conv_id", "turn_idx", "text"), 4, salt_buckets=4)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert pids > 1


def test_metrics_sidecar_and_rollup(spark, transcripts):
    result = extract_transcripts(transcripts).cache()
    side = metrics_sidecar(result)
    assert side.count() == result.count()
    assert set(side.columns) == {
        "partition_id", "conv_id", "turn_idx", "status",
        "candidates_scored", "retries", "chars_in", "chars_kept",
    }
    roll = metrics_rollup(result).collect()
    assert sum(r.rows for r in roll) == result.count()
    ok_row = [r for r in roll if r.status == "ok"][0]
    assert ok_row.total_chars_kept > 0
    result.unpersist()


def test_readerable_prefilter(spark, transcripts):
    full = extract_transcripts(transcripts).count()
    filtered = extract_transcripts(transcripts, prefilter_readerable=True).count()
    assert 0 < filtered <= full


def test_readerable_prefilter_jvm_variant(spark, transcripts):
    """The 'jvm' triage prefilter (regexp expressions, no python pass) must
    select nearly the same rows as the exact DOM triage and keep the plan's
    python stages at ONE (only the extractor itself)."""
    jvm = extract_transcripts(transcripts, prefilter_readerable="jvm")
    exact_keys = {
        (r.conv_id, r.turn_idx)
        for r in extract_transcripts(transcripts, prefilter_readerable=True)
        .select("conv_id", "turn_idx")
        .collect()
    }
    jvm_keys = {
        (r.conv_id, r.turn_idx)
        for r in jvm.select("conv_id", "turn_idx").collect()
    }
    union = exact_keys | jvm_keys
    assert union  # non-vacuous
    agree = len(exact_keys & jvm_keys) / len(union)
    assert agree >= 0.95, (agree, len(exact_keys), len(jvm_keys))
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1  # the extractor
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_resume_idempotent(spark, transcripts, tmp_path):
    """Kill-and-rerun contract: run on half the data, then run on all —
    final table == one-shot run, no dupes, no drops."""
    root = str(tmp_path / "out")
    sink = CheckpointedSink(root)

    half = transcripts.filter(F.col("turn_idx") % 2 == 0)
    n1 = sink.run(half)
    assert n1 == half.count()

    # second run sees the full source; must only process the complement
    n2 = sink.run(transcripts)
    assert n2 == transcripts.count() - n1

    final = sink.read(spark)
    assert final.count() == transcripts.count()
    assert final.select("conv_id", "turn_idx").distinct().count() == transcripts.count()

    # third run: nothing left
    n3 = sink.run(transcripts)
    assert n3 == 0


def test_resume_ignores_uncommitted_batch(spark, transcripts, tmp_path):
    import os

    root = str(tmp_path / "out2")
    sink = CheckpointedSink(root)
    sink.run(transcripts.limit(5))
    # simulate a mid-job kill: a batch dir without _SUCCESS
    bad = os.path.join(root, "batch=99")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-zzz.parquet"), "w") as f:
        f.write("garbage")
    n = sink.run(transcripts)
    assert n == transcripts.count() - 5
    assert not os.path.exists(bad)  # cleaned up
    assert sink.read(spark).count() == transcripts.count()


def test_sink_protocol_and_plan_identity(spark, transcripts, tmp_path):
    """The resume job is sink-agnostic: both sinks satisfy KeyedSink and
    the anti-join DAG upstream of the write is byte-identical once the
    committed-keys leaf is fixed (the Iceberg swap is sink-object only)."""
    import re

    from cl_readability_spark.pipeline.resume import CheckpointedSink, pending_rows
    from cl_readability_spark.pipeline.sink import IcebergSink, KeyedSink

    parquet_sink = CheckpointedSink(str(tmp_path / "plan"))
    iceberg_sink = IcebergSink("cat.db.extracted")
    assert isinstance(parquet_sink, KeyedSink)
    assert isinstance(iceberg_sink, KeyedSink)

    parquet_sink.run(transcripts.limit(5))
    committed = parquet_sink.committed_keys(spark)

    def normalized_plan(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return re.sub(r"#\d+L?", "#x", plan)

    # same committed keys → same plan, regardless of which sink object the
    # job holds (pending_rows never touches the sink)
    p = normalized_plan(pending_rows(transcripts, committed))
    assert "Join LeftAnti" in p
    assert normalized_plan(pending_rows(transcripts, committed)) == p
    # first run (no committed keys): plan is the bare source, no join
    assert "Join" not in normalized_plan(pending_rows(transcripts, None))


def test_iceberg_sink_fails_loudly_without_catalog(spark):
    from cl_readability_spark.pipeline.sink import IcebergSink

    sink = IcebergSink("cat.db.extracted")
    assert IcebergSink.is_available(spark) is False
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        sink.prepare(spark)
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        sink.committed_keys(spark)


def test_run_resumable_generic_runner(spark, transcripts, tmp_path):
    """run_resumable against the protocol (not the .run() wrapper) keeps
    the idempotence contract."""
    from cl_readability_spark.pipeline.resume import run_resumable

    sink = CheckpointedSink(str(tmp_path / "gen"))
    n1 = run_resumable(transcripts.filter(F.col("turn_idx") % 2 == 0), sink)
    n2 = run_resumable(transcripts, sink)
    assert n1 + n2 == transcripts.count()
    assert sink.read(spark).select("conv_id", "turn_idx").distinct().count() == (
        transcripts.count()
    )


def test_resume_metrics_are_batch_scoped(spark, transcripts, tmp_path):
    """The metrics sidecar covers only the rows each run wrote (via the
    sink protocol's batch-scoped read_batch), never the cumulative table —
    a full-table read-back would re-append every previously committed
    row's metrics on each run."""
    from cl_readability_spark.pipeline.resume import run_resumable

    sink = CheckpointedSink(str(tmp_path / "ms"))
    metrics_root = str(tmp_path / "metrics")
    n1 = run_resumable(
        transcripts.filter(F.col("turn_idx") % 2 == 0), sink,
        metrics_root=metrics_root,
    )
    n2 = run_resumable(transcripts, sink, metrics_root=metrics_root)
    total = transcripts.count()
    assert n1 + n2 == total
    # exactly one metrics row per written row across both runs
    assert spark.read.parquet(metrics_root).count() == total


def test_iceberg_batch_handle_is_snapshot_scoped():
    """The Iceberg handle encodes the (prev, new) snapshot range so the
    batch read-back is an incremental snapshot read, not the table."""
    from cl_readability_spark.pipeline.sink import IcebergSink

    sink = IcebergSink("cat.db.extracted")
    handle = "cat.db.extracted@123..456"
    table, _, rng = handle.partition("@")
    prev, _, new = rng.partition("..")
    assert (table, prev, new) == ("cat.db.extracted", "123", "456")
    # first-batch handle has an empty prev → read_batch returns the table
    assert "cat.db.extracted@..789".partition("@")[2].partition("..")[0] == ""
    assert sink.key_columns == ["conv_id", "turn_idx"]


def test_documents_as_transcripts(spark):
    df = documents_as_transcripts(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    # 500 per-doc turns + 20 per-conversation digest turns (turn_idx 25)
    assert df.count() == 520
    assert df.filter("turn_idx = 25").count() == 20
    sample = df.select("text").first().text
    assert sample.startswith("<html")
    r = extract(sample)
    assert r.status == "ok"


def test_column_pruning_reaches_scan(spark, tmp_path):
    """The extraction plan must read only (conv_id, turn_idx, text) from
    parquet — ReadSchema pruning (SURVEY §4.2)."""
    path = str(tmp_path / "transcripts.parquet")
    synthetic_transcripts(spark, 2).write.parquet(path)
    df = spark.read.parquet(path)
    plan = extract_transcripts(df)._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"conv_id", "turn_idx", "text"}, read_cols


def test_arrow_batches_byte_bounded_for_whale_docs(spark):
    """maxBytesPerBatch (pipeline/session.py) bounds Arrow batches by BYTES,
    not just rows: a whale-document corpus (12 x ~8 MB) must arrive at the
    python stage split into multiple batches, each under the 32 MB cap plus
    slack — the 512-row cap alone would ship it as ONE ~100 MB batch."""
    import pyarrow as pa

    whale = (
        spark.range(12)
        .select(
            F.col("id").cast("string").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.concat(
                F.lit("<html><body><p>"),
                F.repeat(F.lit("whale text block. "), 450_000),
                F.lit("</p></body></html>"),
            ).alias("text"),
        )
        .coalesce(1)  # one partition -> splitting is purely the Arrow writer
    )

    def probe(batches):
        for b in batches:
            yield pa.RecordBatch.from_pydict(
                {
                    "nbytes": pa.array([b.nbytes], type=pa.int64()),
                    "rows": pa.array([b.num_rows], type=pa.int64()),
                }
            )

    out = whale.mapInArrow(probe, "nbytes long, rows long").collect()
    sizes = [r.nbytes for r in out]
    assert sum(r.rows for r in out) == 12
    assert len(sizes) >= 2, sizes  # byte cap split the partition
    assert max(sizes) <= 48 * 1024 * 1024, sizes  # 32 MB cap + slack


def test_whale_safe_batch_bounds_configured(spark):
    """All three row-batch knobs that assemble whole batches in memory are
    bounded to the whale-safe budget: Arrow python transfer, parquet
    vectorized reader, and the table-cache columnar builder (persist at
    ANY storage level builds batchSize-row column batches on-heap first —
    the 10k default OOMs on multi-KB text corpora)."""
    for key in (
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        "spark.sql.parquet.columnarReaderBatchSize",
        "spark.sql.inMemoryColumnarStorage.batchSize",
    ):
        assert int(spark.conf.get(key)) <= 512, key
