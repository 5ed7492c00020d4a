"""exceptAll diff harness + span-explode tests."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.pipeline.diff import (
    assert_tables_equal,
    explode_spans,
    table_diff,
)
from cl_readability_spark.pipeline.job import extract_transcripts
from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

pytestmark = pytest.mark.spark


def test_table_diff_detects_missing_and_extra(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], ["id", "v"])
    b = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "v"])
    extra, missing = table_diff(a, b)
    assert [tuple(r) for r in extra.collect()] == [(2, "y")]  # dup counted
    assert [tuple(r) for r in missing.collect()] == [(3, "z")]
    with pytest.raises(AssertionError):
        assert_tables_equal(a, b)
    assert_tables_equal(a, a)


def test_extraction_self_consistent_across_runs(spark):
    df = synthetic_transcripts(spark, 3, seed=21)
    r1 = extract_transcripts(df, salt_buckets=4).select(
        "conv_id", "turn_idx", "extracted_text", "status"
    )
    r2 = extract_transcripts(df, salt_buckets=16, num_partitions=8).select(
        "conv_id", "turn_idx", "extracted_text", "status"
    )
    # partitioning/salting must not affect results
    assert_tables_equal(r1, r2)


def test_explode_spans(spark):
    df = synthetic_transcripts(spark, 2, seed=33)
    result = extract_transcripts(df, salt_buckets=4)
    spans = explode_spans(result)
    ok_rows = result.filter(F.col("status") == "ok").count()
    assert spans.count() >= ok_rows  # ≥1 span per ok row
    bad = spans.filter(
        (F.col("start") < 0) | (F.col("end") < F.col("start")) | (F.col("span_len") <= 0)
    )
    assert bad.count() == 0
    # span text slices reassemble into extracted_text (spot check)
    joined = spans.join(
        result.select("conv_id", "turn_idx", "extracted_text"),
        ["conv_id", "turn_idx"],
    ).limit(50)
    for r in joined.collect():
        assert 0 <= r.start <= r.end <= len(r.extracted_text)


def test_stitch_conversations_grouped_map(spark):
    from cl_readability_spark.pipeline.grouped import stitch_conversations

    df = synthetic_transcripts(spark, 4, seed=17)
    got = {r.conv_id: r for r in stitch_conversations(df).collect()}
    rows = df.orderBy("conv_id", "turn_idx").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert set(got) == set(by_conv)
    for cid, turns in by_conv.items():
        g = got[cid]
        assert g.n_turns == len(turns)
        assert g.first_role == turns[0].role
        assert g.stitched_text == "\n\n".join(t.text or "" for t in turns)
        assert g.total_chars == sum(len(t.text or "") for t in turns)
