"""Source-adapter tests: JSONL/CSV/parquet transcripts land in the exact
authoritative schema and extract identically."""

import json

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.pipeline.job import extract_transcripts
from cl_readability_spark.pipeline.sources import (
    transcripts_from_csv,
    transcripts_from_jsonl,
    transcripts_from_parquet,
)
from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def base(spark):
    df = synthetic_transcripts(spark, 3, seed=77).cache()
    df.count()
    return df


def wire_rows(df):
    return [
        {
            "conv_id": r.conv_id,
            "turn_idx": r.turn_idx,
            "role": r.role,
            "text": r.text,
            "tool": r.tool,
            "ts_epoch": int(r.ts.timestamp()),
        }
        for r in df.collect()
    ]


def canon(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, int(r.ts.timestamp()))
        for r in df.collect()
    )


def test_jsonl_roundtrip(spark, base, tmp_path):
    path = str(tmp_path / "t.jsonl")
    with open(path, "w") as f:
        for row in wire_rows(base):
            f.write(json.dumps(row) + "\n")
    df = transcripts_from_jsonl(spark, path)
    assert dict(df.dtypes) == {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }
    assert canon(df) == canon(base)


def test_csv_roundtrip_multiline_html(spark, base, tmp_path):
    import csv as csvmod

    path = str(tmp_path / "t.csv")
    with open(path, "w", newline="") as f:
        w = csvmod.writer(f, quoting=csvmod.QUOTE_ALL)
        w.writerow(["conv_id", "turn_idx", "role", "text", "tool", "ts_epoch"])
        for row in wire_rows(base):
            w.writerow([row["conv_id"], row["turn_idx"], row["role"],
                        row["text"], row["tool"] or "", row["ts_epoch"]])
    df = transcripts_from_csv(spark, path)
    got = {(r.conv_id, r.turn_idx): r.text for r in df.collect()}
    want = {(r.conv_id, r.turn_idx): r.text for r in base.collect()}
    assert got == want


def test_parquet_schema_enforced(spark, base, tmp_path):
    path = str(tmp_path / "t.parquet")
    base.write.parquet(path)
    df = transcripts_from_parquet(spark, path)
    assert canon(df) == canon(base)


def test_extraction_identical_across_sources(spark, base, tmp_path):
    path = str(tmp_path / "e.jsonl")
    with open(path, "w") as f:
        for row in wire_rows(base):
            f.write(json.dumps(row) + "\n")
    via_json = extract_transcripts(transcripts_from_jsonl(spark, path))
    via_mem = extract_transcripts(base)
    a = {(r.conv_id, r.turn_idx): r.extracted_text for r in via_json.collect()}
    b = {(r.conv_id, r.turn_idx): r.extracted_text for r in via_mem.collect()}
    assert a == b
