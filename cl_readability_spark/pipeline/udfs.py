"""Vectorized UDF surface (SURVEY §2.8).

``extract_turns`` is a scalar pandas UDF: Spark hands the Python worker an
Arrow record batch, we iterate the batch in-process (one lightweight DOM per
row — this is the algorithm itself, not per-row *dispatch* from Spark's side,
per BASELINE.json:15) and hand back a struct column.  All regexes and config
are bound once per worker at module import / closure creation."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from cl_readability_spark.core.config import DEFAULT_CONFIG, ExtractorConfig
from cl_readability_spark.core.extract import extract
from cl_readability_spark.core.readerable import is_readerable as _is_readerable_py

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("start", IntegerType(), False),
            StructField("end", IntegerType(), False),
        ]
    )
)

EXTRACT_RESULT_TYPE = StructType(
    [
        StructField("extracted_text", StringType(), True),
        StructField("content_spans", SPAN_TYPE, True),
        StructField("status", StringType(), False),
        StructField("title", StringType(), True),
        StructField("byline", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("text_length", IntegerType(), False),
        StructField("candidates_scored", IntegerType(), False),
        StructField("retries", IntegerType(), False),
        StructField("chars_in", IntegerType(), False),
        StructField("chars_kept", IntegerType(), False),
        StructField("error", StringType(), True),
    ]
)


def make_extract_udf(config: ExtractorConfig = DEFAULT_CONFIG):
    """Build the extraction pandas UDF with ``config`` captured by closure
    (the broadcast-equivalent of the reference's dynamic variables)."""

    @pandas_udf(EXTRACT_RESULT_TYPE)
    def extract_turns(text: pd.Series) -> pd.DataFrame:
        out = {name: [] for name in EXTRACT_RESULT_TYPE.fieldNames()}
        for html in text:
            r = extract(
                html if isinstance(html, str) else "",
                config=config,
                include_html=False,
            )
            out["extracted_text"].append(r.extracted_text)
            out["content_spans"].append(
                [{"start": s, "end": e} for s, e in r.content_spans]
                if r.content_spans
                else []
            )
            out["status"].append(r.status)
            out["title"].append(r.title)
            out["byline"].append(r.byline)
            out["lang"].append(r.lang)
            out["text_length"].append(r.text_length)
            out["candidates_scored"].append(r.candidates_scored)
            out["retries"].append(r.retries)
            out["chars_in"].append(r.chars_in)
            out["chars_kept"].append(r.chars_kept)
            out["error"].append(r.error)
        return pd.DataFrame(out)

    return extract_turns


def make_readerable_udf(config: ExtractorConfig = DEFAULT_CONFIG):
    @pandas_udf(BooleanType())
    def readerable(text: pd.Series) -> pd.Series:
        return pd.Series(
            [_is_readerable_py(h if isinstance(h, str) else "", config) for h in text]
        )

    return readerable


# default-config instances for direct import
extract_turns_udf = make_extract_udf()
is_readerable_udf = make_readerable_udf()
