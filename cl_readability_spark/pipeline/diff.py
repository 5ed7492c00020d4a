"""Correctness-diff harness (SURVEY §2.11 set-ops row).

``table_diff`` compares two extraction outputs (e.g. this engine vs a
reference dump, or two runs across a refactor) with exceptAll in both
directions — multiset semantics, so duplicate rows are caught too."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(actual: DataFrame, expected: DataFrame, columns: list[str] | None = None):
    """Returns (only_in_actual, only_in_expected) DataFrames; both empty ⇔
    the tables agree as multisets on ``columns`` (default: all common)."""
    if columns is None:
        columns = [c for c in actual.columns if c in set(expected.columns)]
    a = actual.select(*columns)
    e = expected.select(*columns)
    return a.exceptAll(e), e.exceptAll(a)


def assert_tables_equal(actual: DataFrame, expected: DataFrame,
                        columns: list[str] | None = None) -> None:
    extra, missing = table_diff(actual, expected, columns)
    n_extra, n_missing = extra.count(), missing.count()
    if n_extra or n_missing:
        raise AssertionError(
            f"table mismatch: {n_extra} rows only in actual "
            f"(sample {extra.limit(3).collect()}), {n_missing} only in expected "
            f"(sample {missing.limit(3).collect()})"
        )


def explode_spans(
    result: DataFrame,
    outer: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """content_spans → one row per block span (SURVEY §2.8 span-explode):
    (conv_id, turn_idx, span_idx, start, end, span_len).

    ``outer=True`` keeps turns whose span array is empty or NULL as one
    row with NULL span columns (posexplode_outer) — so per-turn checks
    can see span-less turns without a second pass over the extraction.
    ``keep_cols`` carries extra ``result`` columns through the explode
    (e.g. text_length), again avoiding a self-join back onto the
    expensive extraction subtree (PLANS.md self-join rule)."""
    explode = F.posexplode_outer if outer else F.posexplode
    keep = list(keep_cols)
    return result.select(
        "conv_id",
        "turn_idx",
        *keep,
        explode("content_spans").alias("span_idx", "span"),
    ).select(
        "conv_id",
        "turn_idx",
        *keep,
        "span_idx",
        F.col("span.start").alias("start"),
        F.col("span.end").alias("end"),
        (F.col("span.end") - F.col("span.start")).alias("span_len"),
    )
