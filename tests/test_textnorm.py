"""CCNet-style text normalization: unicode-form semantics, stage
composition/order, NULL handling, idempotence, and the JVM-only plan
when no unicode stage is requested.  Cross-engine byte parity is pinned
by the textnorm DuckDB twin (tests/test_queries_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.textnorm import normalize_text


def _norm(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = normalize_text(df, **kw)
    return [r["norm_text"] for r in out.orderBy("id").collect()]


def test_nfc_unifies_composed_and_decomposed(spark):
    composed, decomposed = "caf\u00e9", "cafe\u0301"
    a, b = _norm(spark, [composed, decomposed], form="NFC")
    assert a == b == "caf\u00e9"
    # and without a form they stay distinct byte sequences
    a2, b2 = _norm(spark, [composed, decomposed])
    assert a2 != b2


def test_nfkc_folds_ligature_and_fullwidth(spark):
    (out,) = _norm(spark, ["\ufb01le \uff21"], form="NFKC", lowercase=True)
    assert out == "file a"


def test_strip_accents_both_forms(spark):
    outs = _norm(
        spark,
        ["caf\u00e9", "cafe\u0301", "NA\u00cfVE", "\u00f1andu"],
        strip_accents=True,
    )
    assert outs == ["cafe", "cafe", "NAIVE", "nandu"]


def test_digit_fold_and_ws_collapse_are_jvm_only(spark):
    df = spark.createDataFrame([(1, " a1\t\tb23 \n")], "id long, text string")
    out = normalize_text(
        df, fold_digits=True, collapse_ws=True, lowercase=True
    )
    assert out.collect()[0]["norm_text"] == "a0 b00"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Eval" not in plan and "Arrow" not in plan, plan  # no python stage
    # with a unicode stage requested the Arrow stage appears
    plan2 = (
        normalize_text(df, form="NFC")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Eval" in plan2 or "Arrow" in plan2, plan2


def test_full_chain_order_and_null(spark):
    outs = _norm(
        spark,
        ["  Caf\u00e9 12\tX\u0301  ", None, ""],
        form="NFC",
        strip_accents=True,
        lowercase=True,
        fold_digits=True,
        collapse_ws=True,
    )
    assert outs == ["cafe 00 x", None, ""]


def test_idempotent(spark):
    texts = ["Café CAFÉ 12\t ﬁn", "plain ascii"]
    kw = dict(
        form="NFKC",
        strip_accents=True,
        lowercase=True,
        fold_digits=True,
        collapse_ws=True,
    )
    once = _norm(spark, texts, **kw)
    twice = _norm(spark, once, **kw)
    assert once == twice


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="form"):
        normalize_text(df, form="NFX")


def test_composes_with_line_dedup(spark):
    """The stated pipeline position: dedup over the normalized column
    unifies accent/case/digit variants that raw bytes would keep."""
    from cl_readability_spark.functions.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "Café menu 2024"),
            (2, "café MENU 1999"),
            (3, "something else"),
        ],
        "doc_id long, text string",
    )
    normed = normalize_text(
        df,
        form="NFC",
        strip_accents=True,
        lowercase=True,
        fold_digits=True,
        collapse_ws=True,
    )
    out = {
        r["doc_id"]: r["n_kept_lines"]
        for r in line_dedup(normed, text_col="norm_text").collect()
    }
    assert out == {1: 1, 2: 0, 3: 1}  # doc 2's line dedups against doc 1
