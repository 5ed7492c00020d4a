"""TF-IDF keyword extraction (functions/keywords.py): python
differential over a deterministic corpus, df semantics (documents not
occurrences), min_df pruning, strategy equivalence, and plan shape
(map-side combine on the word agg; doc-keyed top-k window)."""

import math

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.keywords import (
    doc_frequencies,
    tfidf_topk,
)

pytestmark = pytest.mark.spark


def _corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "cat cat cat dog"),
        (3, "  "),
        (4, None),
        (5, "unique zebra"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_tfidf(rows, k, min_df=1):
    docs = {r[0]: (r[1] or "").strip().lower().split() for r in rows}
    n = len(rows)
    df = {}
    for words in docs.values():
        for w in set(words):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, words in docs.items():
        tf = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        scored = [
            (w, c, df[w], c * (math.log((1 + n) / (1 + df[w])) + 1))
            for w, c in tf.items()
            if df[w] >= min_df
        ]
        scored.sort(key=lambda t: (-t[3], t[0]))
        out[d] = scored[:k]
    return out


def test_doc_frequencies_counts_documents(spark):
    got = {r["word"]: r["df"] for r in doc_frequencies(_corpus(spark)).collect()}
    assert got["cat"] == 2          # docs 0 and 2 — NOT 4 occurrences
    assert got["the"] == 2
    assert got["dog"] == 2
    assert got["zebra"] == 1
    assert "" not in got            # blank/null docs contribute nothing
    pruned = {
        r["word"]
        for r in doc_frequencies(_corpus(spark), min_df=2).collect()
    }
    assert "zebra" not in pruned and "cat" in pruned


def test_tfidf_matches_python_mirror(spark):
    rows = [(r["doc_id"], r["text"]) for r in _corpus(spark).collect()]
    want = _py_tfidf(rows, k=3)
    got = {}
    out = tfidf_topk(_corpus(spark), k=3).collect()
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["term_rank"], r["word"], r["tf"], r["df"], r["tfidf"])
        )
    for d, terms in want.items():
        mine = sorted(got.get(d, []))
        assert len(mine) == len(terms), d
        for (rk, w, tf, df, score), (ww, wtf, wdf, wscore) in zip(
            mine, terms
        ):
            assert (w, tf, df) == (ww, wtf, wdf), (d, rk)
            assert score == pytest.approx(wscore, rel=1e-12)


def test_tfidf_min_df_and_strategies_agree(spark):
    docs = _corpus(spark)
    a = tfidf_topk(docs, k=2, min_df=2, strategy="broadcast").collect()
    b = tfidf_topk(docs, k=2, min_df=2, strategy="join").collect()
    key = lambda r: (r["doc_id"], r["term_rank"])
    assert sorted(
        [(r["doc_id"], r["term_rank"], r["word"], r["tf"], r["df"])
         for r in a]
    ) == sorted(
        [(r["doc_id"], r["term_rank"], r["word"], r["tf"], r["df"])
         for r in b]
    )
    # zebra (df=1) must be gone under min_df=2
    assert all(r["word"] != "zebra" for r in a)
    # auto below the limit = broadcast result
    c = tfidf_topk(docs, k=2, min_df=2, strategy="auto").collect()
    assert sorted(map(key, c)) == sorted(map(key, a))
    with pytest.raises(ValueError):
        tfidf_topk(docs, k=0)
    with pytest.raises(ValueError):
        tfidf_topk(docs, strategy="nope")


def test_tfidf_sample_scoring_n_docs_override(spark):
    """Scoring a sample against full-corpus N: idf uses the passed N."""
    docs = _corpus(spark)
    out = tfidf_topk(docs, k=1, n_docs=1000).collect()
    r = next(x for x in out if x["doc_id"] == 5)
    want = 1 * (math.log(1001 / 2) + 1)
    assert r["tfidf"] == pytest.approx(want, rel=1e-12)


def test_tfidf_plan_shape(spark):
    """df agg partial-combines map-side; top-k window is keyed by the
    doc id (whale-safe), no python in the plan."""
    docs = _corpus(spark)
    out = tfidf_topk(docs, k=2, strategy="broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan[:3000]
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # the ranking window partitions by doc_id
    import re

    wins = [ln for ln in plan.splitlines() if "Window" in ln]
    assert wins and all("doc_id" in ln for ln in wins), wins
