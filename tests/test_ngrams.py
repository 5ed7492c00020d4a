"""Corpus n-gram statistics (functions/ngrams.py): the slice-built
gram array vs a python reference, exact occurrence counting, and the
count-min sketch (never undershoots, exact on collision-free toys,
deterministic, bounded size)."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.ngrams import (
    cms_estimate,
    fit_gram_cms,
    ngram_array,
    ngram_counts,
)

pytestmark = pytest.mark.spark

DOCS = [
    (1, "The cat sat on the mat"),
    (2, "the cat sat again and the cat sat"),
    (3, "one two"),
    (4, "  spaced   out\twords\nhere  "),
    (5, ""),
    (6, None),
    (7, "solo"),
]


def _py_grams(text, n):
    if not text:
        return []
    words = text.strip().lower().split()
    return [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_ngram_array_matches_python(spark, docs, n):
    got = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id", ngram_array(F.col("text"), n).alias("g")
        ).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_grams(text, n), (doc_id, n)


def test_ngram_counts_exact(spark, docs):
    from collections import Counter

    ref = Counter()
    for _, text in DOCS:
        ref.update(_py_grams(text, 2))
    got = {
        r["gram"]: r["n_occurrences"]
        for r in ngram_counts(docs, n=2, min_count=2).collect()
    }
    assert got == {g: c for g, c in ref.items() if c >= 2}
    # min_count=1 returns every gram
    all_got = {
        r["gram"]: r["n_occurrences"]
        for r in ngram_counts(docs, n=2, min_count=1).collect()
    }
    assert all_got == dict(ref)


def test_ngram_counts_occurrences_not_docfreq(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    got = {
        r["gram"]: r["n_occurrences"]
        for r in ngram_counts(df, n=2, min_count=1).collect()
    }
    assert got == {"a b": 3, "b a": 2}


def test_cms_never_undershoots_and_exact_on_toy(spark, docs):
    from collections import Counter

    ref = Counter()
    for _, text in DOCS:
        ref.update(_py_grams(text, 2))
    cms = fit_gram_cms(docs, n=2, eps=0.001, confidence=0.99, seed=7)
    est = cms_estimate(spark, cms, list(ref) + ["never in corpus"])
    for g, c in ref.items():
        assert est[g] >= c, g  # CMS never undershoots
        # at eps=0.001 the sketch has ~2718 columns for ~20 distinct
        # grams — collision probability ~0, so estimates are exact
        assert est[g] == c, g
    assert est["never in corpus"] == 0
    # deterministic: same seed, same bytes
    assert cms == fit_gram_cms(docs, n=2, eps=0.001, confidence=0.99, seed=7)
    # bounded size regardless of corpus: width*depth*8 + header
    assert len(cms) < 200_000


def test_ngram_array_rejects_bad_n(spark, docs):
    with pytest.raises(ValueError):
        docs.select(ngram_array(F.col("text"), 0)).collect()
