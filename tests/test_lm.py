"""Interpolated-bigram LM perplexity (functions/lm.py): python
differential oracle over (vocab_size, min_bigram_count, lam, alpha)
configs with hostile whitespace and unseen words, reference-affinity
property, partitioning independence, and kwarg guards.  The DuckDB
parity twin lives in test_queries_oracle.py (LOCAL_TWINS['lm_ppl'])."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.lm import UNK, lm_fit, lm_perplexity

pytestmark = pytest.mark.spark

_WS_RE = r"[ \t\n\f\r]"


def _py_words(t):
    t = re.sub(f"^{_WS_RE}+|{_WS_RE}+$", "", (t or "").lower())
    return [] if t == "" else re.split(f"{_WS_RE}+", t)


def _py_fit(ref_texts, vocab_size, min_bigram_count, alpha):
    toks = [_py_words(t) for t in ref_texts]
    uni = Counter(w for ts in toks for w in ts)
    vs = {
        w
        for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[
            : vocab_size - 1
        ]
    }
    closed = Counter({UNK: 0})
    for w, c in uni.items():
        closed[w if w in vs else UNK] += c
    n = sum(closed.values())
    p_uni = {
        w: (c + alpha) / (n + alpha * vocab_size) for w, c in closed.items()
    }
    bic = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            bic[(a if a in vs else UNK, b if b in vs else UNK)] += 1
    ctx = Counter()
    for (p, _), c in bic.items():
        ctx[p] += c
    bi = {
        k: c / ctx[k[0]] for k, c in bic.items() if c >= min_bigram_count
    }
    return vs, p_uni, bi


def _py_score(text, vs, p_uni, bi, lam):
    toks = _py_words(text)
    if not toks:
        return None
    logps = []
    prev = None
    for i, w in enumerate(toks):
        wc = w if w in vs else UNK
        pu = p_uni[wc]
        if i == 0:
            logps.append(math.log(pu))
        else:
            logps.append(math.log(lam * bi.get((prev, wc), 0.0) + (1 - lam) * pu))
        prev = wc
    return sum(logps) / len(logps)


REF_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog",
    "  \tthe mat and the log \n",
    "a cat a dog a mat",
    "on and on and on",
]
SCORE_TEXTS = [
    "the cat sat on the mat",  # in-distribution
    "the dog and the cat",
    "zxq unseen words entirely qzx",  # OOV-heavy
    "",  # token-less
    "   \t  ",  # whitespace-only
    "the",  # single token
    "mat the on sat cat the",  # reversed order: worse bigrams
    None,  # NULL text
]


def _frames(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SCORE_TEXTS)],
        "doc_id: long, text: string",
    )
    return ref, docs


@pytest.mark.parametrize(
    "vocab_size,min_bc,lam,alpha",
    [(8, 1, 0.9, 1.0), (5, 2, 0.8, 0.5), (50, 1, 0.5, 1.0)],
)
def test_lm_python_differential(spark, vocab_size, min_bc, lam, alpha):
    ref, docs = _frames(spark)
    out = lm_perplexity(
        docs,
        reference=ref,
        vocab_size=vocab_size,
        min_bigram_count=min_bc,
        lam=lam,
        alpha=alpha,
    )
    got = {
        r["doc_id"]: (r["lm_logp_per_token"], r["lm_perplexity"])
        for r in out.collect()
    }
    vs, p_uni, bi = _py_fit(REF_TEXTS, vocab_size, min_bc, alpha)
    assert len(got) == len(SCORE_TEXTS)
    for i, t in enumerate(SCORE_TEXTS):
        want = _py_score(t, vs, p_uni, bi, lam)
        if want is None:
            assert got[i] == (None, None), i
        else:
            assert got[i][0] == pytest.approx(want, rel=1e-9), (i, t)
            assert got[i][1] == pytest.approx(math.exp(-want), rel=1e-9)


def test_lm_reference_affinity(spark):
    """In-distribution text must score lower perplexity than OOV
    gibberish and than the same words in scrambled order."""
    ref, docs = _frames(spark)
    out = {
        r["doc_id"]: r["lm_perplexity"]
        for r in lm_perplexity(docs, reference=ref).collect()
    }
    assert out[0] < out[2]  # fluent < gibberish
    assert out[0] < out[6]  # fluent < scrambled (bigram order signal)


def test_lm_prefit_model_reuse_and_partitioning(spark):
    ref, docs = _frames(spark)
    model = lm_fit(ref, vocab_size=8)
    a = lm_perplexity(docs, model=model)
    b = lm_perplexity(docs.repartition(7), model=model)
    ra = sorted((r["doc_id"], r["lm_perplexity"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["lm_perplexity"]) for r in b.collect())
    assert ra == rb
    c = lm_perplexity(docs, reference=ref, vocab_size=8)
    rc = sorted((r["doc_id"], r["lm_perplexity"]) for r in c.collect())
    assert ra == rc


def test_lm_unk_exists_on_closed_reference(spark):
    """A reference with fewer distinct words than the vocab budget has
    no OOV mass — the <unk> unigram row must still exist so unseen
    scoring words get the smoothing floor, not a silent NULL drop."""
    ref = spark.createDataFrame([(0, "a b a b")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(0, "zz yy xx")], ["doc_id", "text"]
    )
    got = lm_perplexity(docs, reference=ref, vocab_size=10).collect()[0]
    assert got["lm_logp_per_token"] is not None
    # all three tokens are <unk>: mean logp = log(lam*P(unk|unk)+(1-lam)
    # *pu) for tokens 2,3 and log(pu) for token 1 — finite and negative
    assert got["lm_logp_per_token"] < 0


def test_lm_kwarg_guards(spark):
    ref, docs = _frames(spark)
    with pytest.raises(ValueError, match="exactly one"):
        lm_perplexity(docs)
    with pytest.raises(ValueError, match="exactly one"):
        lm_perplexity(docs, reference=ref, model={})
    with pytest.raises(ValueError, match="lam"):
        lm_perplexity(docs, reference=ref, lam=1.0)
    with pytest.raises(ValueError, match="vocab_size"):
        lm_fit(ref, vocab_size=1)
    with pytest.raises(ValueError, match="min_bigram_count"):
        lm_fit(ref, min_bigram_count=0)
    with pytest.raises(ValueError, match="alpha"):
        lm_fit(ref, alpha=0.0)


def test_lm_plan_broadcasts_model(spark):
    """The three model attachments must be broadcast joins (bounded-by-
    construction tables); the only corpus-keyed exchanges are the pair
    explode's per-doc mean and the row-key output join."""
    ref, docs = _frames(spark)
    plan = (
        lm_perplexity(docs, reference=ref)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-position indexing trap must stay out of the pair build
    # first-token extraction only: every element_at indexes position 1 —
    # the O(words²) trap is per-POSITION indexing of the tokenize
    # expression (element_at(words, i) for growing i inside a lambda).
    # The count itself is no longer meaningful: the r9 single-pass fit
    # pins the pair-count frame, and the plan printer repeats the cached
    # build subtree (with its one first-token element_at) under every
    # cache reference.
    import re as _re

    idxs = {m.group(1) for m in _re.finditer(r"element_at\([^,]*, (\d+)", plan)}
    assert idxs <= {"1"}, idxs
