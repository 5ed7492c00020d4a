"""Sequence packing (functions/packing.py)."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.packing import pack_sequences

pytestmark = pytest.mark.spark


@pytest.fixture()
def docs(spark):
    # 200 docs, token counts 10..990 (deterministic), plus two oversize
    rows = [(i, (i * 37) % 991 + 10) for i in range(200)]
    rows += [(900, 5000), (901, 4096)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_pack_invariants(spark, docs):
    """Every doc exactly once; every non-oversize pack within the budget;
    pack_tokens is the true per-pack sum; oversize docs isolated."""
    out = pack_sequences(docs, max_tokens=4096, num_partitions=8)
    rows = out.collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in docs.collect()
    )
    by_pack: dict[str, list] = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pack, members in by_pack.items():
        total = sum(m.n_tokens for m in members)
        assert all(m.pack_tokens == total for m in members), pack
        if any(m.oversize for m in members):
            assert len(members) == 1
        else:
            assert total <= 4096, pack
    oversized = {r.doc_id for r in rows if r.oversize}
    assert oversized == {900}  # 4096 fits exactly; 5000 does not


def test_pack_efficiency_and_determinism(spark, docs):
    """BFD within each partition: packs (beyond the per-partition tail)
    are well filled — total packs stay within 1.5× the token lower bound
    plus one tail pack per partition; the assignment is identical across
    two runs (hash repartition + in-partition sort are deterministic)."""
    out = pack_sequences(docs, max_tokens=4096, num_partitions=8)
    rows = out.filter(~F.col("oversize")).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    n_packs = len({r.pack_id for r in rows})
    lower_bound = -(-total_tokens // 4096)
    assert n_packs <= 1.5 * lower_bound + 8  # + one tail pack/partition
    again = {
        (r.doc_id, r.pack_id)
        for r in pack_sequences(docs, max_tokens=4096, num_partitions=8).collect()
    }
    assert again == {(r.doc_id, r.pack_id) for r in out.collect()}


def test_pack_validation(spark, docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, max_tokens=0)


def test_pack_null_tokens_are_zero_not_fatal(spark):
    """A NULL token count (bad upstream data) must not fail the stage —
    the row packs as 0 tokens."""
    df = spark.createDataFrame(
        [(0, 100), (1, None), (2, 50)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in
            pack_sequences(df, max_tokens=200, num_partitions=2).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[1].n_tokens == 0 and not rows[1].oversize


# --- doc_chunks (context-window chunking with stride) ---


def _py_chunks(text, max_tokens, stride):
    import re

    toks = re.findall(r"\w+|[^\w \t\n\f\r]", text or "")
    n = len(toks)
    if n == 0:
        return []
    n_chunks = 1 + max(0, (n - max_tokens + stride - 1) // stride)
    out = []
    for k in range(n_chunks):
        s = k * stride
        e = min(s + max_tokens, n)
        out.append((k, s, e, e - s, " ".join(toks[s:e])))
    return out


def test_doc_chunks_python_differential(spark):
    import random

    from cl_readability_spark.functions.packing import doc_chunks

    rng = random.Random(11)
    vocab = ["alpha", "beta9", "x", "_u", "—", ",", "don't", "ab"]
    texts = [
        "",
        "   ",
        "\t\n\r",
        "one",
        "exactly four tokens here",
        "trailing punct!",
    ] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    for max_tokens, stride in [(8, 8), (8, 4), (5, 3), (1, 1), (64, 64)]:
        got = sorted(
            map(
                tuple,
                doc_chunks(
                    docs, max_tokens=max_tokens, stride=stride
                ).collect(),
            )
        )
        want = sorted(
            (i, k, s, e, ln, t)
            for i, text in enumerate(texts)
            for (k, s, e, ln, t) in _py_chunks(text, max_tokens, stride)
        )
        assert got == want, (max_tokens, stride)


def test_doc_chunks_invariants(spark):
    from cl_readability_spark.functions.packing import doc_chunks

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i))) for i in range(0, 70, 7)],
        ["doc_id", "text"],
    )
    out = doc_chunks(docs, max_tokens=10, stride=6).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc  # token-less docs produce no chunks
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        # contiguous indices, full coverage, stride spacing, ragged tail only
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert rows[0]["tok_start"] == 0
        assert rows[-1]["tok_end"] == doc_id  # doc i has i tokens
        for a, b in zip(rows, rows[1:]):
            assert b["tok_start"] == a["tok_start"] + 6
        for r in rows[:-1]:
            assert r["n_chunk_tokens"] == 10
        # no window starts at/past n (none fully contained in predecessor)
        assert rows[-1]["tok_start"] < doc_id


def test_doc_chunks_null_text_and_guards(spark):
    import pytest

    from cl_readability_spark.functions.packing import doc_chunks

    docs = spark.createDataFrame(
        [(1, None), (2, "two tokens")], ["doc_id", "text"]
    )
    got = doc_chunks(docs, max_tokens=4).collect()
    assert [r["doc_id"] for r in got] == [2]
    with pytest.raises(ValueError, match="stride"):
        doc_chunks(docs, max_tokens=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        doc_chunks(docs, max_tokens=4, stride=0)
    with pytest.raises(ValueError, match="max_tokens"):
        doc_chunks(docs, max_tokens=0)


def test_doc_chunks_then_pack_has_no_oversize(spark):
    """The composition the pack_sequences docstring defers to: chunk
    whales upstream, then pack - no oversize packs remain."""
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.packing import (
        doc_chunks,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i * 37))) for i in range(1, 12)],
        ["doc_id", "text"],
    )
    chunks = doc_chunks(docs, max_tokens=64, stride=64).select(
        F.concat_ws(":", "doc_id", "chunk_idx").alias("doc_id"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )
    packs = pack_sequences(chunks, max_tokens=64, num_partitions=4)
    assert packs.filter("oversize").count() == 0
    total_in = chunks.agg(F.sum("n_tokens")).first()[0]
    assert packs.agg(F.sum("n_tokens")).first()[0] == total_in


def test_doc_chunks_plan_is_narrow(spark):
    """Chunking is a pure projection+explode: ZERO exchanges, one
    whole-stage-codegen span (the 100-TB property: no shuffle exists to
    skew; whale docs amplify rows, not partitions)."""
    from cl_readability_spark.functions.packing import doc_chunks

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        doc_chunks(docs, max_tokens=2, stride=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    # "*(1)" prefixes = every node in one whole-stage-codegen span
    assert plan.lstrip().startswith("*(1)"), plan


def test_token_chunks_matches_doc_chunks_window_math(spark):
    """token_chunks over the regex token arrays must produce EXACTLY the
    windows doc_chunks produces from the raw text (same ids, indices,
    bounds, counts; chunk_tokens rejoin to chunk_text) — the two share
    one window-math contract."""
    from cl_readability_spark.functions.packing import (
        CHUNK_TOKEN_PATTERN,
        doc_chunks,
        token_chunks,
    )

    texts = [
        (0, "one two three four five six seven eight nine ten eleven"),
        (1, "short doc."),
        (2, ""),
        (3, None),
        (4, "punct, here! and-more tokens; " * 7),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    via_text = doc_chunks(df, max_tokens=5, stride=3).orderBy(
        "doc_id", "chunk_idx"
    )
    tokenized = df.select(
        "doc_id",
        F.regexp_extract_all(
            F.col("text"), F.lit(CHUNK_TOKEN_PATTERN), F.lit(0)
        ).alias("toks"),
    )
    via_tokens = token_chunks(
        tokenized, max_tokens=5, stride=3, tokens_col="toks"
    ).orderBy("doc_id", "chunk_idx")
    a = via_text.collect()
    b = via_tokens.collect()
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert (ra.doc_id, ra.chunk_idx, ra.tok_start, ra.tok_end,
                ra.n_chunk_tokens) == (
            rb.doc_id, rb.chunk_idx, rb.tok_start, rb.tok_end,
            rb.n_chunk_tokens,
        )
        assert " ".join(rb.chunk_tokens) == ra.chunk_text


def test_bpe_chunk_pack_chain_plan_and_invariants(spark):
    """The composed real-subword shard path (round-7 verdict task 5):
    bpe_encode → token_chunks → pack_sequences.  Plan golden: exactly
    ONE Arrow stage (the encoder), ONE exchange (the packer's
    repartition), ONE MapInPandas (the packer), zero row-wise python.
    Invariants: every chunk ≤ max_tokens so no oversize packs; chunk
    token mass equals encoded token mass (disjoint stride)."""
    from cl_readability_spark.functions.bpe import bpe_encode, bpe_fit
    from cl_readability_spark.functions.packing import (
        pack_sequences,
        token_chunks,
    )

    texts = [
        (i, f"some shared words plus unique{i} tail material here")
        for i in range(40)
    ]
    corpus = spark.createDataFrame(texts, "doc_id long, text string")
    merges = bpe_fit(corpus, n_merges=30)
    encoded = bpe_encode(corpus, merges)
    chunks = token_chunks(encoded, max_tokens=16, stride=16)
    packed = pack_sequences(
        chunks.select(
            F.concat_ws("-", F.col("doc_id"), F.col("chunk_idx")).alias(
                "doc_id"
            ),
            F.col("n_chunk_tokens").alias("n_tokens"),
        ),
        max_tokens=64,
        num_partitions=4,
    )
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:3000]
    assert plan.count("ArrowEvalPython") == 1, plan[:3000]
    assert plan.count("MapInPandas") == 1, plan[:3000]
    assert "BatchEvalPython" not in plan

    total_encoded = encoded.agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
    rows = packed.collect()
    assert sum(r.n_tokens for r in rows) == total_encoded
    assert not any(r.oversize for r in rows)
    by_pack: dict[str, int] = {}
    for r in rows:
        by_pack[r.pack_id] = by_pack.get(r.pack_id, 0) + r.n_tokens
    assert all(v <= 64 for v in by_pack.values())
