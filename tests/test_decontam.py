"""Benchmark decontamination (functions/decontam.py)."""

import pytest

from cl_readability_spark.functions.decontam import (
    benchmark_ngram_hashes,
    decontaminate,
)

pytestmark = pytest.mark.spark

CLEAN = "totally original writing about spark physical plans " * 4
# 13 consecutive words lifted verbatim into a longer host document
LEAK = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
)


@pytest.fixture()
def frames(spark):
    corpus = spark.createDataFrame(
        [
            (0, CLEAN),
            (1, "host document preamble " + LEAK + " host document epilogue"),
            (2, LEAK),                      # the benchmark passage verbatim
            (3, "short doc"),               # < n words: whole-run gram
        ],
        ["doc_id", "text"],
    )
    benchmark = spark.createDataFrame([(LEAK,), ("short doc",)], ["text"])
    return corpus, benchmark


def test_decontaminate_flags_exact_ngram_leaks(spark, frames):
    corpus, benchmark = frames
    out = {r.doc_id: r for r in decontaminate(corpus, benchmark).collect()}
    assert not out[0].contaminated and out[0].n_contaminated_grams == 0
    assert out[1].contaminated      # the 13-gram window inside the host doc
    assert out[2].contaminated
    # short docs match only verbatim (whole-run gram) — "short doc" is in
    # the benchmark as its own passage
    assert out[3].contaminated
    # all corpus columns survive the flag stage
    assert set(out[1].asDict()) == {
        "doc_id", "text", "contaminated", "n_contaminated_grams",
    }


def test_decontaminate_precomputed_hashes_roundtrip(spark, frames):
    """The hash set can be computed once and reused across corpora (the
    benchmark rarely changes); results are identical to the direct path."""
    import numpy as np

    corpus, benchmark = frames
    hashes = benchmark_ngram_hashes(benchmark)
    # sorted numpy int64 array — ~8 bytes/gram broadcast, vectorized
    # searchsorted membership (a python int set costs 60-90 bytes/gram)
    assert isinstance(hashes, np.ndarray) and hashes.dtype == np.int64
    assert len(hashes) > 0 and (np.diff(hashes) > 0).all()
    direct = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
              for r in decontaminate(corpus, benchmark).collect()}
    cached = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
              for r in decontaminate(corpus, hashes=hashes).collect()}
    # plain python lists keep working (cached sets from older callers)
    listed = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
              for r in decontaminate(corpus, hashes=[int(h) for h in hashes]).collect()}
    assert direct == cached == listed
    with pytest.raises(ValueError, match="benchmark or hashes"):
        decontaminate(corpus)


def test_decontaminate_join_strategy_equivalent(spark, frames):
    """The oversized-benchmark path (distributed gram join, no driver
    set) must produce flag-and-count-identical output to the broadcast
    path on the planted corpus — including the duplicate-text and
    empty-text edges the join's text-key grouping has to get right."""
    corpus, benchmark = frames
    extra = spark.createDataFrame(
        [(4, ""), (5, None), (6, CLEAN)], ["doc_id", "text"]
    )
    corpus = corpus.unionByName(extra)
    ref = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
           for r in decontaminate(corpus, benchmark, strategy="broadcast").collect()}
    joined = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
              for r in decontaminate(corpus, benchmark, strategy="join").collect()}
    assert ref == joined
    # auto flips to join above the broadcast limit — same answer
    auto_small_limit = {
        (r.doc_id, r.contaminated, r.n_contaminated_grams)
        for r in decontaminate(
            corpus, benchmark, strategy="auto", broadcast_limit=1
        ).collect()
    }
    assert auto_small_limit == ref
    # column contract is preserved by the join path too
    row = decontaminate(corpus, benchmark, strategy="join").first()
    assert set(row.asDict()) == {
        "doc_id", "text", "contaminated", "n_contaminated_grams",
    }


def test_decontaminate_size_guards(spark, frames):
    """Oversized benchmark handling: a collected set above max_grams
    raises in benchmark_ngram_hashes (collecting it IS the OOM), while
    decontaminate degrades to the distributed join plan — for a
    benchmark frame AND for precollected hashes (re-parallelized through
    Arrow, never rebuilt as driver tuples) — with identical results."""
    corpus, benchmark = frames
    with pytest.raises(ValueError, match="join"):
        benchmark_ngram_hashes(benchmark, max_grams=1)
    hashes = benchmark_ngram_hashes(benchmark)
    ref = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
           for r in decontaminate(corpus, hashes=hashes).collect()}
    degraded = {(r.doc_id, r.contaminated, r.n_contaminated_grams)
                for r in decontaminate(corpus, hashes=hashes, broadcast_limit=1).collect()}
    assert degraded == ref


def test_decontaminate_schema_identical_across_strategies(spark, frames):
    """Strict-schema consumers (e.g. unionByName over outputs produced
    under different strategies) need byte-identical schemas, nullability
    included, from every strategy and entry path (ADVICE r5 flagged the
    join path as nullable; under this Spark the coalesce output is
    non-nullable — pin it so a refactor can't reintroduce drift)."""
    corpus, benchmark = frames
    hashes = benchmark_ngram_hashes(benchmark)
    schemas = {
        "broadcast": decontaminate(corpus, benchmark, strategy="broadcast").schema,
        "join": decontaminate(corpus, benchmark, strategy="join").schema,
        "auto": decontaminate(corpus, benchmark, strategy="auto").schema,
        "auto-degraded": decontaminate(
            corpus, benchmark, strategy="auto", broadcast_limit=1
        ).schema,
        "hashes-join": decontaminate(corpus, hashes=hashes, strategy="join").schema,
    }
    ref = schemas["broadcast"]
    mismatched = {k for k, s in schemas.items() if s != ref}
    assert not mismatched, mismatched
    nullability = {f.name: f.nullable for f in ref.fields}
    assert nullability["contaminated"] is False
    assert nullability["n_contaminated_grams"] is False


def test_decontaminate_auto_releases_pin_on_failure(spark, frames, monkeypatch):
    """The auto path persists the gram frame before the guard count and
    the collect/join construction; a raise anywhere in that region must
    not leak the pin (ADVICE r5) — the session cache returns to its
    prior size."""
    import cl_readability_spark.functions.decontam as dmod

    corpus, benchmark = frames
    cache = spark._jsparkSession.sharedState().cacheManager()
    before = cache.cachedData().size()

    def boom(*args, **kwargs):
        raise RuntimeError("forced join failure")

    monkeypatch.setattr(dmod, "_decontaminate_join", boom)
    with pytest.raises(RuntimeError, match="forced join failure"):
        dmod.decontaminate(corpus, benchmark, strategy="auto", broadcast_limit=0)
    assert cache.cachedData().size() == before


def test_decontaminate_join_preserves_colliding_columns(spark, frames):
    """A corpus that already has columns named like the join path's
    internals (_tk) must come back byte-identical — the internal key is
    suffixed past collisions instead of silently overwriting user data."""
    from pyspark.sql import functions as F

    corpus, benchmark = frames
    corpus2 = corpus.withColumn("_tk", F.col("doc_id") * 100)
    rows = {r.doc_id: r for r in
            decontaminate(corpus2, benchmark, strategy="join").collect()}
    assert all(r._tk == i * 100 for i, r in rows.items())
    assert rows[2].contaminated and not rows[0].contaminated


def test_decontaminate_plan_is_shuffle_free(spark, frames):
    """The 100 TB property: flagging is scan → mapInPandas, no join and
    no exchange anywhere in the corpus-side plan (the benchmark set rides
    in as a broadcast variable, not a join side)."""
    corpus, benchmark = frames
    hashes = benchmark_ngram_hashes(benchmark)
    plan = (
        decontaminate(corpus, hashes=hashes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_redact_pii_patterns(spark):
    from pyspark.sql import functions as F

    from cl_readability_spark.functions.curation import redact_pii

    rows = [
        (0, "mail a.b+c@ex-ample.co.uk and 123-45-6789 twice: x@y.io"),
        (1, "no pii here, just 12345 and a-b@c"),  # non-matches untouched
        (2, None),
        (3, "card 4111-1111-1111-1111 or 4111111111111111 end"),
        (4, "call (555) 123-4567 or +1 555 123 4567 or +44-20-7946-0958"),
        (8, "e164 +15551234567 and tight (555)123-4567 both redact"),
        (5, "host 10.0.0.1 and 999.999.999.999 but not 1.2 or v1.2.3"),
        # documented precision choices: bare 10-digit runs and dates are
        # NOT phone numbers; dashed dates are not SSNs
        (6, "order 1234567890 stays, date 2026-08-17 stays"),
        (7, "user123@10.0.0.1 mixed numeric-host"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r.i: r.o for r in df.select("i", redact_pii(F.col("t")).alias("o")).collect()}
    assert got[0] == "mail [EMAIL] and [SSN] twice: [EMAIL]"
    assert got[1] == "no pii here, just 12345 and a-b@c"
    assert got[2] is None
    assert got[3] == "card [CARD] or [CARD] end"
    assert got[4] == "call [PHONE] or [PHONE] or [PHONE]"
    assert got[5] == "host [IPV4] and [IPV4] but not 1.2 or v1.2.3"
    assert got[6] == "order 1234567890 stays, date 2026-08-17 stays"
    # the email rule requires an alphabetic TLD, so a numeric host falls
    # through to the IPv4 rule — span-level redaction either way
    assert got[7] == "user123@[IPV4] mixed numeric-host"
    assert got[8] == "e164 [PHONE] and tight [PHONE] both redact"


def test_semantic_decontam_planted_and_reference(spark):
    """Embedding-space decontamination: scaled copies of benchmark
    vectors flag (cosine is scale-invariant), orthogonal/near-miss
    vectors don't, NULL/zero/wrong-dim score NULL and never flag —
    and every sim matches an independent numpy reference exactly."""
    import numpy as np

    from cl_readability_spark.functions.decontam import semantic_decontam

    rng = np.random.default_rng(7)
    bench_vecs = [rng.normal(size=8).tolist() for _ in range(3)]
    bench = spark.createDataFrame(
        [(i, v) for i, v in enumerate(bench_vecs)],
        "bid long, embedding array<double>",
    )
    corpus_rows = [
        (0, [2.0 * x for x in bench_vecs[0]]),     # scaled copy -> flag
        (1, [-1.0 * x for x in bench_vecs[1]]),    # antiparallel -> no
        (2, rng.normal(size=8).tolist()),          # random -> no
        (3, None),                                  # NULL -> NULL sim
        (4, [0.0] * 8),                             # zero-norm -> NULL
        (5, [1.0, 2.0]),                            # wrong dim -> NULL
        (6, bench_vecs[2]),                         # exact copy -> flag
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, embedding array<double>"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in semantic_decontam(corpus, bench, threshold_x10k=9999).collect()
    }
    B = np.asarray(bench_vecs)
    B = B / np.linalg.norm(B, axis=1)[:, None]
    for d, v in corpus_rows:
        if v is None or len(v) != 8 or not np.linalg.norm(v):
            assert out[d]["semantic_max_sim_x10k"] is None
            assert out[d]["semantically_contaminated"] is False
            continue
        x = np.asarray(v)
        ref = int(np.rint((B @ (x / np.linalg.norm(x))).max() * 10_000))
        assert out[d]["semantic_max_sim_x10k"] == ref, (d, ref)
    assert out[0]["semantically_contaminated"]
    assert out[6]["semantically_contaminated"]
    assert not any(
        out[d]["semantically_contaminated"] for d in (1, 2, 3, 4, 5)
    )


def test_semantic_decontam_guards(spark):
    import pytest as _pytest

    from cl_readability_spark.functions.decontam import semantic_decontam

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    empty = spark.createDataFrame([], "embedding array<double>")
    with _pytest.raises(ValueError, match="no non-NULL"):
        semantic_decontam(corpus, empty)
    zeros = spark.createDataFrame(
        [([0.0, 0.0],)], "embedding array<double>"
    )
    with _pytest.raises(ValueError, match="zero-norm"):
        semantic_decontam(corpus, zeros)
    big = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "embedding array<double>"
    )
    with _pytest.raises(ValueError, match="max_bench"):
        semantic_decontam(corpus, big, max_bench=1)
    with _pytest.raises(ValueError, match="threshold_x10k"):
        semantic_decontam(corpus, big, threshold_x10k=20_000)


def test_semantic_decontam_plan_is_shuffle_free(spark):
    """The n-gram broadcast stance applied to vectors: one stateless
    Arrow stage, zero exchanges over the corpus."""
    from cl_readability_spark.functions.decontam import semantic_decontam

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "doc_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [([1.0, 0.0],)], "embedding array<double>"
    )
    plan = (
        semantic_decontam(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]


def test_semantic_decontam_nan_embedding_is_undecidable(spark):
    """ADVICE r7: a corpus embedding with a NaN/inf component yields a
    NaN cosine — int(rint(nan)) raised and failed the whole job.  The
    finite guard must mark the row NULL (undecidable, never flagged),
    like the NULL/zero-norm/wrong-dim paths, while finite rows in the
    same batch still score."""
    from cl_readability_spark.functions.decontam import semantic_decontam

    bench = spark.createDataFrame(
        [([1.0, 0.0, 0.0],)], "embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (0, [float("nan"), 1.0, 0.0]),
            (1, [float("inf"), 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0]),  # finite: exact direction match
        ],
        "doc_id long, embedding array<double>",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in semantic_decontam(corpus, bench, threshold_x10k=9999).collect()
    }
    for d in (0, 1):
        assert out[d]["semantic_max_sim_x10k"] is None, out[d]
        assert out[d]["semantically_contaminated"] is False
    assert out[2]["semantic_max_sim_x10k"] == 10_000
    assert out[2]["semantically_contaminated"]
