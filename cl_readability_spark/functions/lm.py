"""Language-model perplexity scoring — the CCNet quality signal
(Wenzek et al. 2020, arXiv:1911.00359: score every document with a
reference-corpus LM and filter/stratify on perplexity; CCNet uses a
KenLM 5-gram — this module is the honest in-repo heuristic, an
interpolated BIGRAM model with a closed top-V vocabulary, consistent
with the repo's langid/quality_score heuristics and exactly
reproducible in SQL/python for the oracle gate).

Model: tokens are the DSIR whitespace convention (lower-cased,
full-whitespace-class trimmed splits).  The vocabulary is the top
``vocab_size - 1`` reference words by (count desc, word asc) — a
``TakeOrderedAndProject``, never a global sort — plus ``<unk>``, to
which every out-of-vocabulary token maps on BOTH the fit and score
sides.  Probabilities::

    P_uni(w) = (c(w) + α) / (N + α·V)          (additive smoothing)
    P(w | p) = λ·c(p,w)/c(p) + (1-λ)·P_uni(w)  (interpolated ML bigram)

with c(p) the UNPRUNED bigram-context total (so pruning rare bigrams
with ``min_bigram_count`` moves their mass into the backoff term and
probabilities stay properly normalized).  A document's score is the
mean token log-prob — the first token scored by P_uni, every other by
P(w|p) — and ``lm_perplexity = exp(-mean)``; token-less docs get NULL.

Scale shape: fit = one reference scan into a map-side-combined unigram
count, a TakeOrdered top-V, one bigram-pair scan (pairs built with the
``zip_with``-over-slices recipe — NEVER ``element_at(words, i)`` per
position, which re-tokenizes quadratically in interpreted HOF eval;
see the DSIR postscript in CHANGELOG round 7), context totals as a
bounded agg over the bigram count frame.  Score = one corpus scan
exploding (prev, word) pairs, THREE broadcast joins (vocab, bigram
table, unigram table — all bounded by construction: ≤ V, ≤ observed
bigrams ≥ min_count, ≤ V rows), and a per-doc mean with map-side
combine.  No driver collect, no python, no unbounded shuffle key: the
only corpus-wide exchange is the per-doc aggregation, keyed on the
row id.  At 100 TB fit on a SAMPLE (the CCNet setting — the model is a
quality yardstick, not a corpus statistic) and reuse the model frames
across scoring runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNK = "<unk>"

_WS = "[ \t\n\f\r]"


def _words(text_col):
    """Lower-cased whitespace tokens (the DSIR convention: explicit
    whitespace class for Java/RE2 parity; empty/NULL text → empty
    array)."""
    t_expr = F.regexp_replace(
        F.lower(F.coalesce(text_col, F.lit(""))), f"^{_WS}+|{_WS}+$", ""
    )
    # bind the trimmed string once (the ngram_array single-element-array
    # trick — interpreted HOF eval re-runs the regexp per reference)
    return F.element_at(
        F.transform(
            F.array(t_expr),
            lambda t: F.when(
                t == "", F.array().cast("array<string>")
            ).otherwise(F.split(t, f"{_WS}+")),
        ),
        1,
    )


def _pair_structs(words):
    """array<struct<_p,_w>> of (prev, word) per token: the first token
    pairs with NULL prev, the rest via zip_with over two slices (no
    per-position indexing of the words expression — the interpreted-HOF
    quadratic-re-tokenization trap)."""
    def build(w):
        n = F.size(w)
        pairs = F.when(
            n < 2, F.array().cast("array<struct<_p:string,_w:string>>")
        ).otherwise(
            F.zip_with(
                F.slice(w, 1, n - 1),
                F.slice(w, 2, n - 1),
                lambda a, b: F.struct(a.alias("_p"), b.alias("_w")),
            )
        )
        first = F.when(
            n >= 1,
            F.array(
                F.struct(
                    F.lit(None).cast("string").alias("_p"),
                    F.element_at(w, 1).alias("_w"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<_p:string,_w:string>>"))
        return F.concat(first, pairs)

    # bind the words array once (the ngram_array single-element-array
    # trick): the size/slice/first-token references otherwise re-run the
    # whole tokenization per reference under interpreted HOF eval
    return F.element_at(F.transform(F.array(words), build), 1)


def lm_fit(
    reference: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
    min_bigram_count: int = 2,
    alpha: float = 1.0,
) -> dict:
    """Fits the interpolated-bigram model on ``reference``; returns a
    dict of BOUNDED model frames (persist/write them to reuse across
    scoring runs): ``vocab`` (_w), ``uni`` (_w, _p_uni — linear,
    smoothed, closed vocab incl. <unk>), ``bi`` (_p, _w, _p_ml — the
    pruned ML conditional), plus the config scalars."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if min_bigram_count < 1:
        raise ValueError(
            f"min_bigram_count must be >= 1, got {min_bigram_count}"
        )
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from pyspark.sql.window import Window

    # ONE reference pass: explode (prev, word) pairs and aggregate raw
    # counts by the exact (prev, word) strings.  Every token appears
    # exactly once as _w (the first pairs with NULL prev), so the raw
    # UNIGRAM counts derive from this same bounded frame by summing over
    # _p — the old shape tokenized the reference twice (a separate
    # unigram explode; measured ~3.6 s of the 15.9 s sf1.0 query).  All
    # integer aggregation, so every downstream model frame is
    # value-identical.  The bounded pair-count frame is pinned DISK_ONLY
    # (several plan branches read it; handle under model["pins"]).
    from pyspark.storagelevel import StorageLevel

    from cl_readability_spark.functions.parallelism import ensure_parallelism

    raw_pairs = (
        ensure_parallelism(reference).select(
            F.explode(_pair_structs(_words(F.col(text_col)))).alias("_pr")
        )
        .select(F.col("_pr._p").alias("_p"), F.col("_pr._w").alias("_w"))
        .groupBy("_p", "_w")
        .agg(F.count("*").alias("_pc"))
        .persist(StorageLevel.DISK_ONLY)
    )
    raw_uni = raw_pairs.groupBy("_w").agg(F.sum("_pc").alias("_c"))
    vocab = (
        raw_uni.orderBy(F.desc("_c"), F.asc("_w"))
        .limit(vocab_size - 1)
        .select("_w")
    )
    # closed unigram counts: OOV mass collapses onto <unk>; V_closed =
    # vocab_size (vocab words + <unk>) regardless of how many made the
    # cut, so smoothing is stable even on tiny references
    closed_uni = (
        raw_uni.join(F.broadcast(vocab.withColumn("_in", F.lit(True))), "_w", "left")
        .select(
            F.when(F.col("_in"), F.col("_w")).otherwise(F.lit(UNK)).alias("_w"),
            "_c",
        )
        .groupBy("_w")
        .agg(F.sum("_c").alias("_c"))
    )
    # guarantee an <unk> row even when the reference has zero OOV
    # tokens (tiny/closed references): a scoring-side unseen word maps
    # to <unk>, and a missing unigram row would NULL its log-prob and
    # silently drop it from the doc mean
    unk_row = reference.sparkSession.range(1).select(
        F.lit(UNK).alias("_w"), F.lit(0).cast("long").alias("_c")
    )
    closed_uni = (
        closed_uni.unionByName(unk_row)
        .groupBy("_w")
        .agg(F.sum("_c").alias("_c"))
    )
    # N via a global window over the ≤V-row closed table (bounded by
    # construction — re-referencing the agg for a totals scalar would
    # re-run its subplan per reference: the DSIR spine lesson)
    tot_w = Window.partitionBy(F.lit(1))
    uni = closed_uni.select(
        "_w",
        (
            (F.col("_c") + F.lit(float(alpha)))
            / (F.sum("_c").over(tot_w) + F.lit(float(alpha * vocab_size)))
        ).alias("_p_uni"),
    )
    bigrams = raw_pairs.filter(F.col("_p").isNotNull())
    closed = (
        bigrams.join(
            F.broadcast(
                vocab.select(F.col("_w").alias("_p"), F.lit(True).alias("_pin"))
            ),
            "_p",
            "left",
        )
        .join(
            F.broadcast(vocab.withColumn("_win", F.lit(True))), "_w", "left"
        )
        .select(
            F.when(F.col("_pin"), F.col("_p")).otherwise(F.lit(UNK)).alias("_p"),
            F.when(F.col("_win"), F.col("_w")).otherwise(F.lit(UNK)).alias("_w"),
            F.col("_pc"),
        )
    )
    bi_counts = closed.groupBy("_p", "_w").agg(F.sum("_pc").alias("_c"))
    ctx_w = Window.partitionBy("_p")
    bi = (
        bi_counts.withColumn("_ctx", F.sum("_c").over(ctx_w))
        .filter(F.col("_c") >= min_bigram_count)
        .select(
            "_p", "_w", (F.col("_c") / F.col("_ctx")).alias("_p_ml")
        )
    )
    return {
        "vocab": vocab,
        "uni": uni,
        "bi": bi,
        "vocab_size": int(vocab_size),
        "alpha": float(alpha),
        "min_bigram_count": int(min_bigram_count),
        # the raw pair-count pin (release via pins.release_pinned on a
        # frame that carries it, or pins.release_all_pins(spark))
        "pins": [raw_pairs],
    }


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame | None = None,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.9,
    **fit_kwargs,
) -> DataFrame:
    """``docs`` + ``lm_logp_per_token`` (mean token log-prob) +
    ``lm_perplexity`` (exp of its negation; NULL for token-less docs).
    Pass a fitted ``model`` (from :func:`lm_fit`) or a ``reference``
    corpus to fit on the fly — exactly one of the two."""
    if (reference is None) == (model is None):
        raise ValueError("pass exactly one of reference= or model=")
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    if model is None:
        model = lm_fit(reference, text_col=text_col, **fit_kwargs)
    vocab, uni, bi = model["vocab"], model["uni"], model["bi"]

    from cl_readability_spark.functions.parallelism import ensure_parallelism

    tokens = ensure_parallelism(docs).select(
        F.col(id_col).alias("_lm_id"),
        F.explode(_pair_structs(_words(F.col(text_col)))).alias("_pr"),
    ).select(
        "_lm_id", F.col("_pr._p").alias("_p"), F.col("_pr._w").alias("_w")
    )
    closed = (
        tokens.join(
            F.broadcast(
                vocab.select(F.col("_w").alias("_p"), F.lit(True).alias("_pin"))
            ),
            "_p",
            "left",
        )
        .join(F.broadcast(vocab.withColumn("_win", F.lit(True))), "_w", "left")
        .select(
            "_lm_id",
            F.when(F.col("_p").isNull(), F.lit(None))
            .when(F.col("_pin"), F.col("_p"))
            .otherwise(F.lit(UNK))
            .alias("_p"),
            F.when(F.col("_win"), F.col("_w")).otherwise(F.lit(UNK)).alias("_w"),
        )
    )
    scored = (
        closed.join(F.broadcast(uni), "_w", "left")
        .join(F.broadcast(bi), ["_p", "_w"], "left")
        .select(
            "_lm_id",
            F.when(
                F.col("_p").isNull(), F.log(F.col("_p_uni"))
            )
            .otherwise(
                F.log(
                    F.lit(float(lam)) * F.coalesce(F.col("_p_ml"), F.lit(0.0))
                    + F.lit(1.0 - float(lam)) * F.col("_p_uni")
                )
            )
            .alias("_logp"),
        )
    )
    per_doc = scored.groupBy("_lm_id").agg(
        F.avg("_logp").alias("lm_logp_per_token")
    )
    out = docs.join(
        per_doc, docs[id_col] == per_doc["_lm_id"], "left"
    ).drop("_lm_id")
    out = out.select(
        *[F.col(c) for c in docs.columns],
        F.col("lm_logp_per_token"),
        F.exp(-F.col("lm_logp_per_token")).alias("lm_perplexity"),
    )
    if model.get("pins"):
        from cl_readability_spark.functions.pins import attach_pins

        out = attach_pins(out, *model["pins"])
    return out


def ppl_partition(
    docs: DataFrame,
    reference: DataFrame | None = None,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = (),
    n_buckets: int = 3,
    labels: tuple[str, ...] | None = ("head", "middle", "tail"),
    lam: float = 0.9,
    **fit_kwargs,
) -> DataFrame:
    """The CCNet corpus partition (Wenzek et al. 2020 §4.4): score every
    document with :func:`lm_perplexity`, then cut the corpus (per
    ``group_cols`` stratum — CCNet strata are languages) into
    ``n_buckets`` equal-size rank buckets, LOWEST perplexity first —
    bucket 1 / label ``head`` is the most-fluent third under the default
    3-way split.  Token-less documents (NULL perplexity) land in the
    head buckets under ascending NULLS FIRST ordering — filter them
    upstream if that is not wanted (CCNet drops empty docs before
    scoring).  Adds ``lm_logp_per_token``, ``lm_perplexity``,
    ``score_rank``, ``ppl_bucket`` (+ ``ppl_bucket_label``).

    Scale shape: one LM scoring pass (three bounded broadcast joins +
    one per-doc mean, see :func:`lm_perplexity`) + the scalable
    two-phase rank from :func:`~cl_readability_spark.functions.assembly.
    rank_buckets` — no single-partition sort anywhere.  The returned
    frame carries the rank stage's pin (``release_pinned`` when done).
    """
    if labels is not None and len(labels) != int(n_buckets):
        labels = None
    from cl_readability_spark.functions.assembly import rank_buckets

    scored = lm_perplexity(
        docs,
        reference=reference,
        model=model,
        text_col=text_col,
        id_col=id_col,
        lam=lam,
        **fit_kwargs,
    )
    return rank_buckets(
        scored,
        score_col="lm_perplexity",
        n_buckets=n_buckets,
        group_cols=group_cols,
        id_col=id_col,
        ascending=True,
        labels=labels,
        bucket_col="ppl_bucket",
    )
