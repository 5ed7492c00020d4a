"""Corpus n-gram statistics — frequent-phrase (heavy-hitter) detection
and a count-min-sketch frequency index.

Why a pipeline needs this: memorization risk and boilerplate both show
up as n-grams repeated far beyond natural language rates (Lee et al.
2021 §5 motivates dedup with exactly this statistic; Carlini et al.
2022 measure memorization against training-set substring frequency).
``ngram_counts`` finds them exactly; ``fit_gram_cms`` builds a bounded-
memory sketch that answers "how often does this phrase appear in the
corpus?" without re-scanning it.

The n-gram builder is pure JVM — iterated ``zip_with`` over ``slice``s
of the words array.  CRITICALLY the words expression is only ever an
ARGUMENT to the HOFs, never referenced inside a lambda body: HOFs run
interpreted with no subexpression elimination, so a lambda that indexes
``element_at(split(...), i)`` re-runs the whole tokenization per
position — O(words²) per document (the ``functions/selection.py`` war
story; measured 50+ min pinned on the 1M corpus before diagnosis).
The slice form re-evaluates tokenization a constant ``n+1`` times per
document whatever the document length.

Reference parity note: the reference (atlas-engineer/cl-readability)
has no corpus surface; this module is part of the training-data-
pipeline extension the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# explicit whitespace class == RE2's \s (the DuckDB twin's engine);
# java \s would add U+000B and diverge the two engines' word splits
_WS = "[ \t\n\f\r]"


def ngram_array(text_col, n: int) -> Column:
    """``array<string>`` of space-joined word ``n``-grams of the lower/
    trimmed text (documents with fewer than ``n`` words contribute an
    empty array).

    The tokenization is BOUND ONCE per row: the words expression is
    wrapped in a single-element array and the gram build runs inside a
    ``transform`` lambda over it, so every slice/size reference sees the
    lambda VARIABLE, not the split expression.  HOFs evaluate
    interpreted with no subexpression elimination — with the split
    referenced directly (the previous shape), each of the n slices plus
    the size guards re-ran the full lower+trim+split per row: measured
    2.3× slower on the 383k-turn HTML corpus (21 s → 9 s for the
    trigram explode).  Value-identical by construction (same
    expressions, evaluated against the same words array)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    lowered = F.lower(F.trim(F.coalesce(text_col, F.lit(""))))
    words_expr = F.when(
        F.length(lowered) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(lowered, f"{_WS}+"))

    def build(w):
        m = F.size(w) - F.lit(n - 1)  # gram count when >= 1
        grams = F.slice(w, 1, m)
        for j in range(1, n):
            grams = F.zip_with(
                grams,
                F.slice(w, j + 1, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.when(
            F.size(w) < n, F.array().cast("array<string>")
        ).otherwise(grams)

    return F.element_at(F.transform(F.array(words_expr), build), 1)


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Exact corpus n-gram frequencies at or above ``min_count`` —
    columns (``gram``, ``n_occurrences``).  Occurrences, not
    document frequency: a phrase repeated inside one document counts
    every time (that is the memorization-relevant number).

    Plan shape: project + explode → hash aggregate with map-side
    partial combine → ONE exchange on ``gram`` → final aggregate →
    HAVING filter.  The partial combine collapses within-partition
    repeats before the shuffle, so shuffled bytes scale with the
    DISTINCT grams per partition, not the token count — and the
    min_count filter runs post-aggregate where it belongs (a pre-shuffle
    filter would need the very counts being computed).  At 100 TB the
    exchange is the cost; for a bounded-memory alternative that never
    shuffles grams, see ``fit_gram_cms``."""
    from cl_readability_spark.functions.parallelism import ensure_parallelism

    if n == 1:
        return (
            ensure_parallelism(df)
            .select(F.explode(ngram_array(F.col(text_col), n)).alias("gram"))
            .groupBy("gram")
            .agg(F.count("*").alias("n_occurrences"))
            .filter(F.col("n_occurrences") >= int(min_count))
        )
    # n >= 2: aggregate on the WORD-TUPLE STRUCT and render the gram
    # string only for the rows that survive min_count.  ``arrays_zip``
    # is a single native expression (no per-element lambda), so the
    # 150M+ pre-shuffle ``concat_ws`` interpreted evals of the string
    # form disappear — measured 14.2 → 10.8 s on the 383k-turn corpus,
    # value-identical (words are whitespace-split, so they cannot
    # contain the join space: grouping by the tuple ≡ grouping by the
    # joined string, and the post-aggregation concat renders the same
    # bytes).
    lowered = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    words_expr = F.when(
        F.length(lowered) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(lowered, f"{_WS}+"))
    struct_t = (
        "array<struct<" + ",".join(f"w{j}:string" for j in range(n)) + ">>"
    )

    def build(w):
        m = F.size(w) - F.lit(n - 1)
        return F.when(F.size(w) < n, F.array().cast(struct_t)).otherwise(
            F.arrays_zip(
                *[F.slice(w, j + 1, m).alias(f"w{j}") for j in range(n)]
            )
        )

    grams = F.element_at(F.transform(F.array(words_expr), build), 1)
    return (
        ensure_parallelism(df)
        .select(F.explode(grams).alias("_g"))
        .groupBy("_g")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= int(min_count))
        .select(
            F.concat_ws(
                " ", *[F.col(f"_g.w{j}") for j in range(n)]
            ).alias("gram"),
            "n_occurrences",
        )
    )


def fit_gram_cms(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Count-min sketch of the corpus n-gram stream (Cormode &
    Muthukrishnan 2005), via Spark's built-in ``count_min_sketch``
    aggregate: width ⌈e/eps⌉ × depth ⌈ln(1/(1-confidence))⌉ counters,
    estimates overshoot the true count by at most ``eps · total_grams``
    with probability ``confidence``, never undershoot.

    Scale shape vs ``ngram_counts``: NO shuffle of the gram stream at
    all — each partition folds its grams into a fixed-size sketch
    map-side and the partial sketches merge up the tree; the result is
    one bounded binary (width·depth·8 bytes) regardless of corpus size
    or gram cardinality.  The trade: you must ask it about specific
    phrases (``cms_estimate``) — it cannot enumerate the heavy hitters;
    pair it with ``ngram_counts`` over a sample to get candidates, then
    score them exactly once against the full-corpus sketch."""
    from cl_readability_spark.functions.parallelism import ensure_parallelism

    row = (
        ensure_parallelism(df)
        .select(F.explode(ngram_array(F.col(text_col), n)).alias("gram"))
        .agg(
            F.count_min_sketch(
                "gram",
                F.lit(float(eps)),
                F.lit(float(confidence)),
                F.lit(int(seed)),
            ).alias("cms")
        )
        .first()
    )
    return bytes(row["cms"])


def cms_estimate(spark, sketch: bytes, grams: list[str]) -> dict[str, int]:
    """Point-estimate occurrence counts for ``grams`` against a
    ``fit_gram_cms`` sketch — a driver-side probe of the JVM
    ``CountMinSketch`` (deserialize once, O(depth) per gram), the
    cheap read path for a handful of candidate phrases.  For scoring a
    large candidate FRAME, broadcast the sketch bytes and probe inside
    a pandas UDF instead (same binary format)."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {g: int(cms.estimateCount(g)) for g in grams}
