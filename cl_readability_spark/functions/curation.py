"""Corpus curation: the composed training-data pipeline over extraction
output — quality gating, exact dedup, MinHash near-dup pruning — as one
flag-based pass (extract → flags → filter), so the whole curation is a
single job with a one-row audit report instead of a count() per stage.

Flag semantics (gates attributed HIERARCHICALLY, so the report's per-gate
drop counts partition ``rows_in`` exactly):
- ``quality_ok``   — length bounds + stopword ratio + langid gate
- ``contaminated`` — shares a word n-gram with the benchmark set
                     (``functions/decontam.py``; all-False when no
                     ``benchmark_hashes`` are supplied).  Placed BEFORE
                     dedup on purpose: a contaminated doc must never be
                     the kept representative of a duplicate cluster
                     while its clean near-dups get dropped.
- ``exact_keep``   — first quality_ok, non-contaminated row (by key) of
                     each normalized-text fingerprint; always False for
                     quality-failed or contaminated rows
- ``near_dup_drop``— row is a non-representative member of a verified
                     MinHash near-duplicate cluster (``policy="clusters"``,
                     the default: connected components over the verified
                     pairs, keep the minimum-key representative), or the
                     higher-key side of each verified pair
                     (``policy="pairwise"``); computed over the
                     quality+exact survivors only
- ``kept``         — quality_ok AND exact_keep AND NOT near_dup_drop

so  rows_in = dropped_quality + dropped_contaminated + dropped_exact_dup
            + dropped_near_dup + rows_kept  holds as an identity
(asserted in tests).

Plan shape: the expensive extraction subtree feeding ``curate`` is
referenced on BOTH sides of the near-dup prune (survivors → minhash →
drops, then drops joined back).  Spark has no cross-branch subplan reuse
(PLANS.md), so by default the flagged frame is materialized once
(``materialize="local_checkpoint"``) before the branch — extraction runs
exactly once per curation (plan-shape-tested: zero MapInArrow in the
final DAG, the single extraction pass lives in the checkpoint job).  In
production the equivalent is curating from the committed sink table
(pipeline/sink.py); pass ``materialize="none"`` when the input is already
a materialized table.

At 100 TB: the wide ops are one fingerprint window (or groupBy), the
minhash bucket shuffle, and the pair anti-join — all keyed, all
AQE-manageable; no driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from cl_readability_spark.functions.dedup import dup_clusters, minhash_near_dups
from cl_readability_spark.functions.pins import attach_pins, release_pinned
from cl_readability_spark.functions.sqltwins import (
    C4_JS_LINE_RE,
    C4_SENTENCE_RE,
    LANG_MARKERS,
    PII_PATTERNS as _PII_PATTERNS,
    STOPWORDS,
    c4_badword_re,
    c4_drop_line_re,
    c4_short_line_re,
)


def _token_occurrences(lowered, tokens) -> "F.Column":
    """Count of whitespace-delimited tokens of ``lowered`` (an already
    lower+trimmed Column) equal to any of ``tokens`` — occurrences, not
    distinct hits, so it is value-identical to
    ``size(filter(split(lowered, '\\s+'), x -> x.isin(tokens)))`` but a
    single codegen'd ``regexp_count`` instead of an interpreted lambda
    HOF (the PLANS.md HOF rule; the gopher_flags alpha-count precedent
    at :163).  Each match consumes one leading separator (or ^), the
    lookahead leaves the trailing separator for the next token's match,
    and java's alternation backtracking makes prefix-shadowing ("a" vs
    "and") a non-issue.  ``\\s`` here is java's class — the SAME class
    the splitter uses, so boundaries agree by construction."""
    pat = r"(?:^|\s)(?:" + "|".join(tokens) + r")(?=\s|$)"
    return F.regexp_count(lowered, F.lit(pat))


def quality_flag(
    text_col,
    min_chars: int = 100,
    max_chars: int = 200_000,
    min_stopword_bp: int = 100,
    langs: tuple[str, ...] = ("en",),
):
    """Boolean Column: length window + stopword-ratio floor + langid gate
    (the sqltwins quality/langid heuristics composed as one expression).
    Fully whole-stage-codegen: the stopword and language-marker counts
    are ``regexp_count`` projections (``_token_occurrences``), not
    lambda HOFs — value-identical to the filter-HOF form (differential
    test in tests/test_curation.py) with no interpreted per-row eval in
    ``curate()``'s flagship gate (round-7 verdict task 1)."""
    n_chars = F.length(text_col)
    lowered = F.lower(F.trim(text_col))
    words = F.split(lowered, r"\s+")
    n_words = F.size(words)
    n_stop = _token_occurrences(lowered, STOPWORDS)
    stop_bp = F.when(n_words > 0, n_stop * 10000 / n_words).otherwise(0)
    scores = {
        lang: _token_occurrences(lowered, m)
        for lang, m in LANG_MARKERS.items()
    }
    best = None
    for lang in LANG_MARKERS:
        cond = None
        for other in LANG_MARKERS:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    lang_pred = best.otherwise(list(LANG_MARKERS)[-1])
    return (
        (n_chars >= min_chars)
        & (n_chars <= max_chars)
        & (stop_bp >= min_stopword_bp)
        & lang_pred.isin(*langs)
    )


# the 8 stopwords of the Gopher rules (Rae et al. 2021 §A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_ratio_bp: int = 1000,
    min_alpha_word_bp: int = 8000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Adds the Gopher document-quality rule columns (Rae et al. 2021
    §A1.1 — the standard LLM pre-training text filter): ``n_words``,
    ``n_chars`` (non-whitespace), ``n_symbols`` ('#' chars + '...'
    occurrences), ``n_alpha_words`` (words containing a letter),
    ``n_stopwords`` (distinct hits among the Gopher 8), and the combined
    ``gopher_ok``.  Ratio thresholds are basis points and every rule is
    evaluated with integer CROSS-MULTIPLICATION — no floats, so the
    flags are engine-exact (the ``gopher_quality`` DuckDB twin hash-
    matches these exact expressions).  Whitespace is the EXPLICIT class
    ``[ \\t\\n\\f\\r]`` on both engines — java-regex ``\\s`` includes
    vertical tab U+000B, RE2's does not, so ``\\s`` would silently
    diverge the two engines' word splits on VT-bearing text.  Filter
    ``gopher_ok`` as a pre-training gate, or AND it into ``curate``'s
    quality gate upstream.

    Plan shape: ONE fully whole-stage-codegen projection — the alpha
    count is a ``regexp_count`` of word-start-to-first-letter matches
    (definitionally the number of words containing a letter), not a
    lambda HOF, which Catalyst would run interpreted per row (PLANS.md
    HOF note; the round-6 1M sweep measured that lambda as real wall
    time); no shuffle, no python stage — scan → project at any scale.

    NOTE: the six flag columns are added with ``withColumn`` and will
    REPLACE same-named input columns; rename yours first if they
    collide (n_words/n_chars/n_symbols/n_alpha_words/n_stopwords/
    gopher_ok)."""
    lowered = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    # explicit whitespace class == RE2's \s (the DuckDB twin's engine);
    # java \s would add U+000B and split differently on VT-bearing text
    ws = "[ \t\n\f\r]"
    words = F.split(lowered, f"{ws}+")
    n = F.size(words).cast("long")
    chars = F.length(F.regexp_replace(lowered, f"{ws}+", "")).cast("long")
    n_hash = (
        F.length(lowered) - F.length(F.replace(lowered, F.lit("#")))
    ).cast("long")
    n_ellipsis = (
        (F.length(lowered) - F.length(F.replace(lowered, F.lit("...")))) / 3
    ).cast("long")
    # words containing a letter, WITHOUT a lambda HOF (interpreted,
    # breaks whole-stage codegen): count matches of word-start →
    # first letter.  A match consumes one separator (or ^) plus the
    # token's prefix through a letter; \S* cannot cross whitespace and
    # mid-token positions can never re-match (no ^/separator there), so
    # matches biject with letter-bearing tokens — definitionally
    # len(filter(words, contains [a-z])).
    n_alpha = F.regexp_count(
        lowered, F.lit(f"(^|{ws})[^ \t\n\f\r]*[a-z]")
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    ok = (
        n.between(min_words, max_words)
        & (min_mean_word_len * n <= chars)
        & (chars <= max_mean_word_len * n)
        & ((n_hash + n_ellipsis) * 10000 <= n * max_symbol_ratio_bp)
        & (n_alpha * 10000 >= n * min_alpha_word_bp)
        & (n_stop >= min_stopwords)
    )
    return (
        df.withColumn("n_words", n)
        .withColumn("n_chars", chars)
        .withColumn("n_symbols", (n_hash + n_ellipsis).cast("long"))
        .withColumn("n_alpha_words", n_alpha)
        .withColumn("n_stopwords", n_stop)
        .withColumn("gopher_ok", ok)
    )


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 cleaning battery (Raffel et al. 2020 §2.2) — the FILTER
    half of the C4 recipe, complementing ``line_dedup`` (its dedup
    half).  Line level, applied in this order per line: drop lines
    containing "javascript" (any case); drop lines with fewer than
    ``min_words_per_line`` words (paper: 3 — the released TF pipeline
    tightened it to 5; parameterized here); drop lines whose last
    non-whitespace character is not terminal punctuation (period,
    exclamation, question mark, straight or curly end quote — the
    paper's "terminal punctuation mark (i.e. a period, exclamation
    mark, question mark, or end quotation mark)").  Page level, flags
    only (C4 REMOVES such pages; filter on ``c4_keep``): contains
    "lorem ipsum" (case-insensitive), contains a curly bracket ``{``,
    contains a ``badwords`` entry (plain lowercase words, matched with
    non-alphanumeric boundaries — C4 used the public "List of Dirty,
    Naughty, Obscene or Otherwise Bad Words", which ships externally;
    pass your list), and fewer than ``min_sentences`` sentences (paper:
    5).  ``n_sentences`` counts ``[.!?]+`` runs in the CLEANED text — a
    documented heuristic where the TF pipeline uses an NLTK sentence
    splitter (line filtering first, page gates on what remains, as
    there).

    Adds: ``c4_text`` (surviving lines joined by \\n; NULL iff the
    input text was NULL — original line bytes preserved, like
    ``line_dedup``), ``n_lines``, ``n_kept_lines``,
    ``n_drop_javascript`` / ``n_drop_short_line`` /
    ``n_drop_no_terminal`` (attribution in that precedence order, so
    they partition the dropped lines exactly:
    ``n_lines = n_kept_lines + the three drop counts`` is an identity,
    asserted in tests), ``has_lorem_ipsum``, ``has_curly_brace``,
    ``has_badword``, ``n_sentences``, ``c4_keep``.  Same collision
    caveat as ``gopher_flags``: these are ``withColumn`` additions.

    Plan shape: ONE fully whole-stage-codegen projection — the line
    battery is a multiline ``regexp_replace`` over ``text || '\\n'``
    plus ``regexp_count`` s of nested-union patterns (count(JS),
    count(JS|SHORT); differences give exact per-reason attribution
    without conjunction regexes), all built from the shared
    ``sqltwins`` C4 literals (mandatory-``\\n`` terminator convention;
    the Spark side alone prepends ``(?d)`` so Java's line semantics
    match RE2's \\n-only model — rationale on the literals).  No
    explode, no shuffle, no lambda HOF, no python stage: scan → project
    at any scale, trivially AQE-free and skew-free.

    Cites C4 for semantics: Raffel et al. 2020 (JMLR 21(140)) §2.2;
    reference repo has no counterpart (its scope ends at extraction —
    readability-plump.lisp).
    """
    nn = F.col(text_col).isNotNull()
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = F.concat(txt, F.lit("\n"))
    zero = F.lit(0).cast("long")

    def count(col, pattern):
        return F.when(nn, F.regexp_count(col, F.lit(pattern))).otherwise(
            zero
        ).cast("long")

    sp = "(?dm)"  # d = UNIX_LINES (\n-only, like RE2); m = multiline ^
    drop_re = sp + c4_drop_line_re(min_words_per_line)
    kept_t = F.regexp_replace(t, drop_re, "")
    n_lines = count(t, r"\n")
    n_kept = count(kept_t, r"\n")
    c4_text = F.when(
        nn,
        F.when(kept_t == "", F.lit("")).otherwise(
            F.substring(kept_t, 1, F.length(kept_t) - 1)
        ),
    )
    n_js = count(t, sp + r"^(?:" + C4_JS_LINE_RE + r")\n")
    short = c4_short_line_re(min_words_per_line)
    if short is None:
        n_js_short = n_js
    else:
        n_js_short = count(
            t, sp + r"^(?:" + C4_JS_LINE_RE + "|" + short + r")\n"
        )
    lowered = F.lower(txt)
    has_lorem = nn & lowered.contains("lorem ipsum")
    has_curly = nn & txt.contains("{")
    has_bad = (
        (nn & lowered.rlike(c4_badword_re(badwords)))
        if badwords
        else F.lit(False)
    )
    n_sentences = count(F.coalesce(c4_text, F.lit("")), C4_SENTENCE_RE)
    keep = (
        nn
        & ~has_lorem
        & ~has_curly
        & ~has_bad
        & (n_sentences >= F.lit(min_sentences))
    )
    return (
        df.withColumn("c4_text", c4_text)
        .withColumn("n_lines", n_lines)
        .withColumn("n_kept_lines", n_kept)
        .withColumn("n_drop_javascript", n_js)
        .withColumn("n_drop_short_line", n_js_short - n_js)
        .withColumn("n_drop_no_terminal", n_lines - n_kept - n_js_short)
        .withColumn("has_lorem_ipsum", has_lorem)
        .withColumn("has_curly_brace", has_curly)
        .withColumn("has_badword", has_bad)
        .withColumn("n_sentences", n_sentences)
        .withColumn("c4_keep", keep)
    )


# Gopher repetition thresholds (Rae et al. 2021 Table A1), in basis
# points: a document is repetition-flagged when ANY fraction exceeds its
# threshold.  Shared with the DuckDB twin (closed-form planted corpus).
GOPHER_REPETITION_THRESHOLDS_BP = {
    "dup_line_fraction": 3000,
    "dup_para_fraction": 3000,
    "dup_line_char_fraction": 2000,
    "dup_para_char_fraction": 2000,
    "top_2gram_char_fraction": 2000,
    "top_3gram_char_fraction": 1800,
    "top_4gram_char_fraction": 1600,
    "dup_5gram_char_fraction": 1500,
    "dup_6gram_char_fraction": 1400,
    "dup_7gram_char_fraction": 1300,
    "dup_8gram_char_fraction": 1200,
    "dup_9gram_char_fraction": 1100,
    "dup_10gram_char_fraction": 1000,
}


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pin_input: bool = False,
) -> DataFrame:
    """The Gopher REPETITION rules (Rae et al. 2021 §A1.1 Table A1 —
    the other half of the MassiveText quality filter next to
    ``gopher_flags``): per document,

    - ``dup_line_fraction`` / ``dup_para_fraction`` — fraction of
      non-empty lines (split on ``\\n``) / paragraphs (split on blank
      lines, ``\\n{2,}``) that are repeats of an earlier identical one;
    - ``dup_line_char_fraction`` / ``dup_para_char_fraction`` —
      fraction of those units' characters contained in the repeats;
    - ``top_{2,3,4}gram_char_fraction`` — fraction of word characters
      covered by the single most frequent word n-gram (occurrences ×
      the gram's non-space characters, over total word characters); a
      gram must occur at least TWICE to count (a unique n-gram is not
      repetition — without the guard every short document would trip
      the rule on its longest unique 2-gram);
    - ``dup_{5..10}gram_char_fraction`` — fraction of word characters
      covered by n-grams occurring more than once, counting each WORD
      POSITION at most once however many duplicated grams overlap it
      (the paper's "taking care not to count characters that occur in
      overlapping n-grams more than once").

    ``repetition_ok`` is True when no fraction exceeds its Table A1
    threshold (``GOPHER_REPETITION_THRESHOLDS_BP``); every comparison is
    integer cross-multiplied, so the flags are engine-exact.  All
    "characters" are non-separator characters (line/para chars = the
    unit's bytes as split; gram chars = word characters, excluding the
    joining spaces); words come from the same explicit whitespace split
    as ``gopher_flags`` (lowercased — Gopher's dedup normalization).

    Plan shape (100 TB): the line/paragraph stats are ONE whole-stage-
    codegen projection — no lambda HOFs: dup counts via
    ``size - size(array_distinct)``, char sums via
    ``length(concat_ws('', arr))`` vs the distinct array.  The n-gram
    stats are a single posexplode of words + ONE window pass per doc
    (``lead(word, k)`` builds every 2..10-gram in one sort, partitions
    bounded by document length) feeding two keyed aggregations: gram
    counts on (doc, n, gram-hash) and the positional union on
    (doc, n, word-idx) — both partial-aggregate map-side and every key
    is bounded by a single document's size, so no corpus-wide hot keys
    exist by construction.  Returns one row per input row (id + the 13
    integer numerator/denominator pairs folded to fractions in basis
    points + ``repetition_ok``).

    The gram aggregates are joined back onto the per-doc base — the
    input subtree is referenced in several plan branches, so run this
    over a scan/sink-staged frame (deterministic, re-evaluates
    identically) or pass ``pin_input=True`` to materialize the tokenized
    base DISK_ONLY (standard ``pins.release_pinned`` handle on the
    returned frame) — the PLANS.md materialize-before-self-join rule."""
    from pyspark.sql.window import Window

    text = F.coalesce(F.col(text_col), F.lit(""))
    # --- line / paragraph stats: pure codegen projection ---
    def unit_stats(sep_pattern: str, prefix: str):
        trimmed = F.regexp_replace(
            text, f"^(?:{sep_pattern})+|(?:{sep_pattern})+$", ""
        )
        arr = F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
            F.split(trimmed, f"(?:{sep_pattern})+")
        )
        distinct = F.array_distinct(arr)
        return {
            f"n_{prefix}": F.size(arr).cast("long"),
            f"n_dup_{prefix}": (F.size(arr) - F.size(distinct)).cast("long"),
            f"{prefix}_chars": F.length(F.concat_ws("", arr)).cast("long"),
            f"dup_{prefix}_chars": (
                F.length(F.concat_ws("", arr))
                - F.length(F.concat_ws("", distinct))
            ).cast("long"),
        }

    # paragraphs split on \n{2,} (any blank-line run), not literal
    # \n\n — an odd-length newline run must not glue a stray \n onto
    # the next paragraph (round-7 review finding)
    stats = {**unit_stats(r"\n", "lines"), **unit_stats(r"\n{2,}", "paras")}
    lowered = F.lower(F.trim(text))
    ws = "[ \t\n\f\r]"
    words = F.when(
        F.length(lowered) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(lowered, f"{ws}+"))
    base = df.select(
        F.col(id_col).alias("_id"),
        words.alias("_words"),
        *[v.alias(k) for k, v in stats.items()],
    )
    base = base.withColumn(
        "word_chars", F.length(F.concat_ws("", F.col("_words"))).cast("long")
    )
    if pin_input:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.DISK_ONLY)

    # --- n-gram stats: one explode + one lead-window pass ---
    w_pos = base.select(
        "_id", F.posexplode("_words").alias("_idx", "_word")
    )
    win = Window.partitionBy("_id").orderBy("_idx")
    lead_cols = [F.col("_word").alias("_w0")] + [
        F.lead("_word", k).over(win).alias(f"_w{k}") for k in range(1, 10)
    ]
    led = w_pos.select("_id", "_idx", *lead_cols)
    # stack the 2..10-gram per position as (n, gram) structs; a gram is
    # valid only when its last word exists (lead returned non-null)
    gram_structs = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                F.when(
                    F.col(f"_w{n - 1}").isNotNull(),
                    F.concat_ws(
                        " ", *[F.col(f"_w{k}") for k in range(n)]
                    ),
                ).alias("gram"),
            )
            for n in range(2, 11)
        ]
    )
    grams = (
        led.select(
            "_id", "_idx", F.explode(gram_structs).alias("_g")
        )
        .select(
            "_id",
            "_idx",
            F.col("_g.n").alias("_n"),
            F.col("_g.gram").alias("_gram"),
        )
        .filter(F.col("_gram").isNotNull())
    )
    # gram occurrence counts; char length of a gram's words excludes the
    # n-1 joining spaces
    gram_counts = grams.groupBy("_id", "_n", "_gram").agg(
        F.count("*").alias("_cnt"),
        F.collect_list("_idx").alias("_starts"),
    )
    gram_counts = gram_counts.withColumn(
        "_gram_chars",
        (F.length("_gram") - (F.col("_n") - 1)).cast("long"),
    )
    # top gram per (doc, n) for n in 2..4 — deterministic tie-break via
    # the struct ordering (count, covered chars, gram)
    top = (
        gram_counts.filter(F.col("_n") <= 4)
        .groupBy("_id", "_n")
        .agg(
            F.max(
                F.struct(
                    F.col("_cnt"),
                    (F.col("_cnt") * F.col("_gram_chars")).alias("_cov"),
                    F.col("_gram"),
                )
            ).alias("_top")
        )
        .groupBy("_id")
        .pivot("_n", [2, 3, 4])
        # a gram occurring ONCE is not repetition: without the count>=2
        # guard every short document trips the top-gram rule (a unique
        # 2-gram easily covers >20% of a 10-word doc), which is not the
        # filter's intent (Rae et al. flag REPEATED content)
        .agg(
            F.first(
                F.when(
                    F.col("_top._cnt") > 1, F.col("_top._cov")
                ).otherwise(F.lit(0))
            )
        )
        .select(
            "_id",
            *[
                F.coalesce(F.col(str(n)), F.lit(0))
                .cast("long")
                .alias(f"top_{n}gram_chars")
                for n in (2, 3, 4)
            ],
        )
    )
    # duplicated 5..10-grams: union of covered WORD POSITIONS per (doc,
    # n), then sum those words' lengths — the no-double-counting rule
    covered = (
        gram_counts.filter((F.col("_n") >= 5) & (F.col("_cnt") > 1))
        .select(
            "_id",
            "_n",
            F.explode("_starts").alias("_start"),
        )
        .select(
            "_id",
            "_n",
            F.explode(
                F.sequence(
                    F.col("_start"), F.col("_start") + F.col("_n") - 1
                )
            ).alias("_idx"),
        )
        .distinct()
        .join(w_pos, ["_id", "_idx"])
        .groupBy("_id")
        .pivot("_n", list(range(5, 11)))
        .agg(F.sum(F.length("_word")))
        .select(
            "_id",
            *[
                F.coalesce(F.col(str(n)), F.lit(0))
                .cast("long")
                .alias(f"dup_{n}gram_chars")
                for n in range(5, 11)
            ],
        )
    )
    joined = (
        base.drop("_words")
        .join(top, "_id", "left")
        .join(covered, "_id", "left")
    )
    for n in (2, 3, 4):
        joined = joined.withColumn(
            f"top_{n}gram_chars",
            F.coalesce(F.col(f"top_{n}gram_chars"), F.lit(0)).cast("long"),
        )
    for n in range(5, 11):
        joined = joined.withColumn(
            f"dup_{n}gram_chars",
            F.coalesce(F.col(f"dup_{n}gram_chars"), F.lit(0)).cast("long"),
        )
    thr = GOPHER_REPETITION_THRESHOLDS_BP
    exceed = (
        (
            F.col("n_dup_lines") * 10000
            > F.col("n_lines") * thr["dup_line_fraction"]
        )
        | (
            F.col("n_dup_paras") * 10000
            > F.col("n_paras") * thr["dup_para_fraction"]
        )
        | (
            F.col("dup_lines_chars") * 10000
            > F.col("lines_chars") * thr["dup_line_char_fraction"]
        )
        | (
            F.col("dup_paras_chars") * 10000
            > F.col("paras_chars") * thr["dup_para_char_fraction"]
        )
    )
    for n in (2, 3, 4):
        exceed = exceed | (
            F.col(f"top_{n}gram_chars") * 10000
            > F.col("word_chars") * thr[f"top_{n}gram_char_fraction"]
        )
    for n in range(5, 11):
        exceed = exceed | (
            F.col(f"dup_{n}gram_chars") * 10000
            > F.col("word_chars") * thr[f"dup_{n}gram_char_fraction"]
        )
    out = joined.withColumn("repetition_ok", ~exceed).withColumnRenamed(
        "_id", id_col
    )
    if pin_input:
        out = attach_pins(out, base)
    return out


def _row_key(key_cols: tuple[str, ...]):
    return F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])


def _stage_pin(df: DataFrame, mode: str) -> tuple[DataFrame, list[DataFrame]]:
    """Materialize a branching stage's input per ``mode``:

    - ``"disk"`` — ``persist(DISK_ONLY)``: fault-tolerant (lineage kept,
      lost blocks recompute), release via the returned pins handle.  The
      cluster-safe default.
    - ``"local_checkpoint"`` — eager ``localCheckpoint()``: additionally
      TRUNCATES lineage, which is what bounds the composed chain's PLAN
      SIZE — each branching stage references its input ~3×, so with
      lineage kept the final logical tree replicates the whole upstream
      ~3^k times and Catalyst ANALYSIS dominates wall time (measured on
      the sf0.01 curation_full twin: 55 jobs totalling 10.6 s of
      execution under 17.2 s of driver-side gaps; truncation halves the
      query).  Single-JVM / local-mode semantics: an executor loss makes
      the frame unrecoverable (the _RoundPinner "local" trade).  No
      release handle — localCheckpoint storage is reclaimed by the
      ContextCleaner once the frame is collected."""
    if mode == "local_checkpoint":
        from pyspark import StorageLevel

        # DISK_ONLY storage: the default localCheckpoint level holds
        # deserialized rows on-heap, and a bench/session running many
        # operators accumulates those blocks until the ContextCleaner
        # catches up — measured as a late-session slowdown.  Disk blocks
        # keep the lineage truncation without the heap pressure.
        return df.localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        ), []
    from pyspark import StorageLevel

    pinned = df.persist(StorageLevel.DISK_ONLY)
    return pinned, [pinned]


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backrefs, non-capturing groups
# only.  ORDER IS SIGNIFICANT — patterns are applied top to bottom and
# earlier replacements remove their spans from later patterns' view
# (16-digit cards are consumed before any shorter digit rule could bite
# a fragment; the SSN rule runs before IPv4 so a dashed triple is never
# half-eaten).  Precision choices, documented honestly:
# - CARD is grouping-shaped (4-4-4-4 with separators, or a bare 16-digit
#   run), NOT Luhn-validated — Luhn needs arithmetic, not regex; some
#   non-card 16-digit ids will redact.  13/15-digit PANs (unseparated
#   Visa-13/Amex) are NOT matched — a bare \d{13,16} eats too many
#   order/tracking numbers.
# - PHONE matches +country forms with or without separators (E.164
#   '+15551234567' included) and separated/parenthesized 3-3-4 national
#   forms; bare 10-digit runs without a '+' are left alone (they are
#   usually ids, not numbers).
# - IPV4 is shape-only (octets up to 999 match) and will redact
#   dotted-quad version strings — the standard recall-over-precision
#   trade for a pre-training scrub.
# Extend with locale-specific patterns (IBANs, national ids) at
# deployment — each entry is one codegen'd regexp_replace, so the cost
# is one scan regardless of count.  The tuple LIVES in sqltwins (with
# the other engine-parity constants) so the DuckDB oracle chain is
# generated from the same literals — re-exported here as the public name.
PII_PATTERNS = _PII_PATTERNS


def redact_pii(text_col):
    """Column: ``text_col`` with PII spans replaced by typed tokens —
    the standard pre-training scrub, pure JVM expressions (SURVEY-beyond
    ops; oracle-checked as the ``pii_redact`` twin)."""
    out = text_col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def curate_flags(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    min_chars: int = 100,
    max_chars: int = 200_000,
    min_stopword_bp: int = 100,
    langs: tuple[str, ...] = ("en",),
    benchmark_hashes=None,  # list[int] | numpy int64 array
    decontam_n: int = 13,
    decontam_seed: int = 42,
    extra_quality_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Stage 1 of curation — adds ``quality_ok``, ``contaminated`` and
    ``exact_keep`` (hierarchical: the exact-dup keeper is the first
    QUALITY, NON-CONTAMINATED row of each fingerprint; quality-failed or
    contaminated rows are never keepers).  Pure JVM unless
    ``benchmark_hashes`` is supplied, which adds the one stateless
    decontamination Arrow stage (no joins/shuffles); the only wide op
    remains ONE window over the content fingerprint.  Sink-staged
    pipelines write this frame to a table and run ``curate_near_dups``
    over the read-back, so the window is computed exactly once."""
    df = extracted.withColumn("_row_key", _row_key(key_cols))
    q = quality_flag(F.col(text_col), min_chars, max_chars,
                     min_stopword_bp, langs)
    # extra_quality_cols: boolean gate columns already ON the frame
    # (c4_keep, repetition_ok, a caller's gopher_ok) ANDed into the
    # quality gate — their drops land in dropped_quality, preserving the
    # hierarchical attribution identity; the per-row component flags
    # remain on the frame for per-stage attribution
    for c in extra_quality_cols:
        q = q & F.col(c)
    df = df.withColumn("quality_ok", F.coalesce(q, F.lit(False)))
    if benchmark_hashes is not None and len(benchmark_hashes):
        from cl_readability_spark.functions.decontam import decontaminate

        # decontam_n/decontam_seed MUST match the parameters the hash set
        # was computed with (benchmark_ngram_hashes) — a silent mismatch
        # hashes corpus grams differently and matches nothing
        df = decontaminate(
            df, text_col=text_col, hashes=benchmark_hashes,
            n=decontam_n, seed=decontam_seed,
        ).drop("n_contaminated_grams")
    else:
        df = df.withColumn("contaminated", F.lit(False))
    fingerprint = F.md5(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         "[^a-z0-9]", "")
    )
    w = Window.partitionBy(fingerprint).orderBy(
        F.col("quality_ok").desc(), F.col("contaminated"), F.col("_row_key")
    )
    return df.withColumn(
        "exact_keep",
        F.col("quality_ok")
        & ~F.col("contaminated")
        & (F.row_number().over(w) == 1),
    ).drop("_row_key")


def curate_near_dups(
    flagged: DataFrame,
    text_col: str = "extracted_text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    jaccard_threshold: float = 0.8,
    materialize: str = "disk",
    policy: str = "clusters",
    cluster_opts: dict | None = None,
    minhash_carry: str = "auto",
    carry_threshold: int = 100_000,
    minhash_banding: tuple[int, int] | None = None,
    minhash_k: int = 5,
) -> DataFrame:
    """Stage 2 of curation — adds ``near_dup_drop`` (MinHash near-dup
    prune over the quality+exact survivors) and ``kept`` to a frame that
    already carries the stage-1 flags.  ``minhash_k`` is the shingle
    width in words forwarded to ``minhash_near_dups`` (see ``curate``).

    ``minhash_banding`` optionally pins the LSH sizing as ``(n_hashes,
    bands)`` — deployment control for pipelines that trade boundary
    recall for signature time (and the bench A/B knob); default None =
    recall-sized banding from the threshold (``minhash_params``).

    ``minhash_carry`` selects the minhash exchange plan ("arrays" |
    "rehash" | "auto"; see ``minhash_near_dups``).  "auto" (default)
    counts the survivors once — an ACTION at call time, cheap against
    the materialized flagged pin but note it evaluates the upstream
    plan under ``materialize="none"`` — and picks "rehash" above
    ``carry_threshold`` docs (the measured crossover: the rehash plan's
    fixed costs lose ~1-3 s at toy scale, the arrays plan's exchange
    spills ~50 GB at 1M docs × 13 bands).

    ``policy`` selects which side of a verified near-dup relation drops:

    - ``"clusters"`` (default): connected components over the verified
      pairs (``dup_clusters``), drop everything but the minimum-key
      representative of each duplicate cluster — the standard corpus-
      dedup policy (deterministic, exactly one survivor per duplicate
      equivalence class, independent of pair enumeration order).  Costs
      the O(log n)-round label propagation over the pair set — tiny
      next to the minhash stage, since pairs ≪ corpus.  ``cluster_opts``
      forwards to ``dup_clusters`` (e.g. ``{"checkpoint_mode":
      "reliable", "checkpoint_dir": ...}`` on a real cluster).
    - ``"pairwise"``: drop the higher-key side of every verified pair
      (the round-2/3 behavior).  Cheaper by one small iterative job but
      key-order-dependent: two docs that are both near-dups of a third
      (but not of each other) BOTH survive or not depending only on key
      layout — e.g. pairs (A,C),(B,C) keep {A,B} while a cluster sees
      one duplicate class and keeps {A}.  Kept for pipelines that want
      maximal retention over canonical keep-one.

    ``materialize`` controls how ``flagged`` is pinned before the two
    plan branches reference it (module doc, "Plan shape"):
    - "disk" (default): eager persist at ``StorageLevel.DISK_ONLY`` —
      rows serialized to executor-local disk, near-zero heap.  The right
      level for this frame: it carries the full extracted text, so a
      deserialized on-heap copy of a large corpus is GBs of objects
      (measured: a 2.7 GB-text corpus OOMs an 8 GB local heap under
      MEMORY_AND_DISK unrolling, and reads back from disk in seconds).
    - "local_checkpoint": eager localCheckpoint at DISK_ONLY storage —
      additionally truncates lineage (the plan-shape proof uses this:
      the upstream stages vanish from the final DAG) with no on-heap
      block accumulation (r9: the default deserialized level measurably
      slowed later queries of long bench sessions).
    - "persist": MEMORY_AND_DISK cache (small corpora / interactive).
    - "none": lazy; only correct when ``flagged`` is already a
      materialized table (e.g. the written flags table — then the double
      branch costs two pruned columnar scans, no recomputation)."""
    if materialize not in ("disk", "local_checkpoint", "persist", "none"):
        raise ValueError(f"unknown materialize mode: {materialize!r}")
    if policy not in ("clusters", "pairwise"):
        raise ValueError(f"unknown near-dup policy: {policy!r}")
    if minhash_carry not in ("auto", "arrays", "rehash"):
        # validated BEFORE the materialization action below — a typo'd
        # carry must not cost a full corpus pass and an orphaned pin
        raise ValueError(
            f"minhash_carry must be auto/arrays/rehash, got {minhash_carry!r}"
        )
    if minhash_banding is not None and (
        minhash_banding[0] < 1
        or minhash_banding[1] < 1
        or minhash_banding[0] % minhash_banding[1]
    ):
        # surfaced here, BEFORE the materialization action below — raised
        # only at the minhash call, an invalid banding would orphan the
        # pin.  n_hashes < 1 is rejected too: (0, 1) would pass the
        # divisibility test yet degenerate to empty signatures — a
        # single-bucket LSH with an all-pairs candidate blowup (ADVICE r6)
        raise ValueError(
            f"minhash_banding needs n_hashes >= 1 ({minhash_banding[0]}) "
            f"divisible by bands >= 1 ({minhash_banding[1]})"
        )
    df = flagged.withColumn("_row_key", _row_key(key_cols))
    surv_count = None
    survivor_cond = F.col("quality_ok") & F.col("exact_keep")
    if materialize == "local_checkpoint":
        from pyspark import StorageLevel

        # DISK_ONLY storage (r9): truncation without on-heap deserialized
        # blocks — see _stage_pin
        df = df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    elif materialize in ("disk", "persist"):
        from pyspark import StorageLevel

        df = df.persist(
            StorageLevel.DISK_ONLY if materialize == "disk"
            else StorageLevel.MEMORY_AND_DISK
        )
        # one action materializes the pin; when auto-carry needs the
        # survivor count, fold it into the SAME pass instead of scanning
        # the freshly-pinned text a second time
        if minhash_carry == "auto":
            surv_count = df.agg(
                F.sum(survivor_cond.cast("long"))
            ).first()[0] or 0
        else:
            df.count()

    # near-dup pairs over the surviving candidates only (quality+exact
    # gates shrink the minhash input before its bucket shuffle)
    survivors = df.filter(survivor_cond).select(
        F.col("_row_key").alias("doc_id"), F.col(text_col).alias("text")
    )
    carry = minhash_carry
    if carry == "auto":
        # size-dependent crossover (measured, BENCH round 5): the rehash
        # plan's fixed costs (extra python pass + candidate joins) lose
        # ~1.3-2.6 s at 5k docs, while the arrays plan's bucket exchange
        # carries bands × the shingle volume — ~50 GB of spill at 1M
        # docs.  The count rides the materialization action above when
        # there is one; otherwise (checkpoint/none) it is its own scan.
        if surv_count is None:
            surv_count = survivors.count()
        carry = "rehash" if surv_count > carry_threshold else "arrays"
    banding = (
        {"n_hashes": minhash_banding[0], "bands": minhash_banding[1]}
        if minhash_banding
        else {}
    )
    pairs = minhash_near_dups(
        survivors, k=minhash_k, jaccard_threshold=jaccard_threshold,
        carry=carry, **banding
    )
    if policy == "clusters":
        clusters = dup_clusters(pairs, **(cluster_opts or {}))
        drops = (
            clusters.filter(F.col("id") != F.col("cluster_rep"))
            .select(F.col("id").alias("_row_key"))
            .withColumn("near_dup_drop", F.lit(True))
        )
    else:
        drops = (
            pairs.select(F.col("id_b").alias("_row_key"))
            .distinct()
            .withColumn("near_dup_drop", F.lit(True))
        )
    pinned = df if materialize in ("disk", "persist") else None
    # the rehash minhash plan pins its candidate frames internally —
    # forward those handles so release_curated drops them too
    mh_pins = list(getattr(pairs, "_clrs_pinned", []) or [])
    df = df.join(drops, "_row_key", "left").withColumn(
        "near_dup_drop", F.coalesce(F.col("near_dup_drop"), F.lit(False))
    )
    out = df.withColumn(
        "kept",
        F.col("quality_ok") & F.col("exact_keep") & ~F.col("near_dup_drop"),
    ).drop("_row_key")
    # the persisted frame stays registered with the session cache manager
    # until unpersisted — hand the caller the release handle (long-lived
    # sessions curating several corpora should call release_curated on the
    # EXACT frame returned here, once done with the result — see pins.py)
    return attach_pins(out, pinned, *mh_pins)


# the generic release helper (pins.py) under the curation-specific name
release_curated = release_pinned


def line_dedup_rewrite(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    pin_lines: bool = False,
    pin_mode: str = "disk",
) -> tuple[DataFrame, list[DataFrame]]:
    """The ``curate(line_dedup=True)`` pre-stage as a standalone step
    (also used by scripts/corpus_pipeline.py's decomposed sink path):
    C4 cross-document line dedup keyed by the row key, ``text_col``
    rewritten from the surviving lines, ``line_dedup_n_lines`` /
    ``line_dedup_n_kept`` audit columns added via a 1:1 skew-free join
    on the unique row key.  Returns (rewritten frame, pins) — pins
    non-empty only under ``pin_lines=True``.

    ``pin_lines=True`` materializes the KEYED INPUT frame (DISK_ONLY),
    not just line_dedup's exploded lines: this stage references the
    input in three plan branches (the line stage's winners aggregation
    and probe, plus the audit join's left side), and for a
    nondeterministic upstream every branch must read the same bytes —
    pinning only the exploded lines would leave the audit join's probe
    side re-evaluating the raw upstream (round-7 review finding)."""
    from cl_readability_spark.functions.dedup import line_dedup as _ld

    keyed = extracted.withColumn("_ld_key", _row_key(key_cols))
    pins: list[DataFrame] = []
    if pin_lines:
        keyed, pins = _stage_pin(keyed, pin_mode)
    # the line stage's own self-branch now reads the pinned frame, so
    # its internal pin_lines is unnecessary
    deduped = _ld(keyed, id_col="_ld_key", text_col=text_col)
    out = (
        keyed.drop(text_col)
        .join(
            deduped.select(
                "_ld_key",
                F.col("deduped_text").alias(text_col),
                F.col("n_lines").alias("line_dedup_n_lines"),
                F.col("n_kept_lines").alias("line_dedup_n_kept"),
            ),
            "_ld_key",
        )
        .drop("_ld_key")
    )
    return out, pins


def substring_dedup_rewrite(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    k: int = 50,
    keep: str = "none",
    pin_tokens: bool = False,
    pin_mode: str = "disk",
) -> tuple[DataFrame, list[DataFrame]]:
    """The ``curate(substring_dedup_k=)`` pre-stage as a standalone
    step: ExactSubstr duplicated-run removal (``functions.dedup.
    substring_dedup``, Lee et al. 2021) keyed by the row key,
    ``text_col`` rewritten from the surviving tokens (NOTE: the rebuild
    is whitespace-normalized — single spaces — per the operator
    contract), ``substr_dedup_n_tokens`` / ``substr_dedup_n_kept``
    audit columns added via a 1:1 skew-free join on the unique row key.
    Returns (rewritten frame, pins) — pins non-empty only under
    ``pin_tokens=True``, which materializes the KEYED INPUT frame
    (DISK_ONLY): this stage references the input in three plan branches
    (the operator's gram aggregation and probe, plus the audit join's
    left side), the same exposure `line_dedup_rewrite` pins."""
    from cl_readability_spark.functions.dedup import (
        substring_dedup as _sd,
    )

    keyed = extracted.withColumn("_sd_key", _row_key(key_cols))
    pins: list[DataFrame] = []
    if pin_tokens:
        keyed, pins = _stage_pin(keyed, pin_mode)
    deduped = _sd(keyed, id_col="_sd_key", text_col=text_col, k=k, keep=keep)
    out = (
        keyed.drop(text_col)
        .join(
            deduped.select(
                "_sd_key",
                F.col("dedup_text").alias(text_col),
                F.col("n_tokens").alias("substr_dedup_n_tokens"),
                F.col("n_kept_tokens").alias("substr_dedup_n_kept"),
            ),
            "_sd_key",
        )
        .drop("_sd_key")
    )
    return out, pins


def c4_rewrite(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    c4_opts: dict | None = None,
) -> DataFrame:
    """The ``curate(c4=True)`` stage as a standalone step: the C4
    filter battery (``c4_filters``) with ``text_col`` REWRITTEN from the
    surviving lines (NULL input → '' husk, which the quality gate
    absorbs — the line_dedup precedent), ``n_lines``/``n_kept_lines``
    renamed to ``c4_n_lines``/``c4_n_kept_lines`` (the line stage owns
    the unprefixed audit names), and the page-level ``c4_keep`` flag
    kept on the frame for ``curate_flags``' quality gate.  Pure
    whole-stage-codegen projection — no join, no shuffle, no pin needed
    (single plan branch)."""
    flagged = c4_filters(extracted, text_col=text_col, **(c4_opts or {}))
    return (
        flagged.withColumnRenamed("n_lines", "c4_n_lines")
        .withColumnRenamed("n_kept_lines", "c4_n_kept_lines")
        .withColumn(text_col, F.coalesce(F.col("c4_text"), F.lit("")))
        .drop("c4_text")
    )


def url_dedup_gate(
    extracted: DataFrame,
    url_col: str = "url",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    pin_input: bool = False,
    url_opts: dict | None = None,
    pin_mode: str = "disk",
) -> tuple[DataFrame, list[DataFrame]]:
    """The ``curate(url_col=)`` stage as a standalone step: URL-level
    dedup (``functions.urls.url_dedup``) keyed by the composite row
    key, adding ``canon_url`` (the canonical form — audit/refetch key)
    and ``url_keep`` (true on exactly one row per canonical URL; rows
    with NULL/blank URLs are all kept — a missing URL is not evidence
    of duplication).  Returns (frame, pins) — the operator references
    its input in two plan branches (the winners aggregation and the
    join probe), so a nondeterministic upstream should be sink-staged
    or pass ``pin_input=True`` (pins the input DISK_ONLY; standard
    ``pins.release_pinned`` handles).  ``url_opts`` forwards
    canonicalization kwargs (e.g. ``extra_tracking_params``).

    Winner consistency with the content stages: ``url_dedup`` picks
    the lexicographic-minimum row key per canonical URL with the SAME
    ``min(struct(key_cols...))`` ordering ``line_dedup`` uses per
    line, so when URL-duplicate rows carry identical text the URL
    winner is also the line winner for lines unique to that group —
    composing ``url_col=`` with ``line_dedup=True`` never line-empties
    the URL winner in favor of a doomed loser."""
    from cl_readability_spark.functions.urls import url_dedup

    pins: list[DataFrame] = []
    if pin_input:
        extracted, pins = _stage_pin(extracted, pin_mode)
    out = url_dedup(
        extracted,
        url_col=url_col,
        id_col=None,
        id_cols=key_cols,
        keep_col="url_keep",
        **(url_opts or {}),
    )
    return out, pins


def gopher_repetition_gate(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    pin_input: bool = False,
    pin_mode: str = "disk",
) -> tuple[DataFrame, list[DataFrame]]:
    """The ``curate(gopher_repetition=True)`` stage as a standalone
    step: the Gopher repetition battery (``gopher_repetition_flags``)
    keyed by the row key, joining ONLY ``repetition_ok`` back 1:1 on
    the unique row key (skew-free by construction; callers wanting the
    13 fraction columns run the flags operator directly).  Returns
    (frame, pins) — the same three-branch self-reference exposure as
    ``line_dedup_rewrite`` (the battery's gram aggregation + probe,
    plus this join's left side), so a nondeterministic upstream should
    be sink-staged or pass ``pin_input=True`` (pins the KEYED input
    DISK_ONLY; standard ``pins.release_pinned`` handles)."""
    keyed = extracted.withColumn("_gr_key", _row_key(key_cols))
    pins: list[DataFrame] = []
    if pin_input:
        keyed, pins = _stage_pin(keyed, pin_mode)
    rep = gopher_repetition_flags(keyed, id_col="_gr_key", text_col=text_col)
    out = keyed.join(
        rep.select("_gr_key", "repetition_ok"), "_gr_key"
    ).drop("_gr_key")
    return out, pins


def curate(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    jaccard_threshold: float = 0.8,
    min_chars: int = 100,
    max_chars: int = 200_000,
    min_stopword_bp: int = 100,
    langs: tuple[str, ...] = ("en",),
    materialize: str = "disk",
    policy: str = "clusters",
    cluster_opts: dict | None = None,
    benchmark_hashes=None,  # list[int] | numpy int64 array
    decontam_n: int = 13,
    decontam_seed: int = 42,
    minhash_carry: str = "auto",
    carry_threshold: int = 100_000,
    minhash_banding: tuple[int, int] | None = None,
    line_dedup: bool = False,
    line_dedup_pin: bool = False,
    substring_dedup_k: int | None = None,
    substring_dedup_keep: str = "none",
    substring_dedup_pin: bool = False,
    c4: bool = False,
    c4_opts: dict | None = None,
    gopher_repetition: bool = False,
    gopher_repetition_pin: bool = False,
    minhash_k: int = 5,
    pin_stages: bool | str = "auto",
    stage_pin_mode: str = "disk",
    url_col: str | None = None,
    url_pin: bool = False,
    url_opts: dict | None = None,
) -> DataFrame:
    """Adds the curation flags to ``extracted`` (see module doc); filter on
    ``kept`` for the final corpus, aggregate the flags for the report.
    Composition of [``line_dedup`` →] ``curate_flags`` →
    ``curate_near_dups``; see ``curate_near_dups`` for the
    ``materialize`` modes (the pin covers the whole extract+flags
    subtree here), the near-dup drop ``policy``, and ``minhash_banding``
    (optional pinned LSH sizing); ``benchmark_hashes``
    (``decontam.benchmark_ngram_hashes``) enables the decontamination
    gate — pass the SAME ``decontam_n``/``decontam_seed`` the hash set
    was computed with.

    ``line_dedup=True`` runs C4-style cross-document line dedup
    (Raffel et al. 2020 §2.2; ``functions.dedup.line_dedup``) as a
    PRE-stage — the C4 ordering: line-level dedup first, then the
    doc-level gates — rewriting ``text_col`` from the deduped lines and
    adding ``line_dedup_n_lines`` / ``line_dedup_n_kept`` audit columns.
    The division of labor is deliberate and pinned in
    tests/test_curation.py: line dedup subsumes exact doc-dedup (a
    whole-doc duplicate's every line duplicates the first copy, so the
    copy dedups to an empty husk) and the husks then fall to the
    QUALITY gate — ``dropped_quality`` absorbs what ``dropped_exact_dup``
    would have counted.  The line stage evaluates the upstream plan more
    than once before the ``materialize`` pin (its winners aggregation is
    a self-branch, plus the 1:1 audit join back): free over a
    sink-staged/scan input — the recommended composition, as in
    scripts/corpus_pipeline.py — while a NONDETERMINISTIC upstream
    should either be sink-staged first or set ``line_dedup_pin=True``,
    which materializes the keyed INPUT frame DISK_ONLY so all three
    line-stage branches read the same bytes (the handle is attached to
    the returned frame alongside the curation pins — ``release_curated``
    drops them all).

    ``substring_dedup_k`` (an int, e.g. 50) additionally runs
    ExactSubstr duplicated-run removal (Lee et al. 2021;
    ``functions.dedup.substring_dedup``) after the line stage and
    before the doc-level gates, rewriting ``text_col`` from the
    surviving tokens (whitespace-normalized rebuild — the operator
    contract) and adding ``substr_dedup_n_tokens`` /
    ``substr_dedup_n_kept`` audit columns.  Under the paper-faithful
    default ``substring_dedup_keep="none"`` an exact whole-document
    duplicate of >= k tokens empties EVERY copy (the first included —
    the paper's anti-memorization stance), so the husks fall to the
    QUALITY gate like the line-stage note above; pass
    ``substring_dedup_keep="first"`` for keep-one curation.  Same
    self-branch caveat as the line stage: sink-stage a
    nondeterministic upstream or set ``substring_dedup_pin=True``.

    ``c4=True`` runs the C4 FILTER battery (Raffel et al. 2020 §2.2;
    ``c4_rewrite``) after the line stage and BEFORE the substring stage
    (both line-granularity passes run before the token-granularity one,
    whose rebuild collapses newlines): line filters rewrite
    ``text_col`` from the surviving lines (audit columns
    ``c4_n_lines``/``c4_n_kept_lines`` + the per-reason drop counts),
    and the page-level ``c4_keep`` ANDs into the quality gate — its
    drops land in ``dropped_quality`` (hierarchical attribution
    preserved), with the per-row ``c4_keep``/``has_*`` flags kept for
    per-stage attribution.  ``c4_opts`` forwards to ``c4_filters``
    (min_words_per_line, min_sentences, badwords).

    ``gopher_repetition=True`` runs the Gopher repetition battery (Rae
    et al. 2021 Table A1; ``gopher_repetition_gate``) on the text as it
    stands AFTER the rewrite stages — gates judge what would actually
    ship — joining ``repetition_ok`` 1:1 on the row key and ANDing it
    into the quality gate the same way.  Same nondeterministic-upstream
    caveat (``gopher_repetition_pin=True`` pins the keyed input).

    ``url_col`` (a column name, e.g. ``"url"``) runs URL-level dedup
    (``url_dedup_gate``; ``functions.urls.url_dedup``) as the FIRST
    stage — the deployment order: a crawl sees the same page under
    tracking-param/case/slash variants, and collapsing those is far
    cheaper than letting the content stages rediscover them.  Adds
    ``canon_url`` + ``url_keep``; ``url_keep`` ANDs into the quality
    gate (the ``c4_keep`` pattern), so URL-dup losers land in
    ``dropped_quality`` with the per-row flag kept for attribution.
    Rows with NULL/blank URLs are all kept by the gate (a missing URL
    is not evidence of duplication).  Winner selection uses the same
    lexicographic ``min(struct(key_cols...))`` ordering as
    ``line_dedup``, so composing both never line-empties a URL winner
    in favor of its doomed loser (see ``url_dedup_gate``).  Same
    nondeterministic-upstream caveat: ``url_pin=True`` pins the input.
    ``url_opts`` forwards canonicalization kwargs.

    With everything on, the stage order is: url_dedup → line_dedup →
    c4 → substring_dedup → gopher_repetition → quality/decontam/exact
    flags → minhash near-dups — the deployment config, hash-checked
    end to end by the ``curation_full_planted`` driver oracle (URL
    stage covered by the LOCAL ``curation_url_planted`` twin).

    ``minhash_k`` sets the near-dup shingle width in words (default 5,
    the standard 5-word shingles; 1 = word-set Jaccard, for corpora
    where duplicates vary token ORDER — template-permuted boilerplate —
    which contiguous shingles undercount).

    ``pin_stages`` governs the MID-CHAIN input pins when several
    branching rewrite stages compose in one call.  Each branching stage
    (line_dedup, substring_dedup, gopher_repetition) evaluates its
    input in ~3 plan branches; when that input is itself the OUTPUT of
    an earlier branching stage (joins, not a scan), every branch
    re-runs the whole upstream chain — at deployment scale that is a
    repeated multi-shuffle pass, not a repeated parquet read.  The
    default ``"auto"`` therefore pins (DISK_ONLY) a branching stage's
    input iff an earlier branching rewrite stage already ran in this
    call; ``True`` pins every branching stage's input (including the
    first — for nondeterministic caller frames); ``False`` pins only
    where the per-stage ``*_pin`` flag asks.  Per-stage flags always
    force a pin regardless of ``pin_stages``.  Value-neutral (pins
    change execution, never results); all pins ride the returned
    frame's registry handles (``release_curated``).

    ``stage_pin_mode`` selects HOW a firing stage pin materializes
    (``_stage_pin``): ``"disk"`` (default — fault-tolerant persist,
    released via the handles) or ``"local_checkpoint"`` (eager
    localCheckpoint, additionally TRUNCATING lineage so the composed
    chain's plan size stays linear in stage count instead of ~3^k —
    the single-JVM / bench shape; see ``_stage_pin`` for the measured
    rationale and the fault-tolerance trade)."""

    if stage_pin_mode not in ("disk", "local_checkpoint"):
        raise ValueError(
            f"stage_pin_mode must be disk|local_checkpoint, got "
            f"{stage_pin_mode!r}"
        )

    def _pin(explicit: bool, derived: bool) -> bool:
        if explicit or pin_stages is True:
            return True
        return pin_stages == "auto" and derived

    # has a BRANCHING rewrite stage already run in this call? (c4 is a
    # single-branch projection — cheap to re-evaluate over a scan, and
    # any earlier branching stage below it already got pinned)
    derived = False
    ld_pins: list[DataFrame] = []
    extra_gates: list[str] = []
    if url_col is not None:
        extracted, url_pins = url_dedup_gate(
            extracted, url_col, key_cols,
            pin_input=_pin(url_pin, derived),
            url_opts=url_opts,
            pin_mode=stage_pin_mode,
        )
        ld_pins.extend(url_pins)
        extra_gates.append("url_keep")
        derived = True
    if line_dedup:
        extracted, ld_pins = line_dedup_rewrite(
            extracted, text_col, key_cols,
            pin_lines=_pin(line_dedup_pin, derived),
            pin_mode=stage_pin_mode,
        )
        derived = True
    if c4:
        # BETWEEN the line stage and the substring stage on purpose: the
        # C4 line filters are line-granularity (like the line-dedup
        # stage they complement in Raffel et al. 2020 §2.2), while
        # substring_dedup's rebuild is whitespace-NORMALIZED
        # (token-granularity, newlines collapse) — running c4 after it
        # would see every document as one line.  ExactSubstr (Lee et
        # al. 2021) runs on the already-line-cleaned corpus, the
        # paper's own staging.
        extracted = c4_rewrite(extracted, text_col, c4_opts)
        extra_gates.append("c4_keep")
    if substring_dedup_k is not None:
        extracted, sd_pins = substring_dedup_rewrite(
            extracted,
            text_col,
            key_cols,
            k=substring_dedup_k,
            keep=substring_dedup_keep,
            pin_tokens=_pin(substring_dedup_pin, derived),
            pin_mode=stage_pin_mode,
        )
        ld_pins.extend(sd_pins)
        derived = True
    if gopher_repetition:
        extracted, gr_pins = gopher_repetition_gate(
            extracted, text_col, key_cols,
            pin_input=_pin(gopher_repetition_pin, derived),
            pin_mode=stage_pin_mode,
        )
        ld_pins.extend(gr_pins)
        extra_gates.append("repetition_ok")
    flagged = curate_flags(
        extracted, text_col, key_cols, min_chars, max_chars,
        min_stopword_bp, langs, benchmark_hashes, decontam_n, decontam_seed,
        extra_quality_cols=tuple(extra_gates),
    )
    out = curate_near_dups(
        flagged, text_col, key_cols, jaccard_threshold, materialize,
        policy, cluster_opts, minhash_carry, carry_threshold,
        minhash_banding, minhash_k,
    )
    if ld_pins:
        out = attach_pins(out, *ld_pins)
    return out


def curation_report(curated: DataFrame) -> DataFrame:
    """One-row audit: total rows, per-gate drop counts, final kept count.
    The gates are attributed hierarchically (module doc), so
    rows_in == dropped_quality + dropped_contaminated + dropped_exact_dup
    + dropped_near_dup + rows_kept — the drop columns partition the input
    exactly."""
    return curated.agg(
        F.count("*").alias("rows_in"),
        F.sum((~F.col("quality_ok")).cast("long")).alias("dropped_quality"),
        F.sum(
            (F.col("quality_ok") & F.col("contaminated")).cast("long")
        ).alias("dropped_contaminated"),
        F.sum(
            (
                F.col("quality_ok")
                & ~F.col("contaminated")
                & ~F.col("exact_keep")
            ).cast("long")
        ).alias("dropped_exact_dup"),
        F.sum(F.col("near_dup_drop").cast("long")).alias("dropped_near_dup"),
        F.sum(F.col("kept").cast("long")).alias("rows_kept"),
    )


def source_mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic per-source mixture sampling — the "mixture weights"
    stage of multi-source training corpora (The Pile, Gao et al. 2020
    §1, assembles sources at per-source epoch counts like Wikipedia×3;
    DoReMi, Xie et al. 2023, reweights domains the same way): each
    source gets a weight ``w >= 0``, and every row is emitted
    ``floor(w)`` times plus one more with probability ``frac(w)`` — so
    ``w = 0.25`` downsamples to a quarter, ``w = 2.5`` yields 2-3 copies
    per row (expected row mass is exactly ``w`` per source), ``w = 0``
    drops the source, and integral weights replicate exactly.  Sources
    absent from ``weights`` get ``default_weight``.

    Sampling is a pure HASH function of (seed, ``key_col``) — no RNG
    state, no ``F.rand()``: re-running the job, changing partitioning,
    or resuming after a crash selects the SAME rows (the repo-wide
    determinism contract; `split_assign`'s md5 recipe extended from one
    hex nibble to a 32-bit uniform).  The fractional draw u is
    ``int(md5(seed \\x1f key)[:8 hex]) / 2^32``; changing ``seed``
    redraws independently.  ``key_col`` values should be unique per row
    (pipeline row keys are) — duplicate keys draw identically.

    Adds ``mix_weight`` (the resolved per-row weight) and ``epoch``
    (0-based copy index, so downstream shuffles/packing can treat
    replicas as distinct rows); all input columns pass through.

    Scale shape: one whole-stage-codegen projection (md5 + literal-map
    lookup) and a Generate for the replication — NO shuffle, no python,
    no skew surface at any corpus size.  Upsampled mass is created
    row-local, so a 10x source never concentrates anywhere.

    Reference scope note: cl-readability ends at extraction; semantics
    follow the public mixture-weight recipes cited above.
    """
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for source {s!r} must be >= 0, got {w}")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit(str(seed)),
                        F.col(key_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    if weights:
        wmap = F.create_map(
            *[
                F.lit(v)
                for key in sorted(weights)
                for v in (key, float(weights[key]))
            ]
        )
        w = F.coalesce(
            F.element_at(wmap, F.col(source_col).cast("string")),
            F.lit(float(default_weight)),
        )
    else:
        w = F.lit(float(default_weight))
    epochs = (
        F.floor(w).cast("int")
        + F.when(u < w - F.floor(w), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        df.withColumn("mix_weight", w.cast("double"))
        .withColumn("_epochs", epochs)
        .filter(F.col("_epochs") >= 1)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_epochs") - 1))
        )
        .drop("_epochs")
    )
