"""TF-IDF salient-term extraction — per-document top-k keywords over
the corpus vocabulary.  The standard corpus-analysis tool for search
indexing, topic labelling, and quality triage (a document whose top
terms are all boilerplate tokens is boilerplate).

Formula (documented exactly; the DuckDB twin re-derives it):

    tf(d, w)  = occurrences of w in d   (the repo's whitespace tokens,
                lower-cased — the DSIR/lm convention)
    idf(w)    = ln((1 + N) / (1 + df(w))) + 1   (the smoothed sklearn
                form: never zero, never divides by zero)
    tfidf     = tf · idf, rounded is NOT applied here (callers round
                for hashing; floats carried at full precision)

Reference parity note: the reference (atlas-engineer/cl-readability)
scores single documents (candidate scoring, link density); corpus-wide
term statistics are part of the training-data-pipeline extension the
build brief asks for.

Scale shape:

- (doc, word) term frequencies: explode → ONE hash agg keyed by
  (doc_id, word) — the doc id in the key means a stopword is never a
  hot group key here;
- document frequencies: ONE agg over the distinct (doc, word) pairs
  keyed by word — a stopword's N rows collapse map-side
  (partial_count) to one slim row per partition before the exchange;
- idf attachment: broadcast the (word, df) table under
  ``broadcast_limit`` distinct words, else a shuffle join (AQE skew
  join absorbs hot hash buckets) — the ``decontaminate`` auto-select
  stance;
- top-k per document: ``row_number`` over a window keyed by doc_id —
  a whale document is one task's work, never a plan-wide skew.

At 100 TB the df table is the thing to watch: vocabulary grows with
corpus size (typos, ids).  ``min_df`` prunes the table (a word seen
once can only be its own document's keyword; with ``min_df > 1`` such
words are DROPPED from scoring — documented, the usual practice), and
the auto-select falls back to the shuffle join when the table outgrows
the broadcast budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_WS = "[ \t\n\f\r]"

DEFAULT_BROADCAST_WORDS = 5_000_000


def _words(text_col):
    t = F.regexp_replace(
        F.lower(F.coalesce(text_col, F.lit(""))), f"^{_WS}+|{_WS}+$", ""
    )
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, f"{_WS}+")
    )


def doc_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """``(word, df)`` over ``docs`` — df counts DOCUMENTS containing
    the word (not occurrences).  One distinct-pair agg + one word-keyed
    agg, both map-side combinable."""
    # array_distinct makes each doc contribute each word ONCE; the agg
    # below then counts documents, not occurrences
    pairs = docs.select(
        F.explode(F.array_distinct(_words(F.col(text_col)))).alias("word")
    )
    out = pairs.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        out = out.filter(F.col("df") >= int(min_df))
    return out


def tfidf_topk(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    strategy: str = "auto",
    broadcast_limit: int = DEFAULT_BROADCAST_WORDS,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf: ``(id_col, word, tf, df,
    tfidf, term_rank)``, rank 1 = most salient, ties broken by word
    asc (deterministic).  ``n_docs`` overrides the corpus size N (pass
    it when scoring a SAMPLE against full-corpus statistics); by
    default N is computed with one count.  ``strategy``: ``broadcast``
    / ``join`` / ``auto`` (broadcast while the pruned vocabulary is
    under ``broadcast_limit`` rows)."""
    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_docs is None:
        n_docs = docs.count()

    tf = (
        docs.select(
            F.col(id_col),
            F.explode(_words(F.col(text_col))).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = doc_frequencies(
        docs, text_col=text_col, id_col=id_col, min_df=min_df
    )
    pinned = None
    if strategy == "auto":
        # pin between the sizing count and the join so the df agg runs
        # once; carried on the result via the pin registry (release
        # with functions.pins.release_pinned when done)
        df_tbl = pinned = df_tbl.persist()
        strategy = (
            "broadcast" if df_tbl.count() <= broadcast_limit else "join"
        )
    joined = tf.join(
        F.broadcast(df_tbl) if strategy == "broadcast" else df_tbl,
        "word",
        "inner",  # min_df-pruned words drop out of scoring (documented)
    )
    idf = F.log((F.lit(1.0 + n_docs)) / (F.lit(1.0) + F.col("df"))) + F.lit(
        1.0
    )
    scored = joined.withColumn("tfidf", F.col("tf") * idf)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    out = (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= int(k))
        .select(id_col, "word", "tf", "df", "tfidf", "term_rank")
    )
    if pinned is not None:
        from cl_readability_spark.functions.pins import attach_pins

        out = attach_pins(out, pinned)
    return out
