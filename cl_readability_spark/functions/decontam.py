"""Benchmark decontamination — flag corpus documents sharing a word
n-gram with an evaluation/benchmark set (the standard training-data
hygiene stage: a document containing a verbatim benchmark passage leaks
the eval into training).

Spark-first shape: benchmark suites are SMALL by definition (10^4–10^6
passages), so their distinct n-gram hash set is computed once
distributed, collected, and BROADCAST — corpus flagging is then one
stateless Arrow stage over the corpus with zero joins and zero
shuffles: the plan at 100 TB is scan → mapInPandas → (whatever the
caller does next), embarrassingly parallel.  The n-gram hashing is the
same keyed blake2b-64 family as the dedup stack
(``dedup._shingle_hashes``), so a benchmark gram and a corpus gram can
never disagree on tokenization or hashing.

The membership test is exact on hashes (64-bit; chance collision
~5e-20 per gram pair) — this is deliberately NOT a bloom filter: at
benchmark scale the exact set costs a few MB of broadcast, and a
false-positive-free flag lets the ``contaminated`` column double as a
hard filter.  Default n=13 follows the common LLM decontamination
practice (GPT-3 appendix C / The Pile): long enough that natural reuse
of an n-gram is negligible, short enough to catch partial quotes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cl_readability_spark.functions.dedup import _shingle_hashes


def benchmark_ngram_hashes(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 13,
    seed: int = 42,
) -> list[int]:
    """The distinct n-gram hash set of the benchmark frame, computed
    distributed (one Arrow stage + one distinct) and returned as python
    ints for broadcasting.  Documents shorter than ``n`` words
    contribute their whole word run as one gram (the dedup fallback),
    i.e. a short benchmark passage is matched only verbatim."""
    import pandas as pd

    key = str(seed).encode()

    def _grams(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if not (text or "").strip():
                    # a null/blank benchmark row must contribute NOTHING:
                    # the shared shingler's empty-run fallback gram would
                    # otherwise flag every empty corpus doc as a leak
                    continue
                # signed view: the blake2b hashes are uint64, stored as
                # Spark longs (the flag stage wraps identically)
                out.extend(
                    int(h) for h in set(_shingle_hashes(text, n, key).astype("int64"))
                )
            yield pd.DataFrame({"gram": pd.Series(out, dtype="int64")})

    rows = (
        benchmark.select(text_col)
        .mapInPandas(_grams, "gram long")
        .distinct()
        .collect()
    )
    return [r.gram for r in rows]


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    n: int = 13,
    seed: int = 42,
    hashes: list[int] | None = None,
) -> DataFrame:
    """Adds ``contaminated`` (bool) and ``n_contaminated_grams`` (int) to
    ``corpus``: whether the document shares any word n-gram with the
    benchmark set.  Pass either ``benchmark`` (hash set computed here) or
    a precomputed ``hashes`` list (e.g. cached across corpora — the
    benchmark set rarely changes).  Filter ``~contaminated`` for the
    clean corpus; keep the flag for audit reports.

    Plan: one broadcast (the hash set) + one stateless mapInPandas over
    the corpus — no join, no shuffle, no driver-side corpus state."""
    if hashes is None:
        if benchmark is None:
            raise ValueError("pass either benchmark or hashes")
        hashes = benchmark_ngram_hashes(benchmark, text_col, n, seed)
    bc = corpus.sparkSession.sparkContext.broadcast(frozenset(hashes))
    key = str(seed).encode()
    cols = corpus.columns
    # StructType.add mutates in place — never call it on the DataFrame's
    # cached schema object (it would corrupt corpus.columns for later use)
    from pyspark.sql.types import StructType

    out_schema = (
        StructType(list(corpus.schema.fields))
        .add("contaminated", "boolean", False)
        .add("n_contaminated_grams", "integer", False)
    )

    def _flag(batches):
        bench = bc.value
        for pdf in batches:
            flags, hits = [], []
            for text in pdf[text_col]:
                if not (text or "").strip():
                    flags.append(False)  # empty docs cannot leak anything
                    hits.append(0)
                    continue
                grams = set(
                    int(h) for h in _shingle_hashes(text, n, key).astype("int64")
                )
                inter = len(grams & bench)
                flags.append(inter > 0)
                hits.append(inter)
            pdf = pdf.copy()
            pdf["contaminated"] = flags
            pdf["n_contaminated_grams"] = hits
            yield pdf

    return corpus.select(*cols).mapInPandas(_flag, out_schema)
