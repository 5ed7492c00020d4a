"""Byte-pair-encoding tokenizer: a REAL distributed BPE trainer and
encoder (Sennrich et al. 2016, arXiv:1508.07909 — the GPT-2/LLaMA
tokenizer family), narrowing the repo's "tokenizer is a heuristic"
gap: ``token_count``'s regex stays the cheap triage counter, this
module learns an actual subword vocabulary from the corpus.

Spark-first shape (the lm_fit vocabulary stance): BPE training needs
only the WORD-TYPE frequency table, never the running corpus — so the
distributed part is ONE map-side-combinable word-count aggregation with
a ``TakeOrderedAndProject`` top-V cut (bounded by construction, never a
global sort), and the merge loop itself runs driver-side over the
collected V-row type table (the bounded-collect stance of
``ivf_train``'s sample / ``decontam``'s benchmark array: V = 2^15-2^17
word types ≈ a few MB, NOT corpus-sized).  Encoding is a stateless
Arrow stage — zero joins, zero shuffles over the corpus, with an
in-batch word cache (web text repeats words heavily).

Determinism is pinned end to end: word splitting uses the explicit
whitespace class (java/RE2/python parity), the merge tie-break is
(count DESC, pair lexicographic ASC) — no dict-order dependence — and
the fit is invariant to corpus partitioning (tested).  The trainer
uses the incremental pair-statistics algorithm (index pairs → affected
word types only per merge, the reference subword-nmt optimization); a
naive recount implementation ships alongside as the differential
oracle and the two must produce the IDENTICAL merge sequence.

Marker convention: GPT-2 style end-of-word marker ``</w>`` appended to
each word's final symbol, so "low" as a whole word and "low" as a
prefix of "lower" learn separate merges; decoding strips it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

#: explicit whitespace class — the gopher_flags/textnorm parity stance
_WS = "[ \t\n\f\r]"
EOW = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    max_types: int = 65_536,
) -> DataFrame:
    """Top-``max_types`` word types by frequency: the ONLY corpus pass
    BPE training needs.  Map-side-combinable aggregation + TakeOrdered
    (never a global sort); ties broken by word ASC for determinism."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        t = F.lower(t)
    words = F.split(F.regexp_replace(t, f"^{_WS}+|{_WS}+$", ""), f"{_WS}+")
    exploded = df.select(F.explode(words).alias("word")).filter(
        F.col("word") != ""
    )
    counts = exploded.groupBy("word").agg(F.count("*").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(int(max_types))


def _merge_loop_naive(types: dict[tuple, int], n_merges: int) -> list[tuple]:
    """Reference trainer: full pair recount every round.  O(merges x
    types) — the differential oracle for the incremental trainer."""
    merges: list[tuple] = []
    syms = {w: list(w) for w in types}
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for w, cnt in types.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w in types:
            s = syms[w]
            i, out = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def _merge_loop(types: dict[tuple, int], n_merges: int) -> list[tuple]:
    """Incremental trainer (the subword-nmt optimization): maintain
    pair -> count and pair -> {word types containing it}; each merge
    touches only the affected types.  Tie-break identical to the naive
    oracle: (count DESC, pair ASC)."""
    syms = {w: list(w) for w in types}
    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}

    def add_word(w, sign):
        cnt = types[w] * sign
        s = syms[w]
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            if sign > 0:
                pair_words.setdefault(p, set()).add(w)

    for w in types:
        add_word(w, +1)
    merges: list[tuple] = []
    for _ in range(n_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        affected = list(pair_words.get(best, ()))
        for w in affected:
            # retract the word's old pairs, apply the merge, re-add
            cnt = types[w]
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] -= cnt
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(w)
            i, out = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
            for a, b in zip(out, out[1:]):
                p = (a, b)
                pair_counts[p] = pair_counts.get(p, 0) + cnt
                pair_words.setdefault(p, set()).add(w)
    return merges


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    lowercase: bool = True,
    max_types: int = 65_536,
) -> list[tuple]:
    """Train a BPE merge table on ``df``: one distributed word-count
    pass (``word_counts``), then the driver-side incremental merge loop
    over the bounded type table.  Returns the ordered merge list
    ``[(left_symbol, right_symbol), ...]`` (rank = position).  Word
    types enter the loop as character tuples with the ``</w>`` marker
    fused onto the final character."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if max_types < 1:
        raise ValueError("max_types must be >= 1")
    rows = word_counts(
        df, text_col=text_col, lowercase=lowercase, max_types=max_types
    ).collect()
    types: dict[tuple, int] = {}
    for r in rows:
        chars = list(r["word"])
        chars[-1] = chars[-1] + EOW
        types[tuple(chars)] = r["n"]
    if not types:
        raise ValueError("corpus has no words to fit on")
    return _merge_loop(types, int(n_merges))


def _encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """GPT-2 bpe(): repeatedly apply the LOWEST-rank applicable merge."""
    s = list(word)
    if not s:
        return []
    s[-1] = s[-1] + EOW
    while len(s) > 1:
        best_rank, best_i = None, None
        for i, p in enumerate(zip(s, s[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Adds ``out_col``: the BPE token array for ``text_col`` (NULL
    stays NULL).  One stateless Arrow stage with the merge-rank dict in
    the closure (n_merges entries ≈ a few MB) and an in-batch word
    cache — zero joins/shuffles over the corpus."""
    import re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ws_re = re.compile(f"{_WS}+")

    @F.pandas_udf(ArrayType(StringType()))
    def enc(series: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for text in series:
            if text is None:
                out.append(None)
                continue
            if lowercase:
                text = text.lower()
            toks: list[str] = []
            for w in ws_re.split(text.strip(" \t\n\f\r")):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of the encoder's word handling: fuse tokens, split words
    at the ``</w>`` markers, join with single spaces (the whitespace
    normalization BPE tokenization implies).

    KNOWN LIMITATION (shared with the GPT-2-style end-of-word-marker
    convention this follows): source text literally containing the
    marker string ``</w>`` (markup-ish corpora) does NOT round-trip —
    the blanket replace treats the literal occurrence as a word
    boundary, fusing the marker onto the preceding word's last
    character.  The encoder appends the marker unescaped (Sennrich et
    al. 2016's released subword-nmt has the same collision), so
    callers tokenizing raw markup should strip or escape literal
    ``</w>`` upstream (the extraction pipeline's output never contains
    it — tags are consumed by the DOM parse)."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")
