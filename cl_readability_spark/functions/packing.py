"""Sequence packing — group documents into fixed-token-budget packs (the
training-shard prep stage: a pack becomes one training sequence /
example file, so packs must respect the model's context budget and waste
as little of it as possible).

Spark-first shape: packing is greedy BEST-FIT-DECREASING *per partition*
— a global optimum would serialize the corpus through one process, while
per-partition BFD parallelizes embarrassingly and keeps the classic
fit-decreasing guarantees within each partition (every pack except at
most one is more than half full, given no oversized docs; same 11/9·OPT
asymptotic bound as FFD).  The open packs are indexed by remaining
capacity in a bisect-sorted list, so placing a doc is O(log packs) to
find + one memmove — not the naive O(packs) scan per doc, which is
quadratic on large partitions.  Pack ids are ``<partition>-<seq>``,
deterministic for a given input: rows are hash-repartitioned on the id
and sorted (tokens desc, id) inside each partition before packing, and
capacity ties break on pack seq, so the assignment is reproducible
across runs and cluster sizes with the same ``num_partitions``.

Documents longer than the budget cannot be packed; they are emitted as
single-doc packs flagged ``oversize`` (the caller decides: chunk them
upstream or drop them), so the invariant "every non-oversize pack's
token sum ≤ max_tokens" holds unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, pack_id, pack_tokens, oversize) — every input row
    assigned to exactly one pack; per-pack token sums ≤ ``max_tokens``
    except single-doc ``oversize`` packs.  NULL token counts are packed
    as 0 (a data error upstream must not fail the stage).  One shuffle
    (the repartition), then a stateless per-partition Arrow stage;
    per-doc placement is O(log open-packs) via the capacity index."""
    import pandas as pd

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not num_partitions:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    src = (
        df.select(id_col, token_col)
        .repartition(num_partitions, F.col(id_col))
        .sortWithinPartitions(F.col(token_col).desc(), F.col(id_col))
    )
    out_schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
        f"{token_col} long, pack_id string, pack_tokens long, "
        f"oversize boolean"
    )

    def _pack(batches):
        # one partition = one packing problem; batches iterate its rows
        # in the sorted (tokens desc, id) order
        import bisect

        import pyspark

        part = pyspark.TaskContext.get().partitionId()
        caps: list[tuple[int, int]] = []  # sorted (remaining, seq)
        bins: dict[int, list] = {}        # seq -> [remaining, seq, tokens]
        seq = 0
        rows_ids, rows_tok, rows_bin = [], [], []
        oversize_rows = []
        for pdf in batches:
            for doc_id, tok in zip(pdf[id_col], pdf[token_col]):
                # a NULL/NaN token count is a data error upstream; pack it
                # as 0 rather than failing the whole stage on one row
                tok = 0 if tok is None or tok != tok else int(tok)
                if tok > max_tokens:
                    oversize_rows.append((doc_id, tok, seq))
                    seq += 1
                    continue
                # best fit: the open pack with the SMALLEST remaining
                # capacity that still holds the doc (ties -> lowest seq)
                pos = bisect.bisect_left(caps, (tok, -1))
                if pos == len(caps):
                    placed = [max_tokens, seq, 0]
                    bins[seq] = placed
                    seq += 1
                else:
                    placed = bins[caps.pop(pos)[1]]
                placed[0] -= tok
                placed[2] += tok
                bisect.insort(caps, (placed[0], placed[1]))
                rows_ids.append(doc_id)
                rows_tok.append(tok)
                rows_bin.append(placed)
        ids, toks, pids, ptoks, over = [], [], [], [], []
        for doc_id, tok, b in zip(rows_ids, rows_tok, rows_bin):
            ids.append(doc_id)
            toks.append(tok)
            pids.append(f"{part}-{b[1]}")
            ptoks.append(b[2])
            over.append(False)
        for doc_id, tok, s in oversize_rows:
            ids.append(doc_id)
            toks.append(tok)
            pids.append(f"{part}-{s}")
            ptoks.append(tok)
            over.append(True)
        yield pd.DataFrame(
            {
                id_col: ids,
                token_col: toks,
                "pack_id": pids,
                "pack_tokens": ptoks,
                "oversize": over,
            }
        )

    return src.mapInPandas(_pack, out_schema)


# Engine-exact tokenizer for chunking: the token_count BPE-ish regex
# with the whitespace class written out EXPLICITLY ([ \t\n\f\r]) so
# Java regex and DuckDB/RE2 agree byte-for-byte (their \s differ on
# vertical tab U+000B — the gopher_flags ADVICE caveat; \w is
# [0-9A-Za-z_] in both engines).
CHUNK_TOKEN_PATTERN = r"\w+|[^\w \t\n\f\r]"


def doc_chunks(
    docs: DataFrame,
    max_tokens: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split long documents into overlapping
    token windows (the stage the ``pack_sequences`` docstring defers to
    — "chunk them upstream" — and the standard long-document prep for a
    fixed-context model: window k covers tokens
    ``[k*stride, k*stride + max_tokens)``).

    Tokens are the repo's BPE-ish ``token_count`` convention
    (``\\w+`` runs or single non-word non-space chars, whitespace class
    written out for Java/RE2 parity); ``chunk_text`` is the window's
    tokens re-joined with single spaces (the detokenized-with-spaces
    form — original inter-token whitespace is not reconstructable from
    token windows; callers needing exact bytes slice the original text
    by other means).  ``stride`` defaults to ``max_tokens`` (disjoint
    windows); ``stride < max_tokens`` overlaps adjacent windows by
    ``max_tokens - stride`` tokens.

    Window count per doc: 0 if the doc has no tokens, else
    ``1 + ceil(max(n - max_tokens, 0) / stride)`` — every token is
    covered, the final window is the only ragged one, and no window
    starts at or past ``n`` (no window is fully contained in its
    predecessor).  Output: ``(id_col, chunk_idx, tok_start, tok_end,
    n_chunk_tokens, chunk_text)`` with ``tok_end`` exclusive.

    Scale shape: a pure narrow projection — tokenize, compute the
    window-start sequence, explode, slice — ZERO shuffles, whole-stage
    codegen end to end; the only cost knob is the output amplification
    ``~max_tokens/stride`` on overlapping configs (an overlap factor f
    writes f× the corpus — price it consciously at 100 TB).  A whale
    document yields ``n/stride`` rows from one input row; downstream
    exchanges see bounded ~``max_tokens``-token rows, which is exactly
    the skew defusal that motivates chunking before packing.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    stride = max_tokens if stride is None else stride
    if not 1 <= stride <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens], got {stride}/{max_tokens}"
        )
    from cl_readability_spark.functions.parallelism import ensure_parallelism

    # the tokenize+explode is CPU-bound — floor the parallelism so a
    # byte-sized single-row-group scan cannot serialize it
    docs = ensure_parallelism(docs)

    toks = F.regexp_extract_all(
        F.col(text_col), F.lit(CHUNK_TOKEN_PATTERN), F.lit(0)
    )
    # NULL text => NULL token array => size() NULL, and greatest() SKIPS
    # nulls, so without the coalesce a null doc would sneak out one
    # empty chunk instead of zero
    n = F.coalesce(F.size(toks), F.lit(0))
    extra = F.greatest(n - F.lit(max_tokens), F.lit(0))
    # extra >= 0 always, so ceil(extra/stride) = (extra + stride-1) DIV
    # stride is exact in long arithmetic
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.floor((extra + F.lit(stride - 1)) / F.lit(stride)).cast("long")
    )
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<long>"))
    exploded = docs.select(
        F.col(id_col),
        toks.alias("_ck_toks"),
        n.cast("long").alias("_ck_n"),
        F.explode(starts).alias("chunk_idx"),
    )
    tok_start = F.col("chunk_idx") * F.lit(stride)
    chunk_toks = F.slice(
        F.col("_ck_toks"), (tok_start + 1).cast("int"), max_tokens
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        tok_start.alias("tok_start"),
        F.least(tok_start + F.lit(max_tokens), F.col("_ck_n")).alias(
            "tok_end"
        ),
        F.size(chunk_toks).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
    )


def token_chunks(
    docs: DataFrame,
    max_tokens: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "bpe_tokens",
) -> DataFrame:
    """``doc_chunks`` over an ALREADY-TOKENIZED array column — the
    real-subword training-shard path: ``bpe_encode`` → ``token_chunks``
    → ``pack_sequences`` on ``n_chunk_tokens``, so the windows the
    packer bins are exact SUBWORD windows, not the regex estimate
    (``doc_chunks`` keeps the text-level role; the window math —
    coverage, ragged tail, stride overlap — is identical and pinned by
    the equivalence test in tests/test_packing.py).

    Output: ``(id_col, chunk_idx, tok_start, tok_end, n_chunk_tokens,
    chunk_tokens)`` — ``chunk_tokens`` is the window's token slice
    (array<string>), ``tok_end`` exclusive.  NULL token arrays yield
    zero chunks, like NULL text in ``doc_chunks``.

    Scale shape: identical to ``doc_chunks`` — sequence + explode +
    slice, ZERO shuffles, pure JVM (the Arrow stage lives upstream in
    the encoder); the composed chain's whole plan is ONE Arrow stage
    (encode) + ONE exchange (the packer's repartition), plan-goldened
    in tests/test_packing.py."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    stride = max_tokens if stride is None else stride
    if not 1 <= stride <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens], got {stride}/{max_tokens}"
        )
    toks = F.col(tokens_col)
    n = F.coalesce(F.size(toks), F.lit(0))
    extra = F.greatest(n - F.lit(max_tokens), F.lit(0))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.floor((extra + F.lit(stride - 1)) / F.lit(stride)).cast("long")
    )
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<long>"))
    exploded = docs.select(
        F.col(id_col),
        toks.alias("_ck_toks"),
        n.cast("long").alias("_ck_n"),
        F.explode(starts).alias("chunk_idx"),
    )
    tok_start = F.col("chunk_idx") * F.lit(stride)
    chunk_toks = F.slice(
        F.col("_ck_toks"), (tok_start + 1).cast("int"), max_tokens
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        tok_start.alias("tok_start"),
        F.least(tok_start + F.lit(max_tokens), F.col("_ck_n")).alias(
            "tok_end"
        ),
        F.size(chunk_toks).cast("long").alias("n_chunk_tokens"),
        chunk_toks.alias("chunk_tokens"),
    )
