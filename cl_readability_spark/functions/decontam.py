"""Benchmark decontamination — flag corpus documents sharing a word
n-gram with an evaluation/benchmark set (the standard training-data
hygiene stage: a document containing a verbatim benchmark passage leaks
the eval into training).

Spark-first shape, two strategies:

- ``broadcast`` (default for real benchmark suites): the benchmark's
  distinct n-gram hash set is computed once distributed, collected as a
  SORTED numpy int64 array, and broadcast — corpus flagging is then one
  stateless Arrow stage with zero joins and zero shuffles: the plan at
  100 TB is scan → mapInPandas → next stage, embarrassingly parallel.
  Membership is vectorized ``searchsorted`` against the sorted array
  (~8 bytes/gram: 10^6 grams ≈ 8 MB, 10^8 grams ≈ 800 MB — the numpy
  array, unlike a python set of ints, has no per-object overhead).
- ``join`` (the oversized-benchmark path): the benchmark gram set stays
  distributed — corpus grams are exploded as compact (text-key, gram)
  pairs, joined against the gram frame, and the per-text hit counts are
  joined back on the text key.  Three keyed shuffles of narrow rows +
  one corpus shuffle; no driver-side set at all.

``strategy="auto"`` (the default) picks: broadcast while the distinct
gram count is ≤ ``broadcast_limit`` (50M grams ≈ 400 MB), join above
it — so feeding a multi-GB "benchmark" degrades to the scalable plan
instead of OOMing the driver.  ``benchmark_ngram_hashes`` separately
hard-fails above ``max_grams`` for callers that insist on a collected
set.  The n-gram hashing is the same keyed blake2b-64 family as the
dedup stack (``dedup._shingle_hashes``), so a benchmark gram and a
corpus gram can never disagree on tokenization or hashing.

The membership test is exact on hashes (64-bit; chance collision
~5e-20 per gram pair) — deliberately NOT a bloom filter: a
false-positive-free flag lets the ``contaminated`` column double as a
hard filter.  Default n=13 follows the common LLM decontamination
practice (GPT-3 appendix C / The Pile): long enough that natural reuse
of an n-gram is negligible, short enough to catch partial quotes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cl_readability_spark.functions.dedup import _shingle_hashes

# above this distinct-gram count, auto-strategy switches to the join
# plan; 50M int64s ≈ 400 MB broadcast — comfortable on executors, far
# past any real benchmark suite (≈66k grams measured on the bench set)
DEFAULT_BROADCAST_LIMIT = 50_000_000


def _gram_frame(
    benchmark: DataFrame, text_col: str, n: int, key: bytes
) -> DataFrame:
    """Distinct n-gram hashes of ``benchmark`` as a one-column frame
    (``gram long``) — stays distributed; both strategies start here."""
    import pandas as pd

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

    return benchmark.select(text_col).mapInPandas(_grams, "gram long").distinct()


def benchmark_ngram_hashes(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 13,
    seed: int = 42,
    max_grams: int = 100_000_000,
):
    """The distinct n-gram hash set of the benchmark frame, computed
    distributed (one Arrow stage + one distinct) and returned as a
    SORTED numpy int64 array for broadcasting (10^8 grams ≈ 800 MB; a
    python set of the same ints would cost 6-12 GB in object overhead).
    Raises above ``max_grams`` — a "benchmark" that large must go
    through ``decontaminate(strategy="join")``, never a driver collect.
    Documents shorter than ``n`` words contribute their whole word run
    as one gram (the dedup fallback), i.e. a short benchmark passage is
    matched only verbatim."""
    grams = _gram_frame(benchmark, text_col, n, str(seed).encode())
    return _collect_sorted_grams(grams, max_grams)


def _collect_sorted_grams(grams_df: DataFrame, max_grams: int):
    """count-guard + single Arrow collect of a gram frame to a sorted
    numpy int64 array.  The frame is pinned between the guard job and the
    collect job — without the pin the gram stage runs twice AND a source
    that grew between the jobs could silently truncate the set."""
    grams_df = grams_df.persist()
    try:
        count = grams_df.count()
        if count > max_grams:
            raise ValueError(
                f"benchmark has {count} distinct n-grams (> {max_grams}); "
                f"collecting that to the driver is the OOM path — use "
                f"decontaminate(strategy='join') to keep the set distributed"
            )
        arr = grams_df.toPandas()["gram"].to_numpy(dtype="int64", copy=True)
    finally:
        grams_df.unpersist()
    arr.sort()
    return arr


def _normalize_hashes(hashes):
    import numpy as np

    arr = np.asarray(hashes, dtype=np.int64)
    arr = np.sort(arr)
    return arr


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    n: int = 13,
    seed: int = 42,
    hashes=None,
    strategy: str = "auto",
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
) -> DataFrame:
    """Adds ``contaminated`` (bool) and ``n_contaminated_grams`` (int) to
    ``corpus``: whether the document shares any word n-gram with the
    benchmark set.  Pass either ``benchmark`` (gram set computed here) or
    precomputed ``hashes`` (list or numpy array — e.g. cached across
    corpora; the benchmark set rarely changes).  Filter ``~contaminated``
    for the clean corpus; keep the flag for audit reports.

    ``strategy``: "broadcast" (sorted-array broadcast + stateless Arrow
    stage — zero shuffles), "join" (distributed gram join — no driver
    set), or "auto" (broadcast ≤ ``broadcast_limit`` distinct grams,
    join above — for precollected ``hashes`` too, re-parallelized
    through Arrow).  Both strategies produce identical flags and counts
    (pytest-pinned equivalence)."""
    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"strategy must be auto/broadcast/join, got {strategy!r}")
    from cl_readability_spark.functions.parallelism import ensure_parallelism

    # gram hashing is CPU-bound — parallelism floor (no-op mid-chain)
    corpus = ensure_parallelism(corpus)
    key = str(seed).encode()
    if hashes is None and benchmark is None:
        raise ValueError("pass either benchmark or hashes")

    if strategy != "broadcast" and hashes is None:
        # gram count decides auto; computing it costs one pass over the
        # (small) benchmark frame only
        grams_df = _gram_frame(benchmark, text_col, n, key)
        if strategy == "join":
            return _decontaminate_join(corpus, grams_df, text_col, n, key)
        # auto: the guard count and the collect (or the join's two
        # consumers) must see ONE evaluation of the gram stage — pin it
        # (narrow longs, tiny), release via the standard pins handle on
        # the join path, immediately on the collect path
        from cl_readability_spark.functions.pins import attach_pins

        grams_df = grams_df.persist()
        try:
            n_grams = grams_df.count()
            if n_grams > broadcast_limit:
                # pin ownership transfers to the returned frame; the join
                # construction sits inside the guard so a raise anywhere
                # in count/collect/join cannot orphan the persist
                out = _decontaminate_join(corpus, grams_df, text_col, n, key)
                return attach_pins(out, grams_df)
            arr = grams_df.toPandas()["gram"].to_numpy(dtype="int64", copy=True)
        except BaseException:
            grams_df.unpersist()
            raise
        grams_df.unpersist()
        arr.sort()
        return _decontaminate_broadcast(corpus, arr, text_col, n, key)

    if hashes is None:  # strategy == "broadcast", benchmark supplied
        hashes = benchmark_ngram_hashes(benchmark, text_col, n, seed)

    bench_arr = _normalize_hashes(hashes)
    if strategy == "join" or (
        strategy == "auto" and len(bench_arr) > broadcast_limit
    ):
        # parallelize the hashes back out through Arrow (a python-tuple
        # createDataFrame would rebuild every hash as driver objects —
        # the exact blowup this path exists to avoid) — auto degrades
        # here the same way the benchmark-frame auto path does
        import pandas as pd

        grams_df = corpus.sparkSession.createDataFrame(
            pd.DataFrame({"gram": pd.Series(bench_arr, dtype="int64")})
        ).distinct()
        return _decontaminate_join(corpus, grams_df, text_col, n, key)
    return _decontaminate_broadcast(corpus, bench_arr, text_col, n, key)


def _out_schema(corpus: DataFrame):
    # StructType.add mutates in place — never call it on the DataFrame's
    # cached schema object (it would corrupt corpus.columns for later use)
    from pyspark.sql.types import StructType

    return (
        StructType(list(corpus.schema.fields))
        .add("contaminated", "boolean", False)
        .add("n_contaminated_grams", "integer", False)
    )


def _decontaminate_broadcast(
    corpus: DataFrame, bench_arr, text_col: str, n: int, key: bytes
) -> DataFrame:
    """One broadcast (sorted int64 array) + one stateless mapInPandas —
    no join, no shuffle, no driver-side corpus state; membership is
    vectorized searchsorted per document."""
    import numpy as np

    bc = corpus.sparkSession.sparkContext.broadcast(bench_arr)
    cols = corpus.columns

    def _flag(batches):
        bench = bc.value
        for pdf in batches:
            flags, hits = [], []
            for text in pdf[text_col]:
                if not (text or "").strip():
                    flags.append(False)  # empty docs cannot leak anything
                    hits.append(0)
                    continue
                grams = np.unique(_shingle_hashes(text, n, key).astype("int64"))
                if len(bench):
                    idx = np.searchsorted(bench, grams)
                    idx[idx == len(bench)] = 0  # any in-range slot; equality decides
                    inter = int(np.count_nonzero(bench[idx] == grams))
                else:
                    inter = 0
                flags.append(inter > 0)
                hits.append(inter)
            pdf = pdf.copy()
            pdf["contaminated"] = flags
            pdf["n_contaminated_grams"] = hits
            yield pdf

    return corpus.select(*cols).mapInPandas(_flag, _out_schema(corpus))


def _decontaminate_join(
    corpus: DataFrame, grams_df: DataFrame, text_col: str, n: int, key: bytes
) -> DataFrame:
    """The oversized-benchmark plan: corpus grams exploded as compact
    (text-key, gram) pairs, inner-joined against the distributed gram
    frame, hit counts aggregated per text key and joined back onto the
    corpus.  The text key is ``xxhash64(text)`` — identical texts share
    a key, which merges their (identical) flags; a cross-text collision
    (~n²/2^64) could only merge two rows' counts, never clear a flag.
    All wide ops are keyed (gram join, per-key agg, corpus join) — AQE
    sizes them; nothing touches the driver.  Internal column names are
    suffixed past any collision with the corpus's own columns (a user
    column named ``_tk`` must come back intact, exactly as it does from
    the broadcast path)."""
    import pandas as pd

    cols = corpus.columns
    tk_col, hits_col = "_tk", "_hits"
    while tk_col in cols:
        tk_col += "_"
    while hits_col in cols:
        hits_col += "_"
    gram_col = grams_df.columns[0]

    tk = F.xxhash64(F.coalesce(F.col(text_col), F.lit("")))

    def _emit(batches):
        import numpy as np

        for pdf in batches:
            tks, grams = [], []
            for t_key, text in zip(pdf[tk_col], pdf[text_col]):
                if not (text or "").strip():
                    continue
                g = np.unique(_shingle_hashes(text, n, key).astype("int64"))
                tks.extend([int(t_key)] * len(g))
                grams.extend(int(x) for x in g)
            yield pd.DataFrame(
                {
                    tk_col: pd.Series(tks, dtype="int64"),
                    gram_col: pd.Series(grams, dtype="int64"),
                }
            )

    pairs = (
        corpus.select(tk.alias(tk_col), text_col)
        .mapInPandas(_emit, f"{tk_col} long, {gram_col} long")
    )
    hits = (
        pairs.join(grams_df, gram_col)
        .groupBy(tk_col)
        .agg(F.count_distinct(gram_col).cast("integer").alias(hits_col))
    )
    return (
        corpus.withColumn(tk_col, tk)
        .join(hits, tk_col, "left")
        .select(
            *cols,
            F.coalesce(F.col(hits_col) > 0, F.lit(False)).alias("contaminated"),
            F.coalesce(F.col(hits_col), F.lit(0)).alias("n_contaminated_grams"),
        )
    )


def semantic_decontam(
    df: DataFrame,
    benchmark: DataFrame,
    emb_col: str = "embedding",
    bench_emb_col: str | None = None,
    threshold_x10k: int = 9500,
    max_bench: int = 1_000_000,
) -> DataFrame:
    """Semantic benchmark decontamination — the EMBEDDING-space
    complement to the n-gram stage above: flag corpus documents whose
    embedding is near-parallel to ANY benchmark/eval embedding
    (paraphrased or lightly-rewritten eval leakage that shares no
    13-gram; the published practice pairs exact n-gram matching with an
    embedding-similarity sweep — e.g. SemDeDup-style cosine screens
    applied between train and test).

    Adds ``semantic_max_sim_x10k`` (max cosine vs the benchmark set,
    ROUNDED to an int x10k — the repo's integer-comparison stance;
    NULL for NULL/zero-norm/wrong-dim embeddings) and
    ``semantically_contaminated``
    (``max sim >= threshold_x10k``; False for NULL embeddings — an
    undecidable row must not silently pass a hard filter as
    contaminated).

    Scale shape (the n-gram broadcast strategy applied to vectors): the
    benchmark matrix is collected ONCE (guarded by ``max_bench`` —
    eval suites are 10^3–10^6 rows; 10^6 x 64 floats ≈ 256 MB),
    L2-normalized, and closure-broadcast into one stateless Arrow stage
    — corpus scoring is a per-batch numpy matmul with zero joins and
    zero shuffles: scan → pandas_udf → next stage at any corpus size.
    Cost is O(|corpus| x |bench| x dim) multiply-adds — at 10^8+
    benchmark rows move to the LSH/IVF path (functions/similarity.py)
    instead of this exact screen."""
    import numpy as np
    from pyspark.sql.types import IntegerType

    bcol = bench_emb_col or emb_col
    if threshold_x10k < -10_000 or threshold_x10k > 10_000:
        raise ValueError("threshold_x10k must be a cosine x10k in [-1e4, 1e4]")
    # bounded driver collect — the benchmark_ngram_hashes stance, with
    # the same explicit hard-fail guard
    rows = benchmark.select(F.col(bcol).alias("_e")).limit(
        int(max_bench) + 1
    ).collect()
    if len(rows) > max_bench:
        raise ValueError(
            f"benchmark exceeds max_bench={max_bench} rows — use the "
            "distributed LSH/IVF screen (functions/similarity.py) instead"
        )
    vecs = [r["_e"] for r in rows if r["_e"] is not None]
    if not vecs:
        raise ValueError("benchmark has no non-NULL embeddings")
    B = np.asarray(vecs, dtype="float64")
    norms = np.linalg.norm(B, axis=1)
    B = B[norms > 0] / norms[norms > 0, None]
    if not len(B):
        raise ValueError("benchmark embeddings are all zero-norm")

    @F.pandas_udf(IntegerType())
    def max_sim(s: pd.Series) -> pd.Series:
        vals = []
        for v in s:
            if v is None or len(v) != B.shape[1]:
                vals.append(None)
                continue
            x = np.asarray(v, dtype="float64")
            n = np.linalg.norm(x)
            if n == 0:
                vals.append(None)
                continue
            # ROUND, not floor: identical vectors give cosine 1.0 only
            # up to an ulp, and floor(9999.99999...) would flip between
            # engines; round is stable everywhere except exact halves
            sim = (B @ (x / n)).max()
            if not np.isfinite(sim):
                # NaN/inf components in the corpus embedding make the
                # cosine undecidable — mark the row NULL like the other
                # undecidable paths instead of letting int(rint(nan))
                # raise and fail the whole job (ADVICE r7)
                vals.append(None)
                continue
            vals.append(int(np.rint(sim * 10_000)))
        return pd.Series(vals, dtype="object")

    out = df.withColumn("semantic_max_sim_x10k", max_sim(F.col(emb_col)))
    return out.withColumn(
        "semantically_contaminated",
        F.coalesce(
            F.col("semantic_max_sim_x10k") >= F.lit(int(threshold_x10k)),
            F.lit(False),
        ),
    )


def split_leakage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    protect: tuple[str, ...] = ("val", "test"),
    mode: str = "exact",
    normalize: bool = True,
    **near_kwargs,
) -> DataFrame:
    """Cross-split leakage audit — the within-corpus counterpart of
    ``decontaminate``: after ``split_assign`` (or any split column),
    find TRAINING rows whose content also appears in a protected
    (eval) split, so the eval is leaked into training by duplication
    rather than by an external benchmark.

    One output row per leaking non-protected row:

    - ``mode="exact"``: (id, split, fingerprint, leaks_into,
      n_protected_matches) — fingerprint is md5 of the text
      (``normalize=True`` applies the doc_fingerprint recipe
      ``lower → strip [^a-z0-9]`` first, so trivial formatting edits
      still match); ``leaks_into`` is the sorted comma-joined set of
      protected splits hit.  Plan: one fingerprint aggregate over the
      protected rows + one keyed join against the non-protected rows —
      two shuffles of slim rows, AQE-managed; a boilerplate text shared
      by millions of rows is one aggregate row fanned back out, never a
      hot window.
    - ``mode="near"``: (id, split, leaks_into, n_protected_matches,
      max_jaccard) — rides ``dedup.minhash_near_dups`` (``near_kwargs``
      pass through: ``jaccard_threshold``, ``carry``, ...) and keeps
      the pairs with exactly one protected side, so lightly-edited
      leaks are caught too.  Scale = the minhash chain's (bucketed,
      never all-pairs); the split attachment is two slim
      (id, split)-projection joins.

    A duplicate WITHIN protected splits (val↔test) or within training
    is not leakage and never flags.  Empty output = clean corpus."""
    if mode not in ("exact", "near"):
        raise ValueError(f"mode must be exact|near, got {mode!r}")
    if not protect:
        raise ValueError("protect must name at least one split")
    protected = [str(s) for s in protect]
    split = F.col(split_col).cast("string")
    if mode == "exact":
        text = F.coalesce(F.col(text_col), F.lit(""))
        if normalize:
            text = F.regexp_replace(F.lower(text), "[^a-z0-9]", "")
        fp = df.select(
            F.col(id_col).alias("id"),
            split.alias("split"),
            F.md5(text).alias("fingerprint"),
        )
        prot = (
            fp.filter(F.col("split").isin(protected))
            .groupBy("fingerprint")
            .agg(
                F.concat_ws(
                    ",", F.sort_array(F.collect_set("split"))
                ).alias("leaks_into"),
                F.count("*").cast("long").alias("n_protected_matches"),
            )
        )
        return (
            fp.filter(~F.col("split").isin(protected))
            .join(prot, "fingerprint")
            .select(
                "id", "split", "fingerprint",
                "leaks_into", "n_protected_matches",
            )
        )

    from cl_readability_spark.functions.dedup import minhash_near_dups

    pairs = minhash_near_dups(
        df, id_col=id_col, text_col=text_col, **near_kwargs
    )
    labels = df.select(
        F.col(id_col).alias("_lid"), split.alias("_lsplit")
    )
    sided = (
        pairs.join(labels, pairs["id_a"] == labels["_lid"])
        .select("id_a", "id_b", "jaccard", F.col("_lsplit").alias("split_a"))
        .join(labels, F.col("id_b") == labels["_lid"])
        .select("id_a", "id_b", "jaccard", "split_a", F.col("_lsplit").alias("split_b"))
    )
    a_prot = F.col("split_a").isin(protected)
    b_prot = F.col("split_b").isin(protected)
    leaks = sided.filter(a_prot != b_prot).select(
        F.when(a_prot, F.col("id_b")).otherwise(F.col("id_a")).alias("id"),
        F.when(a_prot, F.col("split_b")).otherwise(F.col("split_a")).alias("split"),
        F.when(a_prot, F.col("split_a")).otherwise(F.col("split_b")).alias("_prot_split"),
        "jaccard",
    )
    return leaks.groupBy("id", "split").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("_prot_split"))).alias(
            "leaks_into"
        ),
        F.count("*").cast("long").alias("n_protected_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
