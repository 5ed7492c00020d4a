"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k (the correctness baseline; one
  scan + TakeOrderedAndProject, no shuffle beyond the final top-k).
- ``lsh_bucketed_topk``: the scale path — random-hyperplane signatures
  bucket the corpus so each query probes only its bucket (and optionally
  multiprobe neighbors).  All JVM expressions; hyperplanes are derived
  deterministically from a seed via xxhash64 so executors need no broadcast
  of Python state.

At 100 TB the brute-force path is a full scan per query; the bucketed path
turns ANN into a bucket-equi-join — shuffle keyed on (signature), bucket
sizes bounded by signature bits."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            id_col, F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from integer hashing
    (executor-independent, no RNG state)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.sha256(f"{seed}:{plane_idx}:{d}".encode()).digest()
        v = int.from_bytes(h[:8], "big", signed=True) / 2**63
        out.append(v)
    return out


def hyperplane_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Adds an integer signature column: bit i = sign(v · plane_i)."""
    planes = [_hyperplane(dim, i, seed) for i in range(n_planes)]
    bits = [
        F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(x) for x in planes[i]])) > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(n_planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn(out_col, sig)


def _sig_of(vec: list[float], n_planes: int, seed: int) -> int:
    sig = 0
    for i in range(n_planes):
        plane = _hyperplane(len(vec), i, seed)
        if sum(v * p for v, p in zip(vec, plane)) > 0:
            sig |= 1 << i
    return sig


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 512,
) -> DataFrame:
    """All-pairs embedding-cosine near-duplicate detection: hyperplane
    signatures bucket the corpus, candidate pairs form within buckets
    (self-join on the signature — near-identical vectors agree on every
    sign bit w.h.p.), exact cosine verifies.  Returns
    (id_a, id_b, cosine_sim_x10k) with id_a < id_b, sim ≥ threshold."""
    sig = hyperplane_signature(embeddings, _dim_of(embeddings, vec_col),
                               n_planes, seed, vec_col)
    left = sig.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("lsh_sig"),
    )
    right = sig.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("lsh_sig"),
    )
    # cap pathological buckets so a degenerate signature cannot go quadratic
    sizes = sig.groupBy("lsh_sig").count().filter(F.col("count") <= max_bucket)
    bounded = left.join(sizes.select("lsh_sig"), "lsh_sig")
    pairs = (
        bounded.join(right, "lsh_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim_x10k",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b"))
                * 10000
                / (_norm(F.col("vec_a")) * _norm(F.col("vec_b"))),
                0,
            ).cast("long"),
        )
        .filter(F.col("cosine_sim_x10k") >= int(threshold * 10000))
        .select("id_a", "id_b", "cosine_sim_x10k")
    )
    return pairs


def _dim_of(df: DataFrame, vec_col: str) -> int:
    first = df.select(vec_col).first()
    return len(first[0])


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only vectors whose hyperplane signature is within
    ``multiprobe_bits`` Hamming distance of the query's signature."""
    dim = len(query_vec)
    sig_df = hyperplane_signature(embeddings, dim, n_planes, seed, vec_col)
    qsig = _sig_of(query_vec, n_planes, seed)
    probe_sigs = {qsig}
    if multiprobe_bits >= 1:
        for i in range(n_planes):
            probe_sigs.add(qsig ^ (1 << i))
    if multiprobe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe_sigs.add(qsig ^ (1 << i) ^ (1 << j))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        sig_df.filter(F.col("lsh_sig").isin(*[int(s) for s in probe_sigs]))
        .select(
            id_col, F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
