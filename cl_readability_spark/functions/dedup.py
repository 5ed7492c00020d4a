"""Near-duplicate detection at corpus scale — MinHash+LSH and SimHash.

Everything here is pure DataFrame ops (xxhash64, higher-order array
functions, hash aggregates) — no Python in the hot path, so the plans are
whole-stage-codegen and shuffle only on the band/bucket keys (classic
shingle → minhash → band → bucket-join LSH).

Scale design: the only wide operations are (a) the explode of ``bands``
rows per doc (bands ≈ 8, constant), and (b) the groupBy on
(band_idx, band_hash) whose fan-in is the bucket size — bounded by
``spark.sql.shuffle.partitions`` and naturally tiny for non-duplicate
corpora.  Candidate verification joins back only the candidate pairs
(anti-skew: bucket lists are capped via ``max_bucket``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_shingles(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Adds a ``shingles`` column: distinct word k-grams (array<string>)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(words)
    shingles = F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return df.withColumn("shingles", shingles)


def _seeded_hasher(j: int):
    # NB: must be a unary lambda — a `lambda s, j=j` would be treated as the
    # (element, index) binary form by transform() and bind j to the index
    # Column (whose repr would then leak nondeterministic exprIds into the
    # literal prefix)
    prefix = f"mh{j}:"
    return lambda s: F.xxhash64(F.concat(F.lit(prefix), s))


def minhash_signature(
    df: DataFrame, n_hashes: int = 32, shingle_col: str = "shingles"
) -> DataFrame:
    """Adds ``signature``: array of n_hashes min-hash values. Hash family =
    xxhash64 with a per-index string prefix (deterministic, JVM-side)."""
    sig = F.array(
        *[
            F.array_min(F.transform(F.col(shingle_col), _seeded_hasher(j)))
            for j in range(n_hashes)
        ]
    )
    return df.withColumn("signature", sig)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """signature → band hashes → bucket-join → candidate pairs (id_a < id_b).

    ``max_bucket`` caps pathological buckets (e.g. empty-text clusters) so a
    degenerate key cannot produce a quadratic pair explosion."""
    rows_per_band = n_hashes // bands
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("signature")[b * rows_per_band + r].cast(
                                        "string"
                                    )
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_idx", "band.band_hash")
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size("ids")),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return pairs


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Full pipeline: shingle → minhash → LSH buckets → candidate pairs →
    exact Jaccard verification on the shingle sets → pairs ≥ threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b."""
    sh = word_shingles(df.select(id_col, text_col), text_col, k)
    sig = minhash_signature(sh, n_hashes)
    cand = lsh_candidate_pairs(sig, id_col, n_hashes, bands)
    sets_ = sh.select(F.col(id_col).alias("_sid"), F.col("shingles"))
    verified = (
        cand.join(sets_.withColumnRenamed("_sid", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sets_.withColumnRenamed("_sid", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 256,
) -> DataFrame:
    """SimHash near-duplicate pairs: documents whose 64-bit SimHashes are
    within ``max_hamming`` bits.

    Candidate generation is EXACT (not probabilistic): the signature is
    split into 4 16-bit blocks, and by pigeonhole any pair within Hamming
    distance 3 agrees on at least one whole block — so bucketing on
    (block_idx, block_value) finds every qualifying pair as long as
    ``max_hamming <= 3``.  Verification is ``bit_count(xor)`` — all JVM.

    Returns (id_a, id_b, hamming) with id_a < id_b.  One groupBy shuffle on
    the block key (bounded by ``max_bucket``) plus two id-joins for verify
    — the same scale shape as the MinHash path."""
    if max_hamming > 3:
        raise ValueError("4-block pigeonhole guarantees recall only for max_hamming <= 3")
    sim = simhash_signature(df, id_col, text_col)
    blocks = sim.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("block_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("blk"),
    ).select("_id", "blk.block_idx", "blk.block_val")
    buckets = (
        blocks.groupBy("block_idx", "block_val")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size("ids")),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    sigs = sim.select(F.col(id_col), F.col("simhash"))
    verified = (
        pairs.join(
            sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b")),
            "id_b",
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return verified


def simhash_signature(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document: tokens → xxhash64 → per-bit ±1 sums →
    sign bits.  Entirely aggregate-expression based (one shuffle on id)."""
    words = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    tok = df.select(F.col(id_col), words.alias("tok")).withColumn(
        "h", F.xxhash64(F.col("tok"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sim = agg.select(
        F.col(id_col),
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i) if i < 63
                       else F.lit(-(2**63))).otherwise(0)
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim
