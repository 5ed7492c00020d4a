"""ANN tests: brute-force exactness vs numpy oracle; LSH recall and probe
reduction on the driver embeddings table."""

import math

import pytest

from cl_readability_spark.functions.similarity import (
    brute_force_topk,
    hyperplane_signature,
    lsh_bucketed_topk,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def all_vecs(embs):
    return {r.vec_id: list(r.embedding) for r in embs.collect()}


def cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_brute_force_matches_python_oracle(spark, embs, all_vecs):
    q = all_vecs[0]
    expected = sorted(
        ((round(cos(v, q), 6), vid) for vid, v in all_vecs.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [(r.cosine_sim, r.vec_id) for r in brute_force_topk(embs, q, 10).collect()]
    assert got == [(s, vid) for s, vid in expected]


def test_signature_deterministic_and_bounded(spark, embs):
    dim = len(embs.first().embedding)
    a = {r.vec_id: r.lsh_sig for r in hyperplane_signature(embs, dim).collect()}
    b = {r.vec_id: r.lsh_sig for r in hyperplane_signature(embs, dim).collect()}
    assert a == b
    assert all(0 <= s < 256 for s in a.values())
    # signatures spread across buckets (not degenerate)
    assert len(set(a.values())) > 8


def test_lsh_topk_recall(spark, embs, all_vecs):
    """With multiprobe=2 the LSH top-k must recover most of the exact top-k
    (cosine LSH guarantees near vectors share sign patterns w.h.p.)."""
    q = all_vecs[3]
    exact = [r.vec_id for r in brute_force_topk(embs, q, 10).collect()]
    approx = [r.vec_id for r in lsh_bucketed_topk(embs, q, k=10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)


def test_lsh_probes_fewer_vectors(spark, embs, all_vecs):
    dim = len(all_vecs[0])
    sig_df = hyperplane_signature(embs, dim)
    total = embs.count()
    from cl_readability_spark.functions.similarity import _sig_of

    qsig = _sig_of(all_vecs[3], 8, 42)
    probes = {qsig} | {qsig ^ (1 << i) for i in range(8)}
    probed = sig_df.filter(sig_df.lsh_sig.isin(*[int(s) for s in probes])).count()
    assert probed < total * 0.25, (probed, total)


def test_embedding_near_dups(spark):
    """Planted near-duplicate embeddings are found; unrelated ones are not."""
    import random

    from cl_readability_spark.functions.similarity import embedding_near_dups

    rng = random.Random(5)
    rows = []
    base = [[rng.gauss(0, 1) for _ in range(32)] for _ in range(20)]
    for i, v in enumerate(base):
        rows.append((i, v))
    # plant near-dups of vectors 0 and 1 (tiny perturbation)
    rows.append((100, [x + 0.01 for x in base[0]]))
    rows.append((101, [x * 1.001 for x in base[1]]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim_x10k
        for r in embedding_near_dups(df, threshold=0.99).collect()
    }
    assert (0, 100) in pairs
    assert (1, 101) in pairs
    assert pairs[(1, 101)] >= 9990
    # no unrelated gaussian pair reaches 0.99 cosine
    for (a, b) in pairs:
        assert (a, b) in {(0, 100), (1, 101)}
