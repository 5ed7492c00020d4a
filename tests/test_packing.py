"""Sequence packing (functions/packing.py)."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.packing import pack_sequences

pytestmark = pytest.mark.spark


@pytest.fixture()
def docs(spark):
    # 200 docs, token counts 10..990 (deterministic), plus two oversize
    rows = [(i, (i * 37) % 991 + 10) for i in range(200)]
    rows += [(900, 5000), (901, 4096)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_pack_invariants(spark, docs):
    """Every doc exactly once; every non-oversize pack within the budget;
    pack_tokens is the true per-pack sum; oversize docs isolated."""
    out = pack_sequences(docs, max_tokens=4096, num_partitions=8)
    rows = out.collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in docs.collect()
    )
    by_pack: dict[str, list] = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pack, members in by_pack.items():
        total = sum(m.n_tokens for m in members)
        assert all(m.pack_tokens == total for m in members), pack
        if any(m.oversize for m in members):
            assert len(members) == 1
        else:
            assert total <= 4096, pack
    oversized = {r.doc_id for r in rows if r.oversize}
    assert oversized == {900}  # 4096 fits exactly; 5000 does not


def test_pack_efficiency_and_determinism(spark, docs):
    """BFD within each partition: packs (beyond the per-partition tail)
    are well filled — total packs stay within 1.5× the token lower bound
    plus one tail pack per partition; the assignment is identical across
    two runs (hash repartition + in-partition sort are deterministic)."""
    out = pack_sequences(docs, max_tokens=4096, num_partitions=8)
    rows = out.filter(~F.col("oversize")).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    n_packs = len({r.pack_id for r in rows})
    lower_bound = -(-total_tokens // 4096)
    assert n_packs <= 1.5 * lower_bound + 8  # + one tail pack/partition
    again = {
        (r.doc_id, r.pack_id)
        for r in pack_sequences(docs, max_tokens=4096, num_partitions=8).collect()
    }
    assert again == {(r.doc_id, r.pack_id) for r in out.collect()}


def test_pack_validation(spark, docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, max_tokens=0)


def test_pack_null_tokens_are_zero_not_fatal(spark):
    """A NULL token count (bad upstream data) must not fail the stage —
    the row packs as 0 tokens."""
    df = spark.createDataFrame(
        [(0, 100), (1, None), (2, 50)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in
            pack_sequences(df, max_tokens=200, num_partitions=2).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[1].n_tokens == 0 and not rows[1].oversize
