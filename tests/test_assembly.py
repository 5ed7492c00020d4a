"""Dataset assembly (functions/assembly.py): deterministic epoch
shuffle + shard writing, and the scalable token-budget prefix-sum cut
— value parity against a driver-side reference, the greedy-cut
property, edge cases, and the plan shape (no data-sized
single-partition stage)."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.assembly import (
    epoch_shuffle,
    token_budget_sample,
    write_epoch_shards,
)
from cl_readability_spark.functions.pins import release_pinned

pytestmark = pytest.mark.spark


def _toks(spark, n=200, seed=3):
    # deterministic ragged token counts incl. zeros and a null
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 17 == 0, None)
        .otherwise(F.pmod(F.col("id") * 37 + seed, F.lit(50)))
        .cast("long")
        .alias("n_tokens"),
        F.pmod(F.col("id") * 13 + 1, F.lit(97)).cast("long").alias("prio"),
    )


def _reference_selection(rows, budget):
    """Driver-side textbook greedy: sort by (prio desc, id), cumsum."""
    ordered = sorted(rows, key=lambda r: (-r["prio"], r["doc_id"]))
    cum, out = 0, {}
    for r in ordered:
        tok = r["n_tokens"] or 0
        out[r["doc_id"]] = (cum, cum < budget)
        cum += tok
    return out


def test_token_budget_matches_reference(spark):
    df = _toks(spark)
    ref = _reference_selection([r.asDict() for r in df.collect()], 2000)
    out = token_budget_sample(
        df, 2000, token_col="n_tokens", priority_col="prio",
        id_col="doc_id", n_ranges=7, join_back=False,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == len(ref)
    for doc_id, (cum_before, selected) in ref.items():
        r = got[doc_id]
        assert r["cum_before_tokens"] == cum_before, doc_id
        assert r["selected"] == selected, doc_id
    release_pinned(out)


def test_token_budget_greedy_cut_property(spark):
    df = _toks(spark)
    out = token_budget_sample(
        df, 1500, token_col="n_tokens", priority_col="prio",
        id_col="doc_id", n_ranges=5, join_back=False,
    )
    sel = out.filter("selected")
    total = sel.agg(F.sum("budget_tokens")).first()[0]
    biggest = sel.agg(F.max("budget_tokens")).first()[0]
    # overshoot bounded by one document; everything strictly under
    # budget BEFORE each selected doc
    assert total < 1500 + biggest
    assert sel.filter(F.col("cum_before_tokens") >= 1500).count() == 0
    # the cut is a PREFIX of the priority order: the first unselected
    # doc's cum_before is >= budget... only true for zero-free suffix;
    # assert instead that unselected docs all sit at/after the cut
    assert (
        out.filter(~F.col("selected"))
        .filter(F.col("cum_before_tokens") < 1500)
        .count()
        == 0
    )
    release_pinned(out)


def test_token_budget_edges(spark):
    df = _toks(spark, n=30)
    # budget 0: nothing selected
    z = token_budget_sample(
        df, 0, token_col="n_tokens", priority_col="prio",
        id_col="doc_id", join_back=False,
    )
    assert z.filter("selected").count() == 0
    release_pinned(z)
    # budget >= total: everything selected, incl. null-token (=0) docs
    total = df.agg(F.sum(F.coalesce("n_tokens", F.lit(0)))).first()[0]
    a = token_budget_sample(
        df, int(total) + 1, token_col="n_tokens", priority_col="prio",
        id_col="doc_id", join_back=False,
    )
    assert a.filter("selected").count() == 30
    release_pinned(a)
    # n_ranges far beyond the row count (empty ranges) stays correct
    b = token_budget_sample(
        df, 200, token_col="n_tokens", priority_col="prio",
        id_col="doc_id", n_ranges=64, join_back=False,
    )
    ref = _reference_selection([r.asDict() for r in df.collect()], 200)
    for r in b.collect():
        assert (r["cum_before_tokens"], r["selected"]) == ref[r["doc_id"]]
    release_pinned(b)


def test_token_budget_join_back_and_no_priority(spark):
    df = _toks(spark, n=50)
    out = token_budget_sample(
        df, 500, token_col="n_tokens", id_col="doc_id"
    )  # no priority: order is doc_id asc
    assert set(out.columns) == {
        "doc_id", "n_tokens", "prio", "cum_before_tokens", "selected",
    }
    rows = {r["doc_id"]: r for r in out.collect()}
    cum = 0
    for i in range(50):
        assert rows[i]["cum_before_tokens"] == cum
        assert rows[i]["selected"] == (cum < 500)
        cum += (0 if i % 17 == 0 else (i * 37 + 3) % 50)
    release_pinned(out)


def test_token_budget_plan_shape(spark):
    """The prefix sum must not put the data through one task: exactly
    one SinglePartition exchange, and it feeds the n_ranges-row offsets
    window (its subtree aggregates first) — the data path's window is
    partitioned by the range id."""
    df = _toks(spark)
    out = token_budget_sample(
        df, 1000, token_col="n_tokens", priority_col="prio",
        id_col="doc_id", n_ranges=8, join_back=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1, plan[:4000]
    single = plan.split("Exchange SinglePartition", 1)[1]
    # the single-partition subtree is the aggregated per-range totals
    assert "HashAggregate" in single, single[:2000]
    # the data-path cumulative window is partitioned (by the range id)
    assert "_pid" in plan
    release_pinned(out)


def test_epoch_shuffle_deterministic_and_seeded(spark):
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    a = epoch_shuffle(df, seed=1, n_shards=8)
    b = epoch_shuffle(df, seed=1, n_shards=8)
    assert a.exceptAll(b).count() == 0  # run-stable
    c = epoch_shuffle(df, seed=2, n_shards=8)
    # a new seed is a new permutation: order by key differs
    order_a = [r["doc_id"] for r in a.orderBy("shuffle_key").collect()]
    order_c = [r["doc_id"] for r in c.orderBy("shuffle_key").collect()]
    assert order_a != order_c
    assert sorted(order_a) == sorted(order_c) == list(range(300))
    # shards in range and reasonably occupied
    shards = {r["shard"] for r in a.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) >= 6
    # pure projection: no exchange in the plan
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_write_epoch_shards_layout_and_order(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "epoch0")
    write_epoch_shards(df, path, seed=5, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    assert set(
        r["shard"] for r in back.select("shard").distinct().collect()
    ) == set(range(4))
    # within each shard file, rows are in shuffle_key order
    import glob

    from cl_readability_spark.functions.assembly import epoch_shuffle as es

    expect = {
        (r["doc_id"]): r["shuffle_key"]
        for r in es(df, seed=5, n_shards=4).collect()
    }
    for shard_dir in sorted(glob.glob(f"{path}/shard=*")):
        pdf = spark.read.parquet(shard_dir).toPandas()
        keys = [expect[d] for d in pdf["doc_id"]]
        assert keys == sorted(keys), shard_dir


# ---------------------------------------------------------------- rank_buckets


def _scored(spark, n=180):
    # deterministic scores with ties, a null block, and two groups
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 23 == 0, None)
        .otherwise(F.pmod(F.col("id") * 31 + 7, F.lit(40)).cast("double"))
        .alias("score"),
        F.when(F.col("id") % 3 == 0, F.lit("en"))
        .otherwise(F.lit("de"))
        .alias("lang"),
    )


def _ref_buckets(rows, n_buckets, group=None, ascending=True):
    """Driver-side textbook: sort (nulls first asc / last desc,
    id tiebreak), bucket = 1 + (rank-1)*n//count per stratum."""
    out = {}
    strata = {}
    for r in rows:
        strata.setdefault(r[group] if group else None, []).append(r)
    for rs in strata.values():
        if ascending:
            rs.sort(
                key=lambda r: (
                    (0, None) if r["score"] is None else (1, r["score"]),
                    r["doc_id"],
                )
            )
        else:
            rs.sort(
                key=lambda r: (
                    (1, 0) if r["score"] is None else (0, -r["score"]),
                    r["doc_id"],
                )
            )
        n = len(rs)
        for i, r in enumerate(rs):
            out[r["doc_id"]] = (i + 1, 1 + (i * n_buckets) // n)
    return out


def test_rank_buckets_matches_reference_global(spark):
    from cl_readability_spark.functions.assembly import rank_buckets

    df = _scored(spark)
    ref = _ref_buckets([r.asDict() for r in df.collect()], 3)
    out = rank_buckets(
        df, "score", n_buckets=3, id_col="doc_id", n_ranges=7,
        join_back=False,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == len(ref)
    for doc_id, (rank, bucket) in ref.items():
        assert got[doc_id]["score_rank"] == rank, doc_id
        assert got[doc_id]["rank_bucket"] == bucket, doc_id
    release_pinned(out)


def test_rank_buckets_grouped_descending_labels(spark):
    from cl_readability_spark.functions.assembly import rank_buckets

    df = _scored(spark)
    ref = _ref_buckets(
        [r.asDict() for r in df.collect()], 4, group="lang",
        ascending=False,
    )
    out = rank_buckets(
        df, "score", n_buckets=4, group_cols=("lang",),
        id_col="doc_id", ascending=False, n_ranges=5,
        labels=("a", "b", "c", "d"),
    )
    got = {r["doc_id"]: r for r in out.collect()}
    for doc_id, (rank, bucket) in ref.items():
        assert got[doc_id]["score_rank"] == rank, doc_id
        assert got[doc_id]["rank_bucket"] == bucket, doc_id
        assert got[doc_id]["rank_bucket_label"] == "abcd"[bucket - 1]
    # join_back carries the original columns
    assert {"doc_id", "score", "lang"} <= set(out.columns)
    release_pinned(out)


def test_rank_buckets_edges(spark):
    from cl_readability_spark.functions.assembly import rank_buckets

    df = _scored(spark, n=10)
    # n_buckets=1: everything bucket 1
    one = rank_buckets(df, "score", n_buckets=1, join_back=False)
    assert {r["rank_bucket"] for r in one.collect()} == {1}
    release_pinned(one)
    # n_buckets > rows: buckets spread, max bucket <= n_buckets,
    # ranks still the permutation 1..n
    big = rank_buckets(df, "score", n_buckets=64, join_back=False)
    rows = big.collect()
    assert sorted(r["score_rank"] for r in rows) == list(range(1, 11))
    assert all(1 <= r["rank_bucket"] <= 64 for r in rows)
    release_pinned(big)
    with pytest.raises(ValueError):
        rank_buckets(df, "score", n_buckets=0)
    with pytest.raises(ValueError):
        rank_buckets(df, "score", n_buckets=3, labels=("x",))


def test_rank_buckets_equal_sizes(spark):
    """Bucket sizes differ by at most 1 (the floor-rank rule)."""
    from cl_readability_spark.functions.assembly import rank_buckets

    df = _scored(spark, n=100)
    out = rank_buckets(df, "score", n_buckets=3, join_back=False)
    sizes = {
        r["rank_bucket"]: r["n"]
        for r in out.groupBy("rank_bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    release_pinned(out)


def test_rank_buckets_plan_shape(spark):
    """No data-sized single-partition stage: every SinglePartition
    exchange in the plan sits above the aggregated counts frame."""
    from cl_readability_spark.functions.assembly import rank_buckets

    df = _scored(spark)
    out = rank_buckets(
        df, "score", n_buckets=3, id_col="doc_id", n_ranges=8,
        join_back=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("Exchange SinglePartition")
    assert len(parts) >= 2, plan[:3000]
    for sub in parts[1:]:
        assert "HashAggregate" in sub, sub[:2000]
    # the data-path rank window is partitioned by the range id
    assert "_pid" in plan
    release_pinned(out)


def test_ppl_partition_composes(spark):
    """head/middle/tail: per-group thirds ordered by ascending
    perplexity — verified against a driver-side recomputation from
    lm_perplexity's own output (the LM itself is pinned by its twin)."""
    from cl_readability_spark.functions.lm import lm_perplexity, ppl_partition

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick word "),
            F.when(F.col("id") % 7 == 0, F.lit("zz qq xx"))
            .otherwise(F.lit("the the fox")),
            F.lit(" run "),
            (F.col("id") % 5).cast("string"),
        ).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    ref_corpus = spark.range(40).select(
        F.concat(
            F.lit("the quick brown fox run the fox "),
            (F.col("id") % 9).cast("string"),
        ).alias("text")
    )
    out = ppl_partition(
        docs, reference=ref_corpus, group_cols=("lang",), n_buckets=3,
        vocab_size=64,
    )
    rows = [r.asDict() for r in out.collect()]
    assert len(rows) == 60
    assert {"lm_perplexity", "score_rank", "ppl_bucket",
            "ppl_bucket_label"} <= set(rows[0])
    scored = {
        r["doc_id"]: r["lm_perplexity"]
        for r in lm_perplexity(
            docs, reference=ref_corpus, vocab_size=64
        ).collect()
    }
    ref = _ref_buckets(
        [
            {"doc_id": r["doc_id"], "score": scored[r["doc_id"]],
             "lang": r["lang"]}
            for r in rows
        ],
        3,
        group="lang",
    )
    lab = {1: "head", 2: "middle", 3: "tail"}
    for r in rows:
        rank, bucket = ref[r["doc_id"]]
        assert r["score_rank"] == rank
        assert r["ppl_bucket"] == bucket
        assert r["ppl_bucket_label"] == lab[bucket]
    release_pinned(out)
