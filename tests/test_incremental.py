"""Incremental dedup against bucketed fingerprint catalogs
(functions/incremental.py): exact + minhash probe semantics, append
round-trips, meta validation, and the shuffle-free-catalog plan
goldens that are the operator's reason to exist."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.functions.incremental import (
    append_exact_catalog,
    append_minhash_catalog,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    write_exact_catalog,
    write_minhash_catalog,
)

pytestmark = pytest.mark.spark

BODY = (
    "a reasonably long body of words that the shingle stage can chew on "
    "with enough distinct tokens to make five word shingles {} end"
)


@pytest.fixture()
def corpus(spark):
    rows = [(i, BODY.format(f"uniq{i} " * 3)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cleanup(spark, *tables):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__meta")
        # the in-memory catalog forgets tables across sessions but their
        # warehouse locations persist; clear them so reruns are clean
        for suffix in ("", "__meta"):
            shutil.rmtree(f"{warehouse}/{t}{suffix}", ignore_errors=True)


class _no_broadcast:
    """Force the at-scale join regime for plan-shape assertions: a toy
    catalog broadcasts (optimal at toy size, and the bucketed scan is
    then rightly skipped), but the operator's contract is the BIG
    catalog — shuffle join with the catalog side riding its buckets."""

    KEYS = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.saved = [self.spark.conf.get(k, None) for k in self.KEYS]
        for k in self.KEYS:
            self.spark.conf.set(k, "-1")

    def __exit__(self, *exc):
        for k, v in zip(self.KEYS, self.saved):
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_exact_probe_append_roundtrip(spark, corpus):
    _cleanup(spark, "t_exact")
    write_exact_catalog(corpus, "t_exact", n_buckets=4)
    batch = spark.createDataFrame(
        [
            # identical content to catalog doc 3 — punctuation/case noise
            # only, the normalization the curate() exact gate uses
            (100, BODY.format("uniq3 uniq3 uniq3 ").upper() + "!!!"),
            (101, BODY.format("fresh101 " * 3)),      # new
            (102, BODY.format("fresh101 " * 3)),      # intra-batch dup of 101
            (103, BODY.format("fresh103 " * 3)),      # new
        ],
        "doc_id long, text string",
    )
    probed = incremental_exact_dedup(batch, "t_exact")
    got = {r.doc_id: (r.in_catalog, r.batch_keep) for r in probed.collect()}
    assert got == {
        100: (True, True),
        101: (False, True),
        102: (False, False),
        103: (False, True),
    }

    append_exact_catalog(batch, "t_exact")
    # the appended fingerprints are now catalog hits; catalog grew by
    # exactly the two fresh fingerprints
    reprobe = incremental_exact_dedup(batch, "t_exact")
    assert all(r.in_catalog for r in reprobe.collect())
    assert spark.table("t_exact").count() == 22
    # keeper ids: catalog keeps min(doc_id) per fingerprint
    keep = {
        r.keep_id
        for r in spark.table("t_exact").collect()
        if r.keep_id >= 100
    }
    assert keep == {101, 103}
    _cleanup(spark, "t_exact")


def test_exact_probe_catalog_side_has_no_exchange(spark, corpus):
    """The scale contract: the catalog scan side of the probe join is
    bucketed — NO Exchange above it; the only Exchange(s) in the plan
    hash-partition the BATCH side into the catalog's bucketing."""
    _cleanup(spark, "t_exact_plan")
    write_exact_catalog(corpus, "t_exact_plan", n_buckets=4)
    batch = corpus.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    with _no_broadcast(spark):
        probed = incremental_exact_dedup(batch, "t_exact_plan")
        plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan[:4000]
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exchanges, plan[:4000]
    assert all("fingerprint" in e for e in exchanges)
    # ONE hashpartitioning exchange in the whole probe plan: the batch
    # side moving into the catalog's bucketing (and reused by the
    # intra-batch window); the catalog side rides its buckets unshuffled
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]
    _cleanup(spark, "t_exact_plan")


def test_minhash_probe_flags_catalog_near_dups(spark, corpus):
    _cleanup(spark, "t_mh")
    write_minhash_catalog(corpus, "t_mh", n_buckets=4, n_hashes=32, bands=8)
    batch = spark.createDataFrame(
        [
            (200, BODY.format("uniq7 " * 3)),       # exact text of doc 7
            (201, BODY.format("nothing shared here truly novel " * 2)),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.near_dup_in_catalog, r.catalog_match_id)
        for r in incremental_minhash_dedup(batch, "t_mh", threshold=0.8)
        .collect()
    }
    assert got[200] == (True, 7)
    assert got[201][0] is False
    # append the novel survivor; it now self-matches at agreement 1.0
    append_minhash_catalog(
        batch.filter(F.col("doc_id") == 201), "t_mh"
    )
    re = {
        r.doc_id: (r.near_dup_in_catalog, r.catalog_match_id,
                   r.catalog_sig_agreement)
        for r in incremental_minhash_dedup(batch, "t_mh", threshold=0.8)
        .collect()
    }
    assert re[201] == (True, 201, 1.0)
    _cleanup(spark, "t_mh")


def test_minhash_probe_catalog_side_has_no_exchange(spark, corpus):
    _cleanup(spark, "t_mh_plan")
    write_minhash_catalog(spark.createDataFrame(
        [(i, BODY.format(f"uniq{i} " * 3)) for i in range(8)],
        "doc_id long, text string",
    ), "t_mh_plan", n_buckets=4)
    batch = corpus.select((F.col("doc_id") + 500).alias("doc_id"), "text")
    with _no_broadcast(spark):
        flagged = incremental_minhash_dedup(batch, "t_mh_plan")
        plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan[:4000]
    import re as _re

    probes = [
        e
        for e in _re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        if "band_key" in e
    ]
    # exactly ONE band_key exchange: the batch's band rows moving into
    # the catalog bucketing; the catalog side rides its buckets
    assert len(probes) == 1, plan[:4000]
    _cleanup(spark, "t_mh_plan")


def test_meta_validation_refuses_drift_and_wrong_kind(spark, corpus):
    _cleanup(spark, "t_meta")
    write_exact_catalog(corpus, "t_meta", n_buckets=4)
    with pytest.raises(ValueError, match="kind"):
        incremental_minhash_dedup(corpus, "t_meta")
    _cleanup(spark, "t_meta")


def test_minhash_agreement_is_jaccard_estimate(spark):
    """Half-overlapping shingle sets should land mid-scale agreement —
    the Broder estimator sanity pin (loose band: 32 hashes)."""
    _cleanup(spark, "t_est")
    shared = " ".join(f"w{i}" for i in range(40))
    tail_a = " ".join(f"a{i}" for i in range(40))
    tail_b = " ".join(f"b{i}" for i in range(40))
    cat = spark.createDataFrame(
        [(1, f"{shared} {tail_a}")], "doc_id long, text string"
    )
    write_minhash_catalog(cat, "t_est", n_buckets=2, n_hashes=32, bands=32)
    # bands=32 → every single hash is its own band: candidate iff ANY
    # minhash component collides, so the mid-similarity pair definitely
    # reaches verify and the agreement is the raw estimator
    batch = spark.createDataFrame(
        [(2, f"{shared} {tail_b}")], "doc_id long, text string"
    )
    row = incremental_minhash_dedup(batch, "t_est", threshold=0.05).first()
    assert row.near_dup_in_catalog
    # true Jaccard of the two shingle sets is ~1/3 (shared 36+ of ~112
    # 5-gram shingles); the 32-hash estimate is coarse — wide pin
    assert 0.05 <= row.catalog_sig_agreement <= 0.7
    _cleanup(spark, "t_est")


def test_url_probe_append_roundtrip(spark):
    from cl_readability_spark.functions.incremental import (
        append_url_catalog,
        incremental_url_dedup,
        write_url_catalog,
    )

    _cleanup(spark, "t_url")
    corpus = spark.createDataFrame(
        [(i, f"http://site{i % 5}.com/page/{i}") for i in range(20)],
        "doc_id long, url string",
    )
    write_url_catalog(corpus, "t_url", n_buckets=4)
    assert spark.table("t_url").count() == 20  # all pages distinct
    batch = spark.createDataFrame(
        [
            # variant of catalog page 3 (www + utm + trailing slash)
            (100, "HTTP://WWW.site3.com/page/3/?utm_source=x"),
            (101, "http://site0.com/fresh"),          # new page
            (102, "http://site0.com/fresh?utm_id=1"), # intra-batch variant
            (103, None),                              # no url: kept, never cataloged
            (104, "  "),                              # blank: same
        ],
        "doc_id long, url string",
    )
    probed = incremental_url_dedup(batch, "t_url")
    got = {r.doc_id: (r.in_catalog, r.batch_keep) for r in probed.collect()}
    assert got == {
        100: (True, True),
        101: (False, True),
        102: (False, False),
        103: (False, True),
        104: (False, True),
    }

    append_url_catalog(batch, "t_url")
    assert spark.table("t_url").count() == 21  # only the fresh page
    reprobe = incremental_url_dedup(batch, "t_url")
    hits = {r.doc_id: r.in_catalog for r in reprobe.collect()}
    assert hits[101] and hits[102] and hits[100]
    assert not hits[103] and not hits[104]  # null rows never in_catalog
    _cleanup(spark, "t_url")


def test_url_probe_catalog_side_has_no_exchange(spark):
    """Same scale contract as the exact catalog: the catalog scan rides
    its buckets (no Exchange); only the batch side shuffles, on
    canon_url."""
    from cl_readability_spark.functions.incremental import (
        incremental_url_dedup,
        write_url_catalog,
    )

    _cleanup(spark, "t_url_plan")
    corpus = spark.createDataFrame(
        [(i, f"http://site{i % 5}.com/page/{i}") for i in range(20)],
        "doc_id long, url string",
    )
    write_url_catalog(corpus, "t_url_plan", n_buckets=4)
    batch = corpus.select((F.col("doc_id") + 1000).alias("doc_id"), "url")
    with _no_broadcast(spark):
        probed = incremental_url_dedup(batch, "t_url_plan")
        plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan[:4000]
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exchanges and all("canon_url" in e for e in exchanges)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]
    _cleanup(spark, "t_url_plan")
