"""Hyperlink extraction + host-level link graph + PageRank centrality
+ crawl-frontier prioritization — the web-graph side of a crawl
curation pipeline (which sites link to which, how central a host is,
and which discovered-but-unfetched pages to crawl next).

Reference parity note: the reference (atlas-engineer/cl-readability)
resolves single-document URLs during extraction (readability.lisp
182-221 ``fix-relative-urls``; mirrored per-DOM in
core/extract.py:_to_absolute_uri).  Corpus-level link extraction and
graph analytics are part of the training-data-pipeline extension the
build brief asks for; the per-anchor RESOLUTION CONTRACT below is the
column-expression restatement of the same RFC 3986 joins, minus
dot-segment collapse (see limitations).

Resolution contract (``resolve_href`` — documented, mirrored by the
python oracle in tests/test_links.py and the DuckDB twin
``link_extract_planted``):

1. empty href and in-page fragments (``#...``) → NULL (self-links
   carry no graph signal; the DOM-level extractor keeps them VERBATIM
   per Readability semantics — this module is corpus analytics, not
   content rewriting).
2. absolute (``scheme:...``) → unchanged.
3. no usable base (NULL/blank, or no ``//`` authority) → NULL for all
   relative forms.
4. protocol-relative ``//h/p`` → ``<base-scheme>://h/p``.
5. root-relative ``/p`` → ``<base-origin>/p``.
6. query-only ``?q`` → ``<base-origin><base-path>?q`` (an empty base
   path stays empty — RFC 3986 §5.3 / urljoin byte parity).
7. anything else (relative path) → ``<base-origin><base-dir>/...``
   where base-dir is the base path through its last ``/``.

KNOWN LIMITATIONS (documented, never silently wrong): dot segments
(``../x``) are NOT collapsed (urljoin does; the resolved URL is still
host-correct — the graph edge lands on the right host and the
canonical form under-merges, the safe direction); unquoted ``href=x``
attributes and hrefs containing the other quote character are skipped
(under-extraction); anchors nested inside anchors (invalid HTML)
extract the outer match only.

Scale shape: ``extract_links`` is ONE whole-stage-codegen projection
plus a Generate (explode) — two aligned ``regexp_extract_all`` passes
over the SAME pattern (group 1 = href, group 2 = anchor body; equal
match positions by construction), zipped and exploded; no shuffle, no
python (plan-goldened).  ``host_edges`` is one map-side-combinable
groupBy on (src_host, dst_host) — a hub host collapses to slim
partials per input partition; output cardinality is #host-pairs.
``pagerank_hosts`` iterates joins/aggs over the HOST-level frames
(#hosts ≪ #pages) with per-round materialization via the dedup
stack's ``_RoundPinner`` (local / reliable / table modes — the
dup_clusters lineage discipline); driver-side traffic is two 1-row
aggregates per round (dangling mass, L1 delta — the changed-count
precedent), never row data.  ``crawl_frontier`` aggregates candidates
map-side on canon_target, anti-joins the URL catalog, broadcasts the
#hosts-bounded rank table, and takes the per-host politeness top-k
with the SKEW-SAFE two-pass ``topk_per_group`` (salted partial top-k,
then a final window over ≤ n_salts·k survivors per host — a hub host
with millions of candidate URLs never sorts in one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cl_readability_spark.functions.urls import (
    _HAS_AUTH,
    _PARTS,
    canonicalize_url,
    url_host,
)

# Explicit whitespace class — Java's \s includes \x0B, RE2's does not;
# the explicit class keeps the Spark pattern and the DuckDB twin's
# byte-identical (the textnorm stance).
_WS = "[ \\t\\n\\r\\f]"

# Anchor elements with a QUOTED href: group 1 = href value, group 2 =
# anchor inner HTML.  (?i) case-fold, (?s) so anchor bodies span
# newlines; lazy body up to the first </a>.
LINK_PATTERN = (
    "(?is)<a" + _WS + "[^>]*?href" + _WS + "*=" + _WS
    + "*[\"']([^\"'>]*)[\"'][^>]*>(.*?)</a" + _WS + "*>"
)

# RFC 3986 scheme prefix (absolute URL test).
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*:"


def resolve_href(base: Column, href: Column) -> Column:
    """The resolution contract above as one codegen expression —
    NULL for self-links and for relative hrefs with no usable base."""
    h = F.trim(F.coalesce(href, F.lit("")))
    b = F.trim(F.coalesce(base, F.lit("")))
    bscheme = F.lower(F.regexp_extract(b, _PARTS, 1))
    has_auth = F.regexp_extract(b, _HAS_AUTH, 1) != ""
    rawauth = F.regexp_extract(b, _PARTS, 2)
    origin = F.concat(bscheme, F.lit("://"), rawauth)
    bpath = F.regexp_extract(b, _PARTS, 3)
    # query-only joins keep the base path VERBATIM (an empty path stays
    # empty — RFC 3986 §5.3, matching urljoin byte-for-byte); relative
    # path joins need a directory, so an empty path means root
    bdir = F.when(bpath == "", F.lit("/")).otherwise(
        F.regexp_replace(bpath, "[^/]*$", "")
    )
    return (
        F.when((h == "") | h.startswith("#"), F.lit(None).cast("string"))
        .when(h.rlike(_SCHEME_RE), h)
        .when((b == "") | ~has_auth, F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(bscheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("?"), F.concat(origin, bpath, h))
        .otherwise(F.concat(origin, bdir, h))
    )


def extract_links(
    df: DataFrame,
    html_col: str = "text",
    base_col: str | None = None,
    keep_schemes: tuple[str, ...] | None = ("http", "https"),
    strip_www: bool = True,
) -> DataFrame:
    """One row per extracted anchor: the input columns plus ``href``
    (raw attribute), ``anchor_text`` (inner HTML with tags stripped and
    whitespace collapsed), ``target_url`` (resolved against
    ``base_col`` per the module contract), ``canon_target``
    (``canonicalize_url`` of the target — the join key against URL
    catalogs), ``src_host`` / ``dst_host``, and ``is_internal``.
    Pages with no anchors produce no rows.  ``keep_schemes`` filters
    resolved targets by scheme (default http/https — mailto:,
    javascript:, data: links are dropped); pass None to keep all."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(LINK_PATTERN), 1)
    bodies = F.regexp_extract_all(F.col(html_col), F.lit(LINK_PATTERN), 2)
    out = df.withColumn(
        "_lnk",
        F.explode(F.arrays_zip(hrefs.alias("href"), bodies.alias("body"))),
    )
    base = F.col(base_col) if base_col is not None else F.lit(None).cast(
        "string"
    )
    target = resolve_href(base, F.col("_lnk.href"))
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_lnk.body"), "(?s)<[^>]*>", " "),
            _WS + "+",
            " ",
        )
    )
    out = (
        out.withColumn("href", F.col("_lnk.href"))
        .withColumn("anchor_text", anchor)
        .withColumn("target_url", target)
        .drop("_lnk")
    )
    if keep_schemes is not None:
        scheme = F.lower(F.regexp_extract(F.col("target_url"), _PARTS, 1))
        out = out.filter(
            F.col("target_url").isNull()
            | scheme.isin(*[s.lower() for s in keep_schemes])
        )
    src_host = url_host(base, strip_www=strip_www)
    dst_host = url_host(F.col("target_url"), strip_www=strip_www)
    return (
        out.withColumn(
            "canon_target",
            canonicalize_url(F.col("target_url"), strip_www=strip_www),
        )
        .withColumn("src_host", src_host)
        .withColumn("dst_host", dst_host)
        .withColumn(
            "is_internal",
            (F.col("dst_host") != "") & (F.col("src_host") == F.col("dst_host")),
        )
    )


def host_edges(
    links: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
    external_only: bool = True,
) -> DataFrame:
    """Host-level edge list from ``extract_links`` output: one row per
    (src_host, dst_host) with the link count as weight.  Rows without
    both hosts carry no graph signal and are excluded;
    ``external_only`` (default) drops self-edges (intra-site
    navigation dominates raw counts and carries no endorsement).  One
    map-side-combinable aggregation — hub hosts collapse before the
    exchange."""
    e = links.filter(
        F.col(src_col).isNotNull()
        & (F.col(src_col) != "")
        & F.col(dst_col).isNotNull()
        & (F.col(dst_col) != "")
    )
    if external_only:
        e = e.filter(F.col(src_col) != F.col(dst_col))
    return e.groupBy(src_col, dst_col).agg(F.count("*").alias(weight_col))


def pagerank_hosts(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float | None = 1e-6,
    checkpoint_mode: str = "local",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over the host graph → ``(host, rank)`` with
    ``sum(rank) = 1`` (the CommonCrawl-style host-centrality signal a
    domain gate or frontier scheduler consumes).  Standard damped
    iteration: ``rank = (1-d)/N + d·(Σ_in rank·w/outw + dangling/N)``;
    dangling (no-outlink) mass redistributes uniformly, so total rank
    is conserved and sinks don't leak score.

    Stops after ``max_iters`` rounds or when the L1 delta between
    consecutive rank vectors drops below ``tol``; ``tol=None`` runs
    EXACTLY ``max_iters`` rounds (the deterministic-round-count mode
    the DuckDB twin and cross-engine tests use).  PageRank contracts
    geometrically (damping factor per round), so a non-converged
    early return is an approximation, never a wrong fixpoint — unlike
    dup_clusters there is no correctness cliff, hence no raise.

    Scale shape: every per-round frame is HOST-cardinality (#hosts ≪
    #pages); each round is one join (edges × ranks on src — host-level
    edge weights bound fan-out) and one map-side-combinable sum on
    dst.  Rounds materialize via ``_RoundPinner`` (``checkpoint_mode``
    = local | reliable | table — same deployment semantics as
    dup_clusters; use ``reliable`` or ``table`` on a real cluster).
    Driver traffic per round: two 1-row aggregates (dangling mass, L1
    delta), never row data.

    Determinism note: ranks are double sums, so the last few ulps vary
    with aggregation order (partial-agg scheduling); comparisons in
    twins/tests round to 9 decimal places."""
    from cl_readability_spark.functions.dedup import _RoundPinner

    spark = edges.sparkSession
    pinner = _RoundPinner(spark, checkpoint_mode, checkpoint_dir)
    try:
        e = edges.select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            F.col(weight_col).cast("double").alias("_w"),
        )
        nodes = (
            e.select(F.col("_src").alias("host"))
            .union(e.select(F.col("_dst").alias("host")))
            .distinct()
        )
        nodes = pinner.pin(nodes, "nodes", persistent=True)
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank", F.lit(0.0))
        outw = e.groupBy("_src").agg(F.sum("_w").alias("_outw"))
        ew = pinner.pin(e.join(outw, "_src"), "edges", persistent=True)
        dangling = pinner.pin(
            nodes.join(
                ew.select(F.col("_src").alias("host")).distinct(),
                "host",
                "left_anti",
            ),
            "dangling",
            persistent=True,
        )
        ranks = pinner.pin(
            nodes.withColumn("rank", F.lit(1.0 / n)), "ranks"
        )
        base = (1.0 - damping) / n
        for _ in range(max_iters):
            dmass = (
                ranks.join(dangling, "host")
                .agg(F.sum("rank"))
                .first()[0]
            )
            dmass = float(dmass or 0.0)
            contrib = ew.join(
                ranks.withColumnRenamed("host", "_src"), "_src"
            ).select(
                F.col("_dst").alias("host"),
                (F.col("rank") * F.col("_w") / F.col("_outw")).alias("_c"),
            )
            sums = contrib.groupBy("host").agg(F.sum("_c").alias("_s"))
            new = pinner.pin(
                nodes.join(sums, "host", "left").select(
                    "host",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("_s"), F.lit(0.0))
                            + F.lit(dmass / n)
                        )
                    ).alias("rank"),
                ),
                "ranks",
            )
            done = False
            if tol is not None:
                delta = (
                    new.join(
                        ranks.select(
                            "host", F.col("rank").alias("_prev")
                        ),
                        "host",
                    )
                    .agg(F.sum(F.abs(F.col("rank") - F.col("_prev"))))
                    .first()[0]
                )
                done = delta is not None and float(delta) < tol
            pinner.end_round()
            ranks = new
            if done:
                break
        return ranks
    finally:
        pinner.restore()


def topk_per_group(
    df: DataFrame,
    group_cols: tuple[str, ...],
    order_by: tuple[Column, ...],
    k: int,
    unique_cols: tuple[str, ...],
    n_salts: int = 16,
    rank_col: str = "rank_in_group",
) -> DataFrame:
    """Skew-safe top-k per group: a salted partial top-k (window over
    (group, hash(unique_cols) % n_salts) — a hot group spreads over
    ``n_salts`` tasks), then the exact top-k over the ≤ n_salts·k
    survivors per group.  The global per-group top-k is a subset of
    the union of per-salt top-ks, so the two-pass result is exact.
    ``order_by`` must totally order rows (include a unique tiebreak)
    or ``rank_col`` is nondeterministic; ``unique_cols`` feed the salt
    hash and must be non-null."""
    from pyspark.sql import Window

    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(n_salts)
    )
    d = df.withColumn("_salt", salt)
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    d = (
        d.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return d.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


def crawl_frontier(
    links: DataFrame,
    fetched: DataFrame | str,
    ranks: DataFrame | None = None,
    k_per_host: int = 100,
    n_salts: int = 16,
    include_internal: bool = True,
) -> DataFrame:
    """The crawl scheduler's next-fetch list: discovered canonical
    URLs not yet in the corpus, scored and capped per host →
    ``(dst_host, canon_target, n_refs, anchor_sample, host_rank,
    rank_in_group)`` with at most ``k_per_host`` rows per host (the
    politeness budget).  Within a host, more-referenced pages first
    (``n_refs`` desc, canon_target asc as the total tiebreak);
    ``host_rank`` (from ``pagerank_hosts``, broadcast — #hosts-bounded)
    lets the scheduler order hosts.

    ``fetched`` is the already-fetched canonical-URL set: a DataFrame
    (its ``canon_url`` — or first — column is the key) or the name of
    a ``write_url_catalog`` table.  Passing the bucketed catalog table
    keeps the anti-join's catalog side exchange-free (the
    incremental-probe layout).

    Scale shape: candidates aggregate map-side on canon_target (a hot
    target collapses per partition); the anti-join is keyed on the
    canonical URL (unique-ish); the per-host cap is the skew-safe
    two-pass ``topk_per_group`` — a hub host never sorts its millions
    of candidates in one task."""
    spark = links.sparkSession
    cand = links.filter(
        F.col("canon_target").isNotNull() & (F.col("dst_host") != "")
    )
    if not include_internal:
        cand = cand.filter(~F.col("is_internal"))
    agg = cand.groupBy("canon_target", "dst_host").agg(
        F.count("*").alias("n_refs"),
        F.min("anchor_text").alias("anchor_sample"),
    )
    if isinstance(fetched, str):
        fetched = spark.table(fetched)
    key = "canon_url" if "canon_url" in fetched.columns else fetched.columns[0]
    fetched_keys = fetched.select(F.col(key).alias("canon_target")).filter(
        F.col("canon_target").isNotNull()
    )
    frontier = agg.join(fetched_keys, "canon_target", "left_anti")
    if ranks is not None:
        r = ranks.select(
            F.col(ranks.columns[0]).alias("dst_host"),
            F.col("rank").alias("host_rank"),
        )
        frontier = frontier.join(F.broadcast(r), "dst_host", "left")
        frontier = frontier.withColumn(
            "host_rank", F.coalesce(F.col("host_rank"), F.lit(0.0))
        )
    else:
        frontier = frontier.withColumn("host_rank", F.lit(0.0))
    return topk_per_group(
        frontier,
        ("dst_host",),
        (F.col("n_refs").desc(), F.col("canon_target").asc()),
        k_per_host,
        unique_cols=("canon_target",),
        n_salts=n_salts,
    )
