"""Link extraction, host graph, PageRank, and crawl frontier
(functions/links.py): python-mirror differentials over randomized
HTML, urljoin agreement on clean inputs, a numpy PageRank reference,
skew-safe top-k equivalence, and plan goldens."""

import random
import re
from collections import defaultdict
from urllib.parse import urljoin

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from cl_readability_spark.functions.links import (
    LINK_PATTERN,
    crawl_frontier,
    extract_links,
    host_edges,
    pagerank_hosts,
    resolve_href,
    topk_per_group,
)

# ---------------------------------------------------------------------------
# python mirror of the documented resolution contract (tests only)

_PARTS_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?"
)
_HAS_AUTH_RE = re.compile(r"^(?:[^:/?#]+:)?(//)")


def mirror_resolve(base, href):
    h = (href or "").strip()
    if h == "" or h.startswith("#"):
        return None
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", h):
        return h
    b = (base or "").strip()
    if b == "" or not _HAS_AUTH_RE.match(b):
        return None
    m = _PARTS_RE.match(b)
    scheme = (m.group(1) or "").lower()
    rawauth = m.group(2) or ""
    origin = f"{scheme}://{rawauth}"
    bpath = m.group(3) or ""
    bdir = "/" if bpath == "" else re.sub(r"[^/]*$", "", bpath)
    if h.startswith("//"):
        return f"{scheme}:{h}"
    if h.startswith("/"):
        return origin + h
    if h.startswith("?"):
        return origin + bpath + h
    return origin + bdir + h


def mirror_links(html):
    return re.findall(LINK_PATTERN, html or "")


def mirror_anchor(body):
    t = re.sub(r"(?s)<[^>]*>", " ", body)
    return re.sub(r"[ \t\n\r\f]+", " ", t).strip()


# ---------------------------------------------------------------------------


def test_extract_links_authored_cases(spark):
    base = "http://www.Ex.com/dir/page.html?x=1"
    html = (
        '<p>intro <a href="http://other.com/a?utm_source=t&b=1">Abs '
        "<b>bold</b></a></p>"
        "<a href='//cdn.ex.com/lib.js'>proto-rel</a>"
        '<A HREF="/root/x">Root</A>'
        '<a class="c" href="sub/y.html">rel</a>'
        '<a href="?page=2">query only</a>'
        '<a href="#frag">self</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="">empty</a>'
        "<a name='no-href'>skip</a>"
    )
    df = spark.createDataFrame([Row(doc_id=1, text=html, url=base)])
    out = extract_links(df, html_col="text", base_col="url").orderBy("href")
    rows = {r["href"]: r for r in out.collect()}
    # mailto filtered by default scheme filter; no-href anchor skipped
    assert set(rows) == {
        "http://other.com/a?utm_source=t&b=1",
        "//cdn.ex.com/lib.js",
        "/root/x",
        "sub/y.html",
        "?page=2",
        "#frag",
        "",
    }
    r = rows["http://other.com/a?utm_source=t&b=1"]
    assert r["target_url"] == "http://other.com/a?utm_source=t&b=1"
    assert r["canon_target"] == "http://other.com/a?b=1"  # tracking gone
    assert r["anchor_text"] == "Abs bold"
    assert r["dst_host"] == "other.com" and r["src_host"] == "ex.com"
    assert not r["is_internal"]
    assert rows["//cdn.ex.com/lib.js"]["target_url"] == (
        "http://cdn.ex.com/lib.js"
    )
    assert rows["/root/x"]["target_url"] == "http://www.Ex.com/root/x"
    assert rows["/root/x"]["is_internal"]
    assert rows["sub/y.html"]["target_url"] == (
        "http://www.Ex.com/dir/sub/y.html"
    )
    assert rows["?page=2"]["target_url"] == (
        "http://www.Ex.com/dir/page.html?page=2"
    )
    assert rows["#frag"]["target_url"] is None
    assert rows[""]["target_url"] is None


def test_extract_links_no_base_and_no_links(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text='<a href="/x">rel</a><a href="http://a.b/c">abs</a>'),
            Row(doc_id=2, text="<p>no links at all</p>"),
            Row(doc_id=3, text=None),
        ]
    )
    out = extract_links(df, html_col="text").collect()
    # linkless / NULL pages yield no rows; relative href with no base
    # resolves NULL but the row is still emitted (raw href preserved)
    assert {r["doc_id"] for r in out} == {1}
    by_href = {r["href"]: r for r in out}
    assert by_href["/x"]["target_url"] is None
    assert by_href["http://a.b/c"]["target_url"] == "http://a.b/c"


def test_extract_links_matches_python_mirror(spark):
    rng = random.Random(7)
    hosts = ["alpha.com", "www.Beta.org", "g.co"]
    href_pool = [
        "http://x.y/p?b=2&a=1",
        "HTTPS://Z.example/Q",
        "//cdn.net/a.js",
        "/abs/path",
        "rel/p.html",
        "?q=2",
        "#top",
        "",
        "mailto:x@y.z",
        "javascript:void(0)",
        "../up/one.html",
    ]
    rows = []
    for i in range(60):
        base = (
            None
            if i % 10 == 0
            else f"http://{rng.choice(hosts)}/d{i % 5}/p{i}.html"
        )
        n = rng.randint(0, 5)
        parts = []
        for j in range(n):
            href = rng.choice(href_pool)
            body = rng.choice(
                ["plain", "<b>deep <i>x</i></b>", "  spaced\n\ttext ", ""]
            )
            q = rng.choice(['"', "'"])
            parts.append(
                f"<p>f{j}</p><a data-x='1' href={q}{href}{q} rel=nofollow>"
                f"{body}</a>"
            )
        rows.append(Row(doc_id=i, text="".join(parts), url=base))
    df = spark.createDataFrame(rows)
    got = (
        extract_links(df, html_col="text", base_col="url", keep_schemes=None)
        .select("doc_id", "href", "anchor_text", "target_url")
        .collect()
    )
    got_set = sorted(
        (r["doc_id"], r["href"], r["anchor_text"], r["target_url"])
        for r in got
    )
    want = []
    for r in rows:
        for href, body in mirror_links(r.text):
            want.append(
                (
                    r.doc_id,
                    href,
                    mirror_anchor(body),
                    mirror_resolve(r.url, href),
                )
            )
    assert got_set == sorted(want)


def test_resolve_matches_urljoin_on_clean_inputs(spark):
    """On hrefs without dot segments or fragments, the column resolver
    agrees byte-for-byte with urllib's RFC 3986 urljoin."""
    bases = [
        "http://ex.com/a/b/c.html",
        "https://u:p@host.org:8443/x/",
        "http://ex.com",
        "http://ex.com/?q=1",
    ]
    hrefs = [
        "http://o.net/z",
        "//cdn.o.net/z",
        "/rooted",
        "sub/page.html",
        "file.txt",
        "?page=2",
    ]
    rows = [
        Row(i=i, base=b, href=h)
        for i, (b, h) in enumerate(
            (b, h) for b in bases for h in hrefs
        )
    ]
    df = spark.createDataFrame(rows)
    out = df.withColumn(
        "resolved", resolve_href(F.col("base"), F.col("href"))
    ).collect()
    for r in out:
        assert r["resolved"] == urljoin(r["base"], r["href"]), (
            r["base"],
            r["href"],
            r["resolved"],
        )


def test_extract_links_plan_shuffle_free_no_python(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text='<a href="/x">t</a>', url="http://a.b/c")]
    )
    out = extract_links(df, html_col="text", base_col="url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "MapInPandas" not in plan
    assert "Generate explode" in plan  # the one explode


def test_host_edges_counts(spark):
    rows = [
        Row(src_host="a.com", dst_host="b.com"),
        Row(src_host="a.com", dst_host="b.com"),
        Row(src_host="a.com", dst_host="a.com"),  # self edge
        Row(src_host="b.com", dst_host="c.com"),
        Row(src_host="", dst_host="c.com"),  # no src host
        Row(src_host="d.com", dst_host=None),
    ]
    e = host_edges(spark.createDataFrame(rows))
    got = {(r["src_host"], r["dst_host"]): r["n_links"] for r in e.collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "c.com"): 1}
    with_self = host_edges(
        spark.createDataFrame(rows), external_only=False
    )
    got2 = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in with_self.collect()
    }
    assert got2[("a.com", "a.com")] == 1


def _ref_pagerank(edges, d, iters):
    hosts = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    outw = defaultdict(float)
    for s, _, w in edges:
        outw[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = sum(r[idx[h]] for h in hosts if h not in outw)
        new = np.full(n, (1 - d) / n) + d * dang / n
        for s, t, w in edges:
            new[idx[t]] += d * r[idx[s]] * w / outw[s]
        r = new
    return {h: r[idx[h]] for h in hosts}


@pytest.mark.parametrize("seed", [3, 11])
def test_pagerank_matches_numpy_reference(spark, seed):
    rng = random.Random(seed)
    hosts = [f"h{i}.com" for i in range(9)]
    edges = set()
    for _ in range(18):
        s, t = rng.sample(hosts, 2)
        edges.add((s, t, float(rng.randint(1, 5))))
    # force a dangling node: strip all out-edges of h8
    edges = {(s, t, w) for (s, t, w) in edges if s != "h8.com"}
    edges.add(("h0.com", "h8.com", 2.0))  # keep it reachable
    e = spark.createDataFrame(
        [Row(src_host=s, dst_host=t, n_links=w) for s, t, w in edges]
    )
    got = {
        r["host"]: r["rank"]
        for r in pagerank_hosts(e, max_iters=12, tol=None).collect()
    }
    want = _ref_pagerank(sorted(edges), 0.85, 12)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-9), h
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_converges_and_table_mode(spark, tmp_path):
    # star: everyone links to hub; hub links to s0
    rows = [Row(src_host=f"s{i}.com", dst_host="hub.com", n_links=1)
            for i in range(5)]
    rows.append(Row(src_host="hub.com", dst_host="s0.com", n_links=1))
    e = spark.createDataFrame(rows)
    ranks = pagerank_hosts(
        e,
        max_iters=50,
        tol=1e-12,
        checkpoint_mode="table",
        checkpoint_dir=str(tmp_path),
    ).collect()
    by = {r["host"]: r["rank"] for r in ranks}
    assert by["hub.com"] == max(by.values())
    assert by["s0.com"] > by["s1.com"]  # hub endorses s0
    assert sum(by.values()) == pytest.approx(1.0, abs=1e-9)


def test_topk_per_group_matches_naive(spark):
    rng = random.Random(5)
    rows = [
        Row(
            g=f"g{rng.randint(0, 3)}",
            uid=f"u{i}",
            score=rng.randint(0, 20),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    order = (F.col("score").desc(), F.col("uid").asc())
    got = topk_per_group(
        df, ("g",), order, 7, unique_cols=("uid",), n_salts=4
    )
    got_set = {(r["g"], r["uid"], r["rank_in_group"]) for r in got.collect()}
    # naive reference
    want = set()
    per = defaultdict(list)
    for r in rows:
        per[r.g].append(r)
    for g, rs in per.items():
        rs.sort(key=lambda r: (-r.score, r.uid))
        for i, r in enumerate(rs[:7]):
            want.add((g, r.uid, i + 1))
    assert got_set == want


def test_crawl_frontier_end_to_end(spark):
    link_rows = []
    # 3 pages on a.com each referenced by distinct sources; p1 fetched
    for i, n_refs in [(1, 3), (2, 2), (3, 1)]:
        for j in range(n_refs):
            link_rows.append(
                Row(
                    canon_target=f"http://a.com/p{i}",
                    dst_host="a.com",
                    anchor_text=f"anchor {i}-{j}",
                    is_internal=False,
                )
            )
    link_rows.append(
        Row(
            canon_target="http://b.com/only",
            dst_host="b.com",
            anchor_text="b",
            is_internal=False,
        )
    )
    link_rows.append(
        Row(canon_target=None, dst_host="", anchor_text="x",
            is_internal=False)
    )
    links = spark.createDataFrame(link_rows)
    fetched = spark.createDataFrame(
        [Row(canon_url="http://a.com/p1")]
    )
    ranks = spark.createDataFrame(
        [Row(host="a.com", rank=0.7), Row(host="b.com", rank=0.3)]
    )
    out = crawl_frontier(
        links, fetched, ranks=ranks, k_per_host=1
    ).collect()
    by_host = {r["dst_host"]: r for r in out}
    # p1 fetched; per-host cap 1 keeps the most-referenced unfetched: p2
    assert set(by_host) == {"a.com", "b.com"}
    a = by_host["a.com"]
    assert a["canon_target"] == "http://a.com/p2"
    assert a["n_refs"] == 2 and a["rank_in_group"] == 1
    assert a["host_rank"] == pytest.approx(0.7)
    assert by_host["b.com"]["host_rank"] == pytest.approx(0.3)


def test_crawl_frontier_broadcasts_ranks(spark):
    links = spark.createDataFrame(
        [
            Row(
                canon_target="http://a.com/p",
                dst_host="a.com",
                anchor_text="t",
                is_internal=False,
            )
        ]
    )
    fetched = spark.createDataFrame([Row(canon_url="http://z.com/q")])
    ranks = spark.createDataFrame([Row(host="a.com", rank=1.0)])
    out = crawl_frontier(links, fetched, ranks=ranks, k_per_host=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:3000]
