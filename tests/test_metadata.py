"""JSON-LD + meta-tag metadata tests (SURVEY §2.5 #59 — implemented from
the Readability.js semantics the reference TODOs cite)."""

import pytest

from cl_readability_spark.core.extract import extract

LONG_P = (
    "<p>"
    + "Body content sentences with commas, clauses, and length enough to score "
    "well in candidate selection, which keeps this paragraph firmly here. " * 4
    + "</p>"
)
BODY = f"<div id='page'>{LONG_P * 3}</div>"


def test_json_ld_metadata():
    html = (
        "<html><head><title>Fallback Title Words Here</title>"
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@type": "NewsArticle",'
        ' "name": "The JSON-LD Headline Of Record",'
        ' "author": {"@type": "Person", "name": "Jo Writer"},'
        ' "description": "A structured-data description.",'
        ' "publisher": {"@type": "Organization", "name": "Example News"},'
        ' "datePublished": "2024-05-01T10:00:00Z"}'
        f"</script></head><body>{BODY}</body></html>"
    )
    r = extract(html)
    assert r.status == "ok"
    assert r.title == "The JSON-LD Headline Of Record"
    assert r.byline == "Jo Writer"
    assert r.excerpt == "A structured-data description."
    assert r.site_name == "Example News"
    assert r.published_time == "2024-05-01T10:00:00Z"


def test_json_ld_author_list():
    html = (
        "<html><head>"
        '<script type="application/ld+json">'
        '{"@context": "http://schema.org", "@type": "Article",'
        ' "headline": "Multi Author Piece Headline Words",'
        ' "author": [{"name": "A. One"}, {"name": "B. Two"}]}'
        f"</script></head><body>{BODY}</body></html>"
    )
    r = extract(html)
    assert r.byline == "A. One, B. Two"
    assert r.title == "Multi Author Piece Headline Words"


def test_json_ld_graph_form():
    html = (
        "<html><head>"
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@graph": ['
        '{"@type": "WebSite", "name": "site"},'
        '{"@type": "BlogPosting", "headline": "Graph Located Blog Headline"}]}'
        f"</script></head><body>{BODY}</body></html>"
    )
    assert extract(html).title == "Graph Located Blog Headline"


def test_json_ld_non_article_ignored():
    html = (
        "<html><head><title>The Doc Title Is Used Instead</title>"
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@type": "Recipe", "name": "Soup"}'
        f"</script></head><body>{BODY}</body></html>"
    )
    assert extract(html).title == "The Doc Title Is Used Instead"


def test_json_ld_malformed_ignored():
    html = (
        "<html><head><title>Doc Title Survives Broken JSON</title>"
        '<script type="application/ld+json">{not valid json]</script>'
        f"</head><body>{BODY}</body></html>"
    )
    r = extract(html)
    assert r.status == "ok"
    assert r.title == "Doc Title Survives Broken JSON"


def test_meta_og_and_twitter_tags():
    html = (
        "<html><head><title>Plain Doc Title Goes Unused</title>"
        '<meta property="og:title" content="The OpenGraph Title Of This Page">'
        '<meta name="author" content="Meta Author">'
        '<meta property="og:description" content="OG description text.">'
        '<meta property="og:site_name" content="OG Site">'
        '<meta property="article:published_time" content="2023-11-11">'
        f"</head><body>{BODY}</body></html>"
    )
    r = extract(html)
    assert r.title == "The OpenGraph Title Of This Page"
    assert r.byline == "Meta Author"
    assert r.excerpt == "OG description text."
    assert r.site_name == "OG Site"
    assert r.published_time == "2023-11-11"


def test_meta_dc_priority_over_og_title():
    html = (
        "<html><head>"
        '<meta property="og:title" content="OG Title Of The Page Here">'
        '<meta name="dc:title" content="Dublin Core Title Wins Here">'
        f"</head><body>{BODY}</body></html>"
    )
    assert extract(html).title == "Dublin Core Title Wins Here"


def test_article_author_url_rejected():
    html = (
        "<html><head>"
        '<meta property="article:author" content="https://example.com/author/jo">'
        f"</head><body>{BODY}</body></html>"
    )
    assert extract(html).byline is None


def test_json_ld_beats_meta():
    html = (
        "<html><head>"
        '<meta property="og:title" content="The Meta Title Words Here">'
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@type": "Article",'
        ' "name": "The Structured Data Title Words"}'
        f"</script></head><body>{BODY}</body></html>"
    )
    assert extract(html).title == "The Structured Data Title Words"


def test_excerpt_falls_back_to_first_paragraph():
    html = f"<html><body>{BODY}</body></html>"
    r = extract(html)
    assert r.excerpt is not None
    assert r.excerpt.startswith("Body content sentences")


def test_dc_dot_variant_normalized():
    html = (
        "<html><head>"
        '<meta name="DC.title" content="Dotted Dublin Core Title Here">'
        f"</head><body>{BODY}</body></html>"
    )
    assert extract(html).title == "Dotted Dublin Core Title Here"


def test_article_dir_from_ancestors():
    html = f"<html dir='ltr'><body><div id='m'>{BODY}</div></body></html>"
    assert extract(html).dir == "ltr"
    html2 = f"<html><body><div id='m' dir='rtl'>{BODY}</div></body></html>"
    assert extract(html2).dir == "rtl"
    assert extract(f"<html><body>{BODY}</body></html>").dir is None
