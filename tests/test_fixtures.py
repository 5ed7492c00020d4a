"""Golden end-to-end fixture cases (FIXTURES.md §A): one extraction scenario
per operator trigger, asserted semantically (content kept/stripped, metadata,
status) through the full extract() path."""

import pytest

from cl_readability_spark.core.config import ExtractorConfig
from cl_readability_spark.core.extract import extract
from cl_readability_spark.core.readerable import is_readerable
from cl_readability_spark.pipeline.corpus import make_article_html

LONG_P = (
    "<p>"
    + "Body content sentences with commas, clauses, and length enough to score "
    "well in candidate selection, which keeps this paragraph firmly in the "
    "article. " * 4
    + "</p>"
)


def ok(html, **kw):
    r = extract(html, **kw)
    assert r.status == "ok", (r.status, r.error)
    return r


# --- basic-article ---
def test_basic_article():
    html = (
        "<html lang='en'><head><title>The Basic Article Fixture Title | Site</title></head>"
        f"<body><article id='a'>{LONG_P * 4}</article></body></html>"
    )
    r = ok(html)
    assert r.lang == "en"
    assert "Body content sentences" in r.extracted_text
    assert r.title == "The Basic Article Fixture Title"
    assert r.text_length > 500
    assert r.retries == 0


# --- div-soup: div→p rewrap + nested single-div hoist ---
def test_div_soup():
    inner = "Loose phrasing text with commas, and enough length to be scored as a paragraph, truly. " * 3
    html = (
        "<html><body><div id='outer'><div id='inner'>"
        f"<div>{inner}</div><div>{inner}</div>{LONG_P * 2}"
        "</div></div></body></html>"
    )
    r = ok(html)
    assert "Loose phrasing text" in r.extracted_text
    # leaf divs with no block children were retagged <p>
    assert "<p>" in r.extracted_html


# --- br-runs ---
def test_br_runs():
    seg = "Segment text with commas, structure, and heft enough to be treated as real content. " * 3
    html = f"<html><body><div id='m'>{seg}<br><br>{seg}<br><br>{seg}</div></body></html>"
    r = ok(html)
    assert r.extracted_text.count("Segment text") == 9  # 3 segments × 3 repeats
    assert "<br" not in (r.extracted_html or "")


# --- unlikely-classes stripped; maybe rescued ---
def test_unlikely_classes_stripped():
    html = (
        "<html><body><div id='page'>"
        f"<div class='sidebar'><p>SIDEBAR-JUNK links and noise</p></div>{LONG_P * 3}"
        "<div class='social-share'><p>SHARE-JUNK buttons</p></div>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "SIDEBAR-JUNK" not in r.extracted_text
    assert "SHARE-JUNK" not in r.extracted_text
    assert "Body content" in r.extracted_text


def test_maybe_candidate_rescue():
    # class matches unlikely AND maybe → kept (readability-plump.lisp:216-220)
    html = (
        "<html><body><div id='page'>"
        f"<div class='sidebar-content'><p>RESCUED text, with commas, and more text here to hold weight.</p></div>{LONG_P * 3}"
        "</div></body></html>"
    )
    r = ok(html)
    assert "RESCUED" in r.extracted_text


# --- class-weight flips candidate choice ---
def test_class_weight_flips_candidate():
    para = (
        "<p>Identical paragraph content with commas, weight, and length to make "
        "both containers score the same way, exactly. " * 3 + "</p>"
    )
    html = (
        "<html><body>"
        f"<div id='one' class='article-text'>{para * 3}<p>WINNER marker.</p></div>"
        f"<div id='two' class='widget-box'>{para * 3}<p>LOSER marker.</p></div>"
        "</body></html>"
    )
    r = ok(html)
    assert "WINNER" in r.extracted_text
    assert "LOSER" not in r.extracted_text


# --- link-density ---
def test_link_density_rejects_nav_heavy_block():
    links = "".join(f"<a href='/l/{i}'>navigation link number {i} with text</a> " for i in range(30))
    html = (
        "<html><body><div id='page'>"
        f"<div id='nav2'><p>{links}</p></div>{LONG_P * 3}"
        "</div></body></html>"
    )
    r = ok(html)
    assert "navigation link number" not in r.extracted_text


# --- clean-conditional: fishy table/ul/div removal ---
def test_clean_conditional_removes_fishy_list():
    # negative class ("tags") → weight −25 < 0 → removed (JS weight clause;
    # pure link-density does NOT remove lists — the !isList guard)
    lis = "".join(f"<li><a href='/t/{i}'>tag {i}</a></li>" for i in range(25))
    html = (
        "<html><body><div id='page'>"
        f"{LONG_P * 3}<ul class='tags'>{lis}</ul>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "tag 3" not in r.extracted_text


def test_clean_conditional_removes_link_heavy_div_block():
    links = "".join(f"<a href='/t/{i}'>item {i}</a> " for i in range(25))
    html = (
        "<html><body><div id='page'>"
        f"{LONG_P * 3}<div id='promo2'><p>{links}</p></div>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "item 3" not in r.extracted_text  # linkDensity > 0.2, weight < 25


# --- video-embed-kept ---
def test_video_embed_kept():
    html = (
        "<html><body><div id='page'>"
        f"{LONG_P * 3}"
        "<iframe src='https://www.youtube.com/embed/abc123'></iframe>"
        "<iframe src='https://tracker.example.net/pixel'></iframe>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "youtube.com/embed/abc123" in r.extracted_html
    assert "tracker.example.net" not in r.extracted_html


# --- noscript-img ---
def test_noscript_img_unwrap():
    html = (
        "<html><body><div id='page'>"
        "<img src='spinner.gif' class='lazyload'>"
        "<noscript><img src='hero-image.jpg'></noscript>"
        f"{LONG_P * 3}</div></body></html>"
    )
    r = ok(html)
    assert ' src="hero-image.jpg"' in r.extracted_html
    # the old src survives only as data-old-src (JS attr preservation)
    assert ' src="spinner.gif"' not in r.extracted_html
    assert 'data-old-src="spinner.gif"' in r.extracted_html


# --- relative-urls ---
def test_relative_urls_absolutized():
    html = (
        "<html><body><div id='page'>"
        f"{LONG_P * 3}<p>See <a href='/other/page'>the other page</a> and "
        "<img src='pics/photo.jpg'> inline.</p>"
        "</div></body></html>"
    )
    r = ok(html, url="https://news.example.com/articles/today.html")
    assert 'href="https://news.example.com/other/page"' in r.extracted_html
    assert 'src="https://news.example.com/articles/pics/photo.jpg"' in r.extracted_html


# --- titles (three branches) ---
def test_title_pipe_branch():
    html = (
        "<html><head><title>Five Word Article Title Here | Long Site Name</title></head>"
        f"<body><div>{LONG_P * 3}</div></body></html>"
    )
    assert ok(html).title == "Five Word Article Title Here"


def test_title_colon_branch():
    html = (
        "<html><head><title>Site Name: Seven Word Article Title Goes Right Here</title></head>"
        f"<body><div>{LONG_P * 3}</div></body></html>"
    )
    assert ok(html).title == "Seven Word Article Title Goes Right Here"


def test_title_h1_fallback():
    html = (
        "<html><head><title>Shorty</title></head>"
        f"<body><div><h1>A Completely Different Long Heading For This</h1>{LONG_P * 3}</div></body></html>"
    )
    assert ok(html).title == "A Completely Different Long Heading For This"


# --- byline ---
def test_byline_rel_author():
    html = (
        "<html><body><div id='page'>"
        "<span rel='author'>Alice B. Charles</span>"
        f"{LONG_P * 3}</div></body></html>"
    )
    r = ok(html)
    assert r.byline == "Alice B. Charles"


# --- short-article-retry ---
def test_short_article_retry():
    html = (
        "<html><body><div class='comment'>"  # unlikely: stripped on attempt 1
        "<p>Short real content, under the five hundred character threshold, sadly.</p>"
        "</div></body></html>"
    )
    r = ok(html)
    assert r.retries >= 1
    assert "Short real content" in r.extracted_text


# --- not-readerable ---
def test_not_readerable():
    html = "<html><body>" + "<p>tiny</p>" * 30 + "</body></html>"
    assert not is_readerable(html)


def test_readerable_true_on_fixture_article():
    assert is_readerable(make_article_html(7, n_paragraphs=6))


# --- too-many-elements ---
def test_too_many_elements_status():
    html = "<html><body>" + "<p>x</p>" * 500 + "</body></html>"
    r = extract(html, config=ExtractorConfig(max_elements=100))
    assert r.status == "too_many_elements"
    assert r.extracted_text is None


# --- single-cell-table ---
def test_single_cell_table_unwrapped():
    html = (
        "<html><body><div id='page'>"
        f"<table><tr><td>{LONG_P}</td></tr></table>{LONG_P * 2}"
        "</div></body></html>"
    )
    r = ok(html)
    assert "<table" not in r.extracted_html
    assert r.extracted_text.count("Body content") >= 3


# --- hidden-content ---
def test_hidden_content_stripped():
    html = (
        "<html><body><div id='page'>"
        "<div style='display: none'><p>HIDDEN-STYLE text</p></div>"
        "<div hidden><p>HIDDEN-ATTR text</p></div>"
        "<div aria-hidden='true'><p>HIDDEN-ARIA text</p></div>"
        f"{LONG_P * 3}</div></body></html>"
    )
    r = ok(html)
    for marker in ("HIDDEN-STYLE", "HIDDEN-ATTR", "HIDDEN-ARIA"):
        assert marker not in r.extracted_text


# --- corpus generator sanity: extraction recovers article, strips boilerplate ---
def test_corpus_article_extraction():
    html = make_article_html(123, n_paragraphs=8)
    r = ok(html)
    assert "Section 0" not in r.extracted_text  # nav stripped
    assert "related 0" not in r.extracted_text  # sidebar stripped
    assert "Copyright" not in r.extracted_text  # footer stripped
    assert r.text_length > 500


def test_corpus_determinism():
    a = make_article_html(55, n_paragraphs=4)
    b = make_article_html(55, n_paragraphs=4)
    assert a == b
    ra, rb = extract(a), extract(b)
    assert ra.extracted_text == rb.extracted_text
    assert ra.content_spans == rb.content_spans
