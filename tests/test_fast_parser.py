"""Differential test: the fast tokenizer path must produce byte-identical
trees to the stdlib html.parser path on every input — corpus documents,
golden fixtures, targeted constructs, and fuzzed HTML-ish strings."""

import os
import string

import pytest
from hypothesis import given, settings, strategies as st

import cl_readability_spark.core.dom as dom_mod
from cl_readability_spark.core.dom import parse_html
from cl_readability_spark.pipeline.corpus import build_transcript_rows


def both_parses(html):
    dom_mod.USE_FAST_PARSER = True
    try:
        fast = parse_html(html).serialize()
    finally:
        dom_mod.USE_FAST_PARSER = True
    dom_mod.USE_FAST_PARSER = False
    try:
        std = parse_html(html).serialize()
    finally:
        dom_mod.USE_FAST_PARSER = True
    return fast, std


def assert_equivalent(html):
    fast, std = both_parses(html)
    assert fast == std, html[:400]


def test_corpus_documents_identical():
    docs = [r[3] for r in build_transcript_rows(25, seed=42)]
    for d in docs:
        assert_equivalent(d)


def test_golden_sources_identical():
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    for case in sorted(os.listdir(fixtures)):
        src = os.path.join(fixtures, case, "source.html")
        if os.path.exists(src):
            with open(src) as f:
                assert_equivalent(f.read())


TARGETED = [
    "",
    "plain text only",
    "<p>a &amp; b &lt;c&gt; &#8212; &nbsp;</p>",
    '<a href="x?a=1&amp;b=2">q</a>',
    "<a href='x&notin'>entity-in-attr</a>",
    "<div a=1 b='2' c=\"3\" d>mixed attrs</div>",
    "<br/><img src='x'/><hr />",
    "<script>if (a < b && c > d) {}</script><p>x</p>",
    "<script>var s = '</div>';</script>",
    "<style>p > a { color: red }</style>",
    "<SCRIPT>UPPER</SCRIPT>",
    "<!-- comment --><p>x</p>",
    "<!-- multi\nline -- comment --><p>x</p>",
    "<!doctype html><p>x</p>",
    "<?php echo ?><p>x</p>",
    "<p>unclosed",
    "</stray><p>x</p>",
    "<p>a<div>implicit p close</div>",
    "<ul><li>a<li>b</ul>",
    "<table><tr><td>a<td>b</table>",
    "<div  spaced   attrs  = 'v' >x</div>",
    "<p>trailing text",
    "text < notatag >still text</p>",
    "<p>a</p >space in close</p>",
    "<div class='q\"inside'>quotes</div>",
    '<div title="it\'s">apos</div>',
    "<img src=x.png alt=hello>",
    "<img src=x.png/>",  # stdlib folds '/' into value — must bail & agree
    "<foo:bar>ns tag</foo:bar>",
    "<![CDATA[raw]]><p>x</p>",
    "<script>never closed",
    "<div><p>𝓊𝓃𝒾𝒸ℴ𝒹ℯ ☃</p></div>",
    "<p>&bogus; &amp broken entities &#x1F600;</p>",
    "<div a=&amp;b>entity unquoted</div>",
]


@pytest.mark.parametrize("idx", range(len(TARGETED)))
def test_targeted_constructs(idx):
    assert_equivalent(TARGETED[idx])


TAGS = ["div", "p", "span", "a", "b", "br", "img", "script", "style", "table", "li"]
text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " .,<>&\"'/=!-;#",
    max_size=60,
)


@st.composite
def html_ish(draw, depth=0):
    if depth > 3:
        return draw(text_strategy)
    parts = []
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(text_strategy))
        elif kind == 1:
            tag = draw(st.sampled_from(TAGS))
            attr = ""
            if draw(st.booleans()):
                attr = f' class="{draw(text_strategy)}"'
            parts.append(f"<{tag}{attr}>{draw(html_ish(depth=depth + 1))}</{tag}>")
        elif kind == 2:
            parts.append(f"<{draw(st.sampled_from(TAGS))}")
        else:
            parts.append(f"<!-- {draw(text_strategy)} -->")
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(html_ish())
def test_fuzzed_equivalence(html):
    assert_equivalent(html)


def test_max_elements_enforced_on_fast_path():
    from cl_readability_spark.core.dom import TooManyElementsError

    with pytest.raises(TooManyElementsError):
        parse_html("<p>x</p>" * 100, max_elements=10)
