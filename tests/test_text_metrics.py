"""Scoring-signal tests with the exact reference constants (SURVEY §2.2)."""

import pytest

from cl_readability_spark.core.dom import get_elements_by_tag, parse_html
from cl_readability_spark.core.text import (
    get_class_weight,
    get_inner_text,
    get_link_density,
    get_text_density,
    has_child_block_element,
    has_single_tag_inside,
    is_element_without_content,
    is_phrasing_content,
    is_probably_visible,
    is_single_image,
    is_video_embed,
    is_whitespace,
    text_similarity,
    word_count,
)


def first(html, tag):
    return get_elements_by_tag(parse_html(html), tag)[0]


def test_get_inner_text_normalizes_whitespace():
    p = first("<p>  a   b\n\n c </p>", "p")
    assert get_inner_text(p) == "a b c"
    assert get_inner_text(p, normalize_spaces=False) == "a   b\n\n c"


def test_word_count():
    assert word_count("one two  three") == 3


# link-density: Σ len(a)·coeff ÷ len(total); '#' href coeff = 0.3
# (readability.lisp:408-423)
def test_link_density_plain_link():
    div = first("<div><a href='/x'>12345</a>56789</div>", "div")
    assert get_link_density(div) == pytest.approx(0.5)


def test_link_density_hash_discount():
    div = first("<div><a href='#frag'>12345</a>56789</div>", "div")
    assert get_link_density(div) == pytest.approx(0.15)


def test_link_density_empty_href_no_crash():
    # the ref errors on empty href (readability.lisp:412-418) — we guard
    div = first("<div><a href=''>12345</a>56789</div>", "div")
    assert get_link_density(div) == pytest.approx(0.5)


def test_link_density_no_text():
    div = first("<div></div>", "div")
    assert get_link_density(div) == 0.0


# class-weight ±25 (readability.lisp:425-440), case-insensitive per JS
@pytest.mark.parametrize(
    "html,expected",
    [
        ('<div class="article">x</div>', 25),
        ('<div class="sidebar">x</div>', -25),
        ('<div class="Article" id="Sidebar">x</div>', 0),
        ('<div class="article" id="main-content">x</div>', 50),
        ('<div class="comment sidebar">x</div>', -25),
        ("<div>x</div>", 0),
    ],
)
def test_class_weight(html, expected):
    assert get_class_weight(first(html, "div")) == expected


def test_class_weight_flag_off():
    assert get_class_weight(first('<div class="article">x</div>', "div"), False) == 0


def test_phrasing_content():
    doc = parse_html("<div><b>b</b><a><em>x</em></a><a><p>y</p></a><table></table>t</div>")
    div = get_elements_by_tag(doc, "div")[0]
    b, a1, a2, table = div.element_children
    assert is_phrasing_content(b)
    assert is_phrasing_content(a1)  # a with all-phrasing children
    assert not is_phrasing_content(a2)  # a containing a <p>
    assert not is_phrasing_content(table)
    assert is_phrasing_content(div.children[-1])  # text node


def test_is_whitespace():
    doc = parse_html("<div> <br>x</div>")
    div = get_elements_by_tag(doc, "div")[0]
    assert is_whitespace(div.children[0])  # space text
    assert is_whitespace(div.children[1])  # br
    assert not is_whitespace(div.children[2])


def test_element_without_content():
    assert is_element_without_content(first("<div>  <br><hr> </div>", "div"))
    assert not is_element_without_content(first("<div>text</div>", "div"))
    assert not is_element_without_content(first("<div><p></p></div>", "div"))


def test_has_single_tag_inside():
    assert has_single_tag_inside(first("<div><p>x</p></div>", "div"), "p")
    assert not has_single_tag_inside(first("<div><p>x</p><p>y</p></div>", "div"), "p")
    assert not has_single_tag_inside(first("<div>stray<p>x</p></div>", "div"), "p")


def test_has_child_block_element():
    assert has_child_block_element(first("<div><span><p>x</p></span></div>", "div"))
    assert not has_child_block_element(first("<div><span>x</span></div>", "div"))


def test_is_video_embed():
    assert is_video_embed(
        first('<iframe src="https://www.youtube.com/embed/x"></iframe>', "iframe")
    )
    assert is_video_embed(
        first('<iframe src="https://player.vimeo.com/video/1"></iframe>', "iframe")
    )
    assert not is_video_embed(first('<iframe src="https://ads.example.com"></iframe>', "iframe"))


def test_is_single_image():
    assert is_single_image(first("<div><img src='a.png'/></div>", "div"))
    assert is_single_image(first("<div><span><img src='a.png'/></span></div>", "div"))
    assert not is_single_image(first("<div>text<img src='a.png'/></div>", "div"))


# visibility follows JS _isProbablyVisible (ref bug fixed, SURVEY §2.9)
@pytest.mark.parametrize(
    "html,visible",
    [
        ("<div>x</div>", True),
        ('<div style="display: none">x</div>', False),
        ('<div style="display:none">x</div>', False),
        ('<div style="visibility: hidden">x</div>', False),
        ("<div hidden>x</div>", False),
        ('<div aria-hidden="true">x</div>', False),
        ('<div aria-hidden="true" class="fallback-image">x</div>', True),
        ('<div class="anything">x</div>', True),  # ref bug would say invisible
        ('<div style="color: red">x</div>', True),
    ],
)
def test_is_probably_visible(html, visible):
    assert is_probably_visible(first(html, "div")) is visible


def test_text_similarity():
    assert text_similarity("My Great Article", "My Great Article") == pytest.approx(1.0)
    assert text_similarity("My Great Article Site", "My Great Article") == pytest.approx(1.0)
    assert text_similarity("alpha beta", "gamma delta") == pytest.approx(0.0)
    assert text_similarity("one two three four", "one two five") > 0.5


def test_text_density():
    div = first("<div><h2>abcde</h2>abcde</div>", "div")
    assert get_text_density(div, ("h1", "h2")) == pytest.approx(0.5)


def test_has_single_tag_inside_hascontent_quirk():
    # JS REGEXPS.hasContent = /\S$/: a text node ending in whitespace does
    # NOT count as content (parity quirk)
    assert has_single_tag_inside(first("<div>text <p>x</p></div>", "div"), "p")
    assert not has_single_tag_inside(first("<div><p>x</p>text</div>", "div"), "p")


def test_element_without_content_descendant_br():
    # JS counts descendant br/hr vs direct children
    assert is_element_without_content(first("<div><div><br></div></div>", "div"))
    assert not is_element_without_content(first("<div><div><span></span></div></div>", "div"))
