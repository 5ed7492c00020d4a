"""DOM layer tests (SURVEY.md §2.1 operators #1-23)."""

import pytest

from cl_readability_spark.core.dom import (
    Element,
    Text,
    TooManyElementsError,
    get_elements_by_tag,
    get_next_node,
    has_ancestor_tag,
    iter_elements,
    parse_html,
    remove_and_get_next,
    set_node_tag,
)


def test_parse_basic_structure():
    doc = parse_html("<html><head><title>T</title></head><body><p>hi</p></body></html>")
    assert doc.html is not None
    assert doc.body is not None
    ps = get_elements_by_tag(doc, "p")
    assert len(ps) == 1
    assert ps[0].text_content() == "hi"


def test_parse_wraps_fragment_in_html_body():
    doc = parse_html("<p>one</p><p>two</p>")
    assert doc.body is not None
    assert [e.tag for e in doc.body.element_children] == ["p", "p"]


def test_title_moved_to_head_on_fragment():
    doc = parse_html("<title>T</title><p>x</p>")
    assert get_elements_by_tag(doc, "title")[0].text_content() == "T"
    assert doc.body.text_content() == "x"


def test_void_elements_do_not_nest():
    doc = parse_html("<body><p>a<br>b<img src='x.png'>c</p></body>")
    p = get_elements_by_tag(doc, "p")[0]
    assert p.text_content() == "abc"
    assert [e.tag for e in p.element_children] == ["br", "img"]


def test_p_implicitly_closed_by_block():
    doc = parse_html("<body><p>a<div>b</div></body>")
    body = doc.body
    tags = [e.tag for e in body.element_children]
    assert tags == ["p", "div"]


def test_li_auto_close():
    doc = parse_html("<ul><li>a<li>b<li>c</ul>")
    ul = get_elements_by_tag(doc, "ul")[0]
    assert [li.text_content() for li in ul.element_children] == ["a", "b", "c"]


def test_table_cells_auto_close():
    doc = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
    assert len(get_elements_by_tag(doc, "tr")) == 2
    assert len(get_elements_by_tag(doc, "td")) == 3


def test_attrs_first_wins_and_valueless():
    doc = parse_html('<div id="a" id="b" hidden>x</div>')
    d = get_elements_by_tag(doc, "div")[0]
    assert d.get("id") == "a"
    assert d.get("hidden") == ""


def test_entities_decoded():
    doc = parse_html("<p>a &amp; b &lt;c&gt; &#8212;</p>")
    assert get_elements_by_tag(doc, "p")[0].text_content() == "a & b <c> —"


def test_comments_dropped():
    doc = parse_html("<div><!-- hidden -->text</div>")
    assert get_elements_by_tag(doc, "div")[0].text_content() == "text"


def test_script_content_raw():
    doc = parse_html("<body><script>if (a < b) {}</script><p>x</p></body>")
    assert len(get_elements_by_tag(doc, "script")) == 1
    assert len(get_elements_by_tag(doc, "p")) == 1


def test_serialize_roundtrip_escaping():
    doc = parse_html('<p class="x&quot;y">a &amp; b</p>')
    p = get_elements_by_tag(doc, "p")[0]
    assert p.serialize() == '<p class="x&quot;y">a &amp; b</p>'


def test_too_many_elements():
    with pytest.raises(TooManyElementsError):
        parse_html("<p>x</p>" * 100, max_elements=10)


def test_mutation_append_replace_detach():
    doc = parse_html("<div><p>a</p><p>b</p></div>")
    d = get_elements_by_tag(doc, "div")[0]
    p_a, p_b = d.element_children
    new = Element("span")
    d.replace_child(new, p_a)
    assert p_a.parent is None
    assert d.element_children[0] is new
    new.append_child(Text("z"))
    p_b.detach()
    assert [e.tag for e in d.element_children] == ["span"]


def test_set_node_tag_keeps_identity_attrs_children():
    doc = parse_html('<div id="d"><em>x</em></div>')
    d = get_elements_by_tag(doc, "div")[0]
    out = set_node_tag(d, "p")
    assert out is d
    assert d.tag == "p"
    assert d.get("id") == "d"
    assert d.element_children[0].tag == "em"


def test_iter_elements_preorder():
    doc = parse_html("<div><p>a<em>b</em></p><span>c</span></div>")
    d = get_elements_by_tag(doc, "div")[0]
    assert [e.tag for e in iter_elements(d)] == ["p", "em", "span"]


def test_get_next_node_traversal():
    doc = parse_html("<div id='a'><p id='b'><em id='c'>x</em></p><span id='d'>y</span></div>")
    a = get_elements_by_tag(doc, "div")[0]
    order = []
    node = a
    while node is not None:
        order.append(node.get("id") or node.tag)
        node = get_next_node(node)
    assert order == ["a", "b", "c", "d"]


def test_remove_and_get_next_skips_subtree():
    doc = parse_html("<div><p id='b'><em>x</em></p><span id='d'>y</span></div>")
    b = get_elements_by_tag(doc, "p")[0]
    nxt = remove_and_get_next(b)
    assert nxt.get("id") == "d"
    assert b.parent is None


def test_has_ancestor_tag_depth():
    doc = parse_html("<table><tr><td><div><p id='x'>t</p></div></td></tr></table>")
    p = get_elements_by_tag(doc, "p")[0]
    assert has_ancestor_tag(p, "table")  # within default depth 3
    assert has_ancestor_tag(p, "table", max_depth=-1)
    assert not has_ancestor_tag(p, "table", max_depth=1)


def test_traversal_survives_pathologically_deep_tree():
    """get_elements_by_tag / text_content recurse on the hot path
    (measured ~1.9x the explicit stack) and must fall back to the
    iterative walk beyond the recursion limit instead of raising."""
    import sys

    from cl_readability_spark.core.dom import Element, Text, get_elements_by_tag

    root = Element("div")
    cur = root
    depth = sys.getrecursionlimit() + 500
    for _ in range(depth):
        nxt = Element("div")
        cur.append_child(nxt)
        cur = nxt
    cur.append_child(Element("p"))
    cur.children[-1].append_child(Text("leaf"))
    ps = get_elements_by_tag(root, "p")
    assert len(ps) == 1
    assert get_elements_by_tag(root, "p", "span") == ps
    assert root.text_content() == "leaf"
