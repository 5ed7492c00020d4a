"""Targeted tests for the less-trodden grab-article/prep paths: share-element
cleanup, lazy-image fixing, role-based removal, aria-modal dialogs,
alternative-ancestor consensus and parent-climb, data-table end-to-end."""

from cl_readability_spark.core.dom import get_elements_by_tag, parse_html
from cl_readability_spark.core.extract import extract, fix_lazy_images

LONG_P = (
    "<p>"
    + "Body content sentences with commas, clauses, and length enough to score "
    "well in candidate selection, which keeps this paragraph firmly here. " * 4
    + "</p>"
)


def ok(html, **kw):
    r = extract(html, **kw)
    assert r.status == "ok", (r.status, r.error)
    return r


# --- share-element cleanup (clean_matched_nodes, JS shareElements) ---
def test_share_elements_removed():
    # NB: a share div with a SINGLE <p> child gets unwrapped by the
    # div-handling pass before share cleanup (JS does the same) — realistic
    # share widgets have multiple children, which is what the cleanup targets
    html = (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<div class='share-buttons'><p>SHARE-WIDGET twitter</p><p>facebook row</p></div>"
        "<div class='sharedaddy'><p>SHAREDADDY-WIDGET</p><p>buttons row</p></div>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "SHARE-WIDGET" not in r.extracted_text
    assert "SHAREDADDY-WIDGET" not in r.extracted_text


def test_share_element_kept_when_large():
    # share-matched nodes with textContent ≥ 500 chars survive (JS threshold)
    big = "Genuinely long shared content, with commas, far past the threshold. " * 10
    html = (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + f"<div class='share-story'><p>KEEPME {big}</p></div>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "KEEPME" in r.extracted_text


# --- unlikely roles (globals.lisp:16-17) ---
def test_unlikely_roles_removed():
    html = (
        "<html><body><div id='page'>"
        "<div role='navigation'><p>ROLE-NAV links here</p></div>"
        "<div role='dialog'><p>ROLE-DIALOG popup text</p></div>"
        + LONG_P * 3
        + "</div></body></html>"
    )
    r = ok(html)
    assert "ROLE-NAV" not in r.extracted_text
    assert "ROLE-DIALOG" not in r.extracted_text


def test_aria_modal_dialog_removed():
    html = (
        "<html><body><div id='page'>"
        "<div aria-modal='true' role='dialog'><p>MODAL-CONTENT subscribe now</p></div>"
        + LONG_P * 3
        + "</div></body></html>"
    )
    r = ok(html)
    assert "MODAL-CONTENT" not in r.extracted_text


# --- fix_lazy_images unit paths ---
def test_fix_lazy_images_data_src_promoted():
    doc = parse_html(
        "<div><img class='lazy' data-src='real-photo.jpg' alt='x'></div>"
    )
    fix_lazy_images(doc)
    img = get_elements_by_tag(doc, "img")[0]
    assert img.get("src") == "real-photo.jpg"


def test_fix_lazy_images_srcset_candidate():
    doc = parse_html(
        "<div><img class='lazyload' data-srcset='a.jpg 1x, b.jpg 2x'></div>"
    )
    fix_lazy_images(doc)
    img = get_elements_by_tag(doc, "img")[0]
    assert img.get("srcset") == "a.jpg 1x, b.jpg 2x"


def test_fix_lazy_images_tiny_base64_placeholder_dropped():
    tiny = "data:image/gif;base64," + "A" * 20
    doc = parse_html(
        f"<div><img src='{tiny}' data-src='real.png' class='lazy'></div>"
    )
    fix_lazy_images(doc)
    img = get_elements_by_tag(doc, "img")[0]
    assert img.get("src") == "real.png"


def test_fix_lazy_images_real_src_untouched():
    doc = parse_html("<div><img src='already.png' data-src='other.png'></div>")
    fix_lazy_images(doc)
    img = get_elements_by_tag(doc, "img")[0]
    assert img.get("src") == "already.png"


def test_fix_lazy_images_figure_gets_img_child():
    doc = parse_html("<div><figure class='lazy' data-src='fig.jpg'></figure></div>")
    fix_lazy_images(doc)
    imgs = get_elements_by_tag(doc, "img")
    assert len(imgs) == 1
    assert imgs[0].get("src") == "fig.jpg"


# --- parent-climb: ancestor with higher propagated score wins ---
def test_parent_climb_selects_scoring_ancestor():
    # many scoring paragraphs spread across two child divs of one wrapper:
    # each child gets direct scores, the wrapper accumulates ÷2 from all —
    # with enough paragraphs the wrapper outranks either child and the
    # article must contain BOTH halves
    para = (
        "<p>Shared body paragraph with commas, and sufficient length to add "
        "score, again and again. " * 3 + "</p>"
    )
    html = (
        "<html><body><div id='wrapper'>"
        f"<div id='left'>{para * 4}<p>LEFT-MARK long paragraph to close it out, naturally.</p></div>"
        f"<div id='right'>{para * 4}<p>RIGHT-MARK long paragraph to close it out, naturally.</p></div>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "LEFT-MARK" in r.extracted_text
    assert "RIGHT-MARK" in r.extracted_text


# --- data table preserved end-to-end ---
def test_data_table_survives_extraction():
    rows = "".join(
        f"<tr><td>cell {i} a</td><td>cell {i} b</td><td>cell {i} c</td>"
        f"<td>cell {i} d</td><td>cell {i} e</td></tr>"
        for i in range(12)
    )
    html = (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + f"<table><thead><tr><th>h1</th><th>h2</th><th>h3</th><th>h4</th><th>h5</th></tr></thead>{rows}</table>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "cell 3 b" in r.extracted_text  # data table kept
    assert "<table" in r.extracted_html


def test_presentation_table_with_links_removed():
    link_cells = "".join(
        f"<tr><td><a href='/x/{i}'>link text number {i}</a></td></tr>" for i in range(9)
    )
    html = (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + f"<table role='presentation' class='widget'>{link_cells}</table>"
        "</div></body></html>"
    )
    r = ok(html)
    assert "link text number 3" not in r.extracted_text
