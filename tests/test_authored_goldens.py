"""Independent end-to-end correctness anchor: extraction output must equal
the HAND-AUTHORED expectations in tests/fixtures-authored/ byte-for-byte.

These files were derived from the case HTML plus the written semantics
(see authored_goldens.py for every derivation chain) and are NEVER
generated — make_goldens.py refuses to touch fixtures-authored/.  A
failure here means the engine diverged from the specified algorithm, not
merely from its own past output."""

import json
import os

import pytest

from authored_goldens import AUTHORED
from golden_cases import CASES

from cl_readability_spark.core.extract import extract

BASE = os.path.join(os.path.dirname(__file__), "fixtures-authored")


@pytest.mark.parametrize("name", sorted(AUTHORED))
def test_extraction_matches_authored_text(name):
    html, url = CASES[name]
    with open(os.path.join(BASE, name, "expected.txt")) as f:
        expected = f.read()
    # the committed file is canonical; the module constant documents its
    # derivation — they must agree (guards accidental file edits)
    assert expected == AUTHORED[name]["text"]
    result = extract(html, url=url)
    assert result.status == "ok"
    assert result.extracted_text == expected
    # every authored case resolves to a single content block, so the span
    # derivation is [0, len(text))
    assert [list(s) for s in result.content_spans] == [[0, len(expected)]]


@pytest.mark.parametrize(
    "name",
    sorted(
        n for n, e in AUTHORED.items()
        if "title" in e or "byline" in e or "dir" in e
    ),
)
def test_extraction_matches_authored_metadata(name):
    html, url = CASES[name]
    with open(os.path.join(BASE, name, "expected-meta.json")) as f:
        meta = json.load(f)
    result = extract(html, url=url)
    if "title" in meta:
        assert result.title == meta["title"]
    if "byline" in meta:
        assert result.byline == meta["byline"]
    if "dir" in meta:
        assert result.dir == meta["dir"]


@pytest.mark.parametrize(
    "name",
    sorted(
        n for n, e in AUTHORED.items()
        if "html_contains" in e or "html_excludes" in e
    ),
)
def test_extraction_matches_authored_html_properties(name):
    """Hand-derived properties of the serialized article HTML (the text
    channel cannot pin attribute rewrites like the lazy-image data-src
    promotion or URL absolutization)."""
    html, url = CASES[name]
    result = extract(html, url=url)
    assert result.status == "ok"
    for needle in AUTHORED[name].get("html_contains", []):
        assert needle in result.extracted_html, needle
    for needle in AUTHORED[name].get("html_excludes", []):
        assert needle not in result.extracted_html, needle


def test_generator_cannot_write_authored_dir():
    """make_goldens.py targets fixtures/, never fixtures-authored/; assert
    the guard exists so a refactor can't silently re-couple them."""
    src = open(os.path.join(os.path.dirname(__file__), "make_goldens.py")).read()
    assert "fixtures-authored" in src  # the refusal guard mentions it
    assert 'os.path.join(os.path.dirname(__file__), "fixtures")' in src
