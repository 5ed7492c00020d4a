"""Golden snapshot regression gate: re-extract every fixture's source.html
and require byte-identical text, spans, html, and metadata (the per-turn
text-equality contract, frozen)."""

import json
import os

import pytest

from cl_readability_spark.core.extract import extract
from cl_readability_spark.core.readerable import is_readerable

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
CASES = sorted(
    d for d in os.listdir(FIXTURES) if os.path.isdir(os.path.join(FIXTURES, d))
)


@pytest.mark.parametrize("case", CASES)
def test_golden_snapshot(case):
    d = os.path.join(FIXTURES, case)
    with open(os.path.join(d, "source.html")) as f:
        html = f.read()
    url = None
    url_path = os.path.join(d, "url.txt")
    if os.path.exists(url_path):
        with open(url_path) as f:
            url = f.read().strip()

    r = extract(html, url=url)

    with open(os.path.join(d, "expected.txt")) as f:
        assert (r.extracted_text or "") == f.read(), "extracted_text drifted"
    with open(os.path.join(d, "expected.html")) as f:
        assert (r.extracted_html or "") == f.read(), "extracted_html drifted"
    with open(os.path.join(d, "expected-spans.json")) as f:
        assert [[s, e] for s, e in r.content_spans] == json.load(f), "spans drifted"
    with open(os.path.join(d, "expected-metadata.json")) as f:
        meta = json.load(f)
    assert r.status == meta["status"]
    assert r.title == meta["title"]
    assert r.byline == meta["byline"]
    assert r.excerpt == meta.get("excerpt")
    assert r.site_name == meta.get("site_name")
    assert r.published_time == meta.get("published_time")
    assert r.lang == meta["lang"]
    assert r.text_length == meta["text_length"]
    assert r.retries == meta["retries"]
    assert is_readerable(html) == meta["readerable"]
