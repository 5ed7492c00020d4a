#!/usr/bin/env python
"""Materialize the SNAPSHOT golden fixture corpus (run from repo root; see
golden_cases.py for when regeneration is appropriate).

This writes ONLY tests/fixtures/ — the engine-output snapshot suite (a
regression gate).  The independent correctness anchor lives in
tests/fixtures-authored/: hand-derived expectations this script must never
touch (they are not generated from the engine; see authored_goldens.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_cases import CASES  # noqa: E402

from cl_readability_spark.core.extract import extract  # noqa: E402
from cl_readability_spark.core.readerable import is_readerable  # noqa: E402


def main() -> None:
    base = os.path.join(os.path.dirname(__file__), "fixtures")
    for name, (html, url) in CASES.items():
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        r = extract(html, url=url)
        with open(os.path.join(d, "source.html"), "w") as f:
            f.write(html)
        if url:
            with open(os.path.join(d, "url.txt"), "w") as f:
                f.write(url)
        with open(os.path.join(d, "expected.txt"), "w") as f:
            f.write(r.extracted_text or "")
        with open(os.path.join(d, "expected.html"), "w") as f:
            f.write(r.extracted_html or "")
        with open(os.path.join(d, "expected-metadata.json"), "w") as f:
            json.dump(
                {
                    "status": r.status,
                    "title": r.title,
                    "byline": r.byline,
                    "excerpt": r.excerpt,
                    "site_name": r.site_name,
                    "published_time": r.published_time,
                    "lang": r.lang,
                    "readerable": is_readerable(html),
                    "text_length": r.text_length,
                    "retries": r.retries,
                },
                f,
                indent=1,
            )
        with open(os.path.join(d, "expected-spans.json"), "w") as f:
            json.dump([[s, e] for s, e in r.content_spans], f)
        print(f"{name}: {r.status} len={r.text_length} retries={r.retries}")


if __name__ == "__main__":
    main()
