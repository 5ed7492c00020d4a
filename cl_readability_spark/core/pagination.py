"""Pagination link heuristics.

The reference declares ``*next-link-regex*`` / ``*prev-link-regex*``
(regex.lisp:40-44) but never uses them — they are the surface of legacy
Readability's ``findNextPageLink``.  This implements the modest heuristic
those regexes support: classify each anchor by matching its visible text
plus class/id against the next/prev patterns, preferring rel=next/prev
when present (the modern, spec-blessed signal).
"""

from __future__ import annotations

from urllib.parse import urljoin

from cl_readability_spark.core import regexes as R
from cl_readability_spark.core.dom import Document, get_elements_by_tag


def find_pagination_links(
    doc: Document, base_url: str | None = None
) -> tuple[str | None, str | None]:
    """Returns (next_url, prev_url) or Nones.

    Precedence per direction: first ``rel="next"/"prev"`` anchor in document
    order, else the first anchor whose text+class+id matches the direction's
    regex (regex.lisp:40-44) and not the opposite one.  ``javascript:`` and
    fragment-only hrefs are ignored; results are absolutized against
    ``base_url`` when given."""
    next_url: str | None = None
    prev_url: str | None = None
    next_rel = prev_rel = False
    for a in get_elements_by_tag(doc, "a"):
        href = (a.get("href") or "").strip()
        if not href or href.startswith(("#", "javascript:")):
            continue
        rel = (a.get("rel") or "").lower().split()
        match_string = " ".join(
            (a.text_content().strip(), a.class_name, a.id)
        )
        is_next = bool(R.NEXT_LINK.search(match_string))
        is_prev = bool(R.PREV_LINK.search(match_string))
        if "next" in rel and not next_rel:
            next_url, next_rel = href, True
        elif next_url is None and is_next and not is_prev:
            next_url = href
        if "prev" in rel or "previous" in rel:
            if not prev_rel:
                prev_url, prev_rel = href, True
        elif prev_url is None and is_prev and not is_next:
            prev_url = href
    if base_url:
        next_url = urljoin(base_url, next_url) if next_url else None
        prev_url = urljoin(base_url, prev_url) if prev_url else None
    return next_url, prev_url
