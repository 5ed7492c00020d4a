"""isProbablyReaderable — cheap corpus triage (readability.lisp:634-668).

Node set: ``p, pre, article`` plus parents of ``div > br`` (readability.lisp:
641); per node: visibility → unlikely/maybe regex gate on class+id → skip
``li p`` → trimmed text ≥ *min-content-length* (140) → score += √(len−140);
readerable once cumulative score > *min-score* (20).
"""

from __future__ import annotations

import math

from cl_readability_spark.core import regexes as R
from cl_readability_spark.core.config import DEFAULT_CONFIG, ExtractorConfig
from cl_readability_spark.core.dom import (
    Document,
    Element,
    get_elements_by_tag,
    has_ancestor_tag,
    parse_html,
)
from cl_readability_spark.core.text import is_probably_visible


def _candidate_nodes(doc: Document) -> list[Element]:
    nodes: list[Element] = []
    seen: set[int] = set()
    for el in get_elements_by_tag(doc, "p", "pre", "article"):
        if id(el) not in seen:
            seen.add(id(el))
            nodes.append(el)
    # div > br → the div (readability.lisp:641-646)
    for br in get_elements_by_tag(doc, "br"):
        parent = br.parent
        if parent is not None and parent.tag == "div" and id(parent) not in seen:
            seen.add(id(parent))
            nodes.append(parent)
    return nodes


def is_readerable_doc(doc: Document, config: ExtractorConfig = DEFAULT_CONFIG) -> bool:
    score = 0.0
    # *visibility-checker* hook (globals.lisp:32-33), bound via the :around
    # method at readability-plump.lisp:122-125 in the reference
    visible = config.visibility_checker or is_probably_visible
    for node in _candidate_nodes(doc):
        if not visible(node):
            continue
        match_string = node.class_name + " " + node.id
        if R.UNLIKELY_CANDIDATES.search(match_string) and not R.MAYBE_CANDIDATE.search(
            match_string
        ):
            continue
        if node.tag == "p" and has_ancestor_tag(node, "li", -1):
            continue
        text_content_length = len(node.text_content().strip())
        if text_content_length < config.min_content_length:
            continue
        score += math.sqrt(text_content_length - config.min_content_length)
        if score > config.min_score:
            return True
    return False


def is_readerable(html: str, config: ExtractorConfig = DEFAULT_CONFIG) -> bool:
    """String-level entry; parse failures are not readerable."""
    try:
        doc = parse_html(html or "")
    except Exception:  # noqa: BLE001
        return False
    return is_readerable_doc(doc, config)
