"""Extraction configuration.

Mirrors the reference's dynamic-variable configuration surface
(globals.lisp:6-86) as a frozen dataclass; values are small constants so the
whole object is captured by closure into the pandas UDF (broadcast-equivalent).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


# globals.lisp:16-17 — Readability.UNLIKELY_ROLES
UNLIKELY_ROLES = frozenset(
    ["menu", "menubar", "complementary", "navigation", "alert", "alertdialog", "dialog"]
)

# globals.lisp:19-20 — tags that make a <div> "have block children"
DIV_TO_P_ELEMENTS = frozenset(
    ["blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul"]
)

# globals.lisp:22-23 — Readability.ALTER_TO_DIV_EXCEPTIONS
ALTER_TO_DIV_EXCEPTIONS = frozenset(["div", "article", "section", "p"])

# globals.lisp:25-27 — Readability.PRESENTATIONAL_ATTRIBUTES
PRESENTATIONAL_ATTRIBUTES = (
    "align", "background", "bgcolor", "border", "cellpadding", "cellspacing",
    "frame", "hspace", "rules", "style", "valign", "vspace",
)

# globals.lisp:29-30 — Readability.DEPRECATED_SIZE_ATTRIBUTE_ELEMS
DEPRECATED_SIZE_ATTRIBUTE_ELEMS = frozenset(["table", "th", "td", "hr", "pre"])

# globals.lisp:46-56 — Readability.PHRASING_ELEMS (canvas/iframe/svg/video
# deliberately excluded upstream)
PHRASING_ELEMENTS = frozenset(
    [
        "abbr", "audio", "b", "bdo", "br", "button", "cite", "code", "data",
        "datalist", "dfn", "em", "embed", "i", "img", "input", "kbd", "label",
        "mark", "math", "meter", "noscript", "object", "output", "progress", "q",
        "ruby", "samp", "script", "select", "small", "span", "strong", "sub",
        "sup", "textarea", "time", "var", "wbr",
    ]
)

# globals.lisp:70-72 — Readability.DEFAULT_TAGS_TO_SCORE
TAGS_TO_SCORE = frozenset(["section", "h2", "h3", "h4", "h5", "h6", "p", "td", "pre"])


@dataclass(frozen=True)
class ExtractorConfig:
    """Per-run knobs (globals.lisp:6-86 / Readability options)."""

    # globals.lisp:6-7 — base URL for absolutizing relative links
    document_url: str | None = None
    # globals.lisp:9-13 — is_readerable thresholds
    min_content_length: int = 140
    min_score: float = 20.0
    # globals.lisp:35-44 — class handling
    keep_classes: bool = False
    preserved_classes: frozenset[str] = field(default_factory=frozenset)
    # globals.lisp:58-62 — parse guard (None = unlimited)
    max_elements: int | None = None
    # globals.lisp:64-68 — Readability.DEFAULT_N_TOP_CANDIDATES
    n_top_candidates: int = 5
    # globals.lisp:74-77 — Readability.DEFAULT_CHAR_THRESHOLD
    char_threshold: int = 500
    # globals.lisp:79-86 — the three retry-loop flags
    strip_unlikelys: bool = True
    weight_classes: bool = True
    clean_conditionally: bool = True
    # globals.lisp:32-33 — *visibility-checker*: pluggable visibility
    # predicate (Element -> bool); None = the default _isProbablyVisible.
    # For Spark use the callable must be a picklable module-level function
    # (it rides into the Arrow UDF closure with the rest of the config).
    visibility_checker: Callable[[Any], bool] | None = None


DEFAULT_CONFIG = ExtractorConfig()
