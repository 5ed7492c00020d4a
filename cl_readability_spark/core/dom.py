"""Minimal mutable HTML DOM for the extraction core.

Fresh design on stdlib ``html.parser`` (the runtime image has no lxml/bs4).
The node model covers the reference's backend protocol surface
(readability.lisp:6-114 generics; Plump bindings readability-plump.lisp:6-111)
with exactly the query subset the algorithm uses (SURVEY.md §2.10): tag-name
(lists), ``div > br``, ``li p``, and universal pre-order traversal.

Non-element noise (comments, CDATA, doctype, processing instructions) is
dropped at parse time — the reference purges it in ``remove-non-elements``
(readability-plump.lisp:263-278); doing it in the tokenizer is equivalent and
cheaper.

Design notes for the Spark hot path: slotted nodes, no per-node dicts beyond
attrs, one parser instance per document, ``convert_charrefs=True`` so text
nodes carry browser-decoded text.
"""

from __future__ import annotations

import re

from html import escape, unescape
from html.parser import HTMLParser


class TooManyElementsError(Exception):
    """conditions.lisp:6-21 — raised when element count exceeds max_elements."""


# HTML5 void elements (never pushed on the open-element stack).
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Start tags that implicitly close an open <p> (HTML5 spec §13.2.6.4.7).
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hgroup hr main menu nav ol p pre "
    "section table ul".split()
)

# inline elements that do NOT stop the implicit-<p>-close scan (shared by
# the stdlib builder and the fast tokenizer so the two paths cannot diverge)
_P_SCOPE_INLINE = frozenset(
    ("span", "a", "b", "i", "em", "strong", "u", "s",
     "small", "font", "code", "label")
)

# tag on stack -> start tags that implicitly close it
_AUTO_CLOSE = {
    "li": frozenset(["li"]),
    "dd": frozenset(["dd", "dt"]),
    "dt": frozenset(["dd", "dt"]),
    "td": frozenset(["td", "th", "tr"]),
    "th": frozenset(["td", "th", "tr"]),
    "tr": frozenset(["tr"]),
    "thead": frozenset(["tbody", "tfoot"]),
    "tbody": frozenset(["tbody", "tfoot"]),
    "option": frozenset(["option", "optgroup"]),
}

_HEAD_TAGS = frozenset(["title", "meta", "base", "link", "style"])


def _index_of(parent, node) -> int:
    """Position of ``node`` in ``parent.children`` in amortized O(1): every
    node carries a position hint (``_pos``) kept fresh on append and repaired
    by a short local scan (mutations shift siblings by small deltas), falling
    back to a full refresh.  This is what keeps traversal of very wide
    documents (tens of thousands of siblings) linear — a plain
    ``list.index`` here made extraction O(n²)."""
    sibs = parent.children
    n = len(sibs)
    i = node._pos
    if 0 <= i < n and sibs[i] is node:
        return i
    lo = i - 4 if i - 4 > 0 else 0
    hi = i + 4 if i + 4 < n else n - 1
    for j in range(hi, lo - 1, -1):
        if sibs[j] is node:
            node._pos = j
            return j
    for j, c in enumerate(sibs):  # full refresh of every hint
        c._pos = j
    if 0 <= node._pos < n and sibs[node._pos] is node:
        return node._pos
    raise ValueError("node not in parent.children")


class Text:
    """Text node (readability-plump.lisp:107-111).

    Class-level ``tag = None`` / ``children = ()`` let the hot tree walks
    treat Text and Element uniformly (one attribute load instead of a
    ``type()`` check per visited node — measured on the extraction profile
    where the walks are the top cost)."""

    __slots__ = ("parent", "data", "_pos")
    tag = None
    children: tuple = ()

    def __init__(self, data: str, parent: "Element | None" = None):
        self.data = data
        self.parent = parent
        self._pos = 0

    @property
    def is_whitespace(self) -> bool:
        return not self.data.strip()

    def detach(self) -> None:
        p = self.parent
        if p is not None:
            del p.children[_index_of(p, self)]
            self.parent = None

    def __repr__(self) -> str:  # pragma: no cover
        return f"Text({self.data[:30]!r})"


class Element:
    """Element node: lowercase tag, insertion-ordered attrs, child list.

    ``score`` carries the grab-article content score (the reference memoizes
    scores in an identity-keyed hash, readability-plump.lisp:158-159; a slot
    is the idiomatic equivalent).  ``data_table`` marks Readability.js
    ``_readabilityDataTable``.
    """

    __slots__ = ("parent", "tag", "attrs", "children", "score", "data_table",
                 "_pos")

    def __init__(self, tag: str, attrs: dict | None = None,
                 parent: "Element | None" = None):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.children: list = []
        self.parent = parent
        self.score: float | None = None
        self.data_table = False
        self._pos = 0

    # --- attribute protocol (readability.lisp:42-57) ---
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def set(self, name: str, value) -> None:
        if value is None:
            self.attrs.pop(name, None)
        else:
            self.attrs[name] = value if isinstance(value, str) else str(value)

    def remove_attr(self, name: str) -> None:
        self.attrs.pop(name, None)

    @property
    def class_name(self) -> str:
        return self.attrs.get("class", "")

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    # --- tree navigation (readability.lisp:73-96) ---
    @property
    def element_children(self) -> list["Element"]:
        return [c for c in self.children if c.tag is not None]

    @property
    def first_element_child(self) -> "Element | None":
        for c in self.children:
            if c.tag is not None:
                return c
        return None

    @property
    def last_child(self):
        return self.children[-1] if self.children else None

    @property
    def first_child(self):
        return self.children[0] if self.children else None

    @property
    def next_sibling(self):
        p = self.parent
        if p is None:
            return None
        sibs = p.children
        i = _index_of(p, self)
        return sibs[i + 1] if i + 1 < len(sibs) else None

    @property
    def previous_element_sibling(self) -> "Element | None":
        p = self.parent
        if p is None:
            return None
        sibs = p.children
        i = _index_of(p, self)
        for j in range(i - 1, -1, -1):
            if isinstance(sibs[j], Element):
                return sibs[j]
        return None

    # --- mutation (readability.lisp:97-112) ---
    def append_child(self, node) -> None:
        old = node.parent
        if old is not None:
            del old.children[_index_of(old, node)]
        node.parent = self
        node._pos = len(self.children)
        self.children.append(node)

    def insert_before(self, node, ref) -> None:
        old = node.parent
        if old is not None:
            del old.children[_index_of(old, node)]
        node.parent = self
        i = _index_of(self, ref)
        self.children.insert(i, node)
        node._pos = i

    def replace_child(self, new, old) -> None:
        i = _index_of(self, old)
        if new.parent is not None:
            del new.parent.children[_index_of(new.parent, new)]
            i = _index_of(self, old)  # re-derive in case new was a sibling
        new.parent = self
        self.children[i] = new
        new._pos = i
        old.parent = None

    def detach(self) -> None:
        p = self.parent
        if p is not None:
            del p.children[_index_of(p, self)]
            self.parent = None

    # --- text protocol (readability.lisp:58-70 / plump `text`) ---
    def text_content(self) -> str:
        """Concatenation of all descendant text nodes, pre-order
        (readability-plump.lisp:48-54).  Recursive hot path with an
        iterative fallback for pathologically deep trees (same trade as
        ``get_elements_by_tag``)."""
        out: list[str] = []

        def walk(n):
            for c in n.children:
                if c.tag is None:
                    out.append(c.data)
                elif c.children:
                    walk(c)

        try:
            walk(self)
        except RecursionError:
            out = []
            stack = [self]
            while stack:
                n = stack.pop()
                if n.tag is None:
                    out.append(n.data)
                else:
                    kids = n.children
                    if kids:
                        stack.extend(reversed(kids))
        return "".join(out)

    # --- serialization (readability-plump.lisp:55-61) ---
    def serialize(self) -> str:
        out: list[str] = []
        _serialize_into(self, out)
        return "".join(out)

    def inner_html(self) -> str:
        out: list[str] = []
        for c in self.children:
            _serialize_into(c, out)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} {self.attrs!r} children={len(self.children)}>"


def _serialize_into(node, out: list[str]) -> None:
    if isinstance(node, Text):
        out.append(escape(node.data, quote=False))
        return
    tag = node.tag
    if tag == "#document":
        for c in node.children:
            _serialize_into(c, out)
        return
    out.append("<")
    out.append(tag)
    for k, v in node.attrs.items():
        out.append(" ")
        out.append(k)
        out.append('="')
        out.append(escape(v, quote=True))
        out.append('"')
    if tag in VOID_ELEMENTS and not node.children:
        out.append("/>")
        return
    out.append(">")
    for c in node.children:
        _serialize_into(c, out)
    out.append("</")
    out.append(tag)
    out.append(">")


class Document(Element):
    """Root node (plump:root, readability-plump.lisp:287-290)."""

    __slots__ = ("element_count",)

    def __init__(self):
        super().__init__("#document")
        self.element_count = 0

    @property
    def html(self) -> Element | None:
        for c in self.children:
            if isinstance(c, Element) and c.tag == "html":
                return c
        return None

    @property
    def body(self) -> Element | None:
        h = self.html
        if h is None:
            return None
        for c in h.children:
            if isinstance(c, Element) and c.tag == "body":
                return c
        return None

    def create_element(self, tag: str) -> Element:
        return Element(tag)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self, max_elements: int | None):
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Element] = [self.root]
        self.max_elements = max_elements

    def _top(self) -> Element:
        return self.stack[-1]

    def _make_attrs(self, attrs) -> dict:
        d: dict[str, str] = {}
        for k, v in attrs:
            if k not in d:  # first occurrence wins (HTML5)
                d[k] = v if v is not None else ""
        return d

    def _open(self, tag: str, attrs, push: bool) -> None:
        self.root.element_count += 1
        if self.max_elements is not None and self.root.element_count > self.max_elements:
            raise TooManyElementsError(
                f"document has more than {self.max_elements} elements"
            )
        # implicit closes
        if tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    del self.stack[i:]
                    break
                if t not in _P_SCOPE_INLINE:
                    break
        while len(self.stack) > 1 and tag in _AUTO_CLOSE.get(self._top().tag, ()):
            self.stack.pop()
        el = Element(tag, self._make_attrs(attrs))
        self._top().append_child(el)
        if push and tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, push=True)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, push=False)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (browser-ish recovery)

    def handle_data(self, data):
        if not data:
            return
        top = self._top()
        last = top.children[-1] if top.children else None
        if isinstance(last, Text):
            last.data += data
        else:
            top.append_child(Text(data))

    # line/column tracking is unused by the DOM — neutering updatepos saves
    # ~5% of total parse time on large documents
    def updatepos(self, i, j):
        return j

    # comments / doctype / PI / CDATA: dropped (remove-non-elements equivalent,
    # readability-plump.lisp:263-278)
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


# ---------------------------------------------------------------------------
# Fast tokenizer path
#
# A regex scanner ~2.5× faster than stdlib html.parser tokenization, used for
# the overwhelmingly common clean-markup case.  It drives the SAME
# _TreeBuilder handle_* callbacks, and BAILS to the stdlib parser on any
# construct whose tolerant-parsing semantics it does not replicate exactly
# (stray '<', malformed close tags, exotic tag names, CDATA marked sections,
# ambiguous unquoted-value-before-slash, unterminated raw text...).
# Differential-tested against the stdlib path in tests/test_fast_parser.py.
# ---------------------------------------------------------------------------

class _FastParseBail(Exception):
    pass


_MASTER = re.compile(
    r"""
  (?P<text>[^<]+)
| <(?P<close>/)(?P<ctag>[a-zA-Z][a-zA-Z0-9-]*)\s*>
| <(?P<tag>[a-zA-Z][a-zA-Z0-9-]*)(?=[\s/>])(?P<attrs>(?:[^>"']|"[^"]*"|'[^']*')*?)(?P<selfclose>/?)>
| <!--(?P<comment>.*?)-->
| <!(?P<decl>[^>]*)>
| <\?(?P<pi>[^>]*)>
""",
    re.S | re.X,
)
_ATTR = re.compile(r"""\s*([^\s=/>]+)(\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*)))?""")
_RAW_END = {
    "script": re.compile(r"</script", re.I),
    "style": re.compile(r"</style", re.I),
}

USE_FAST_PARSER = True  # tests flip this for differential runs

# group indices of _MASTER, resolved once — m.group(int) skips the
# per-token name lookup in the tokenizer loop
_G_TEXT = _MASTER.groupindex["text"]
_G_CTAG = _MASTER.groupindex["ctag"]
_G_TAG = _MASTER.groupindex["tag"]
_G_ATTRS = _MASTER.groupindex["attrs"]
_G_SELFCLOSE = _MASTER.groupindex["selfclose"]
_G_DECL = _MASTER.groupindex["decl"]


def _fast_feed(html: str, builder: "_TreeBuilder") -> None:
    # The tree operations are INLINED here (no handle_* dispatch): each is
    # the literal body of the corresponding _TreeBuilder callback (starttag
    # → _open, data → handle_data, endtag → handle_endtag), so the stdlib
    # fallback and this path build identical trees — pinned by the
    # differential suite in tests/test_fast_parser.py.
    pos, n = 0, len(html)
    root = builder.root
    stack = builder.stack
    max_elements = builder.max_elements
    master_match = _MASTER.match
    while pos < n:
        m = master_match(html, pos)
        if m is None:
            raise _FastParseBail
        group = m.group
        text = group(_G_TEXT)
        if text is not None:
            # handle_data, inlined (fresh Text append — no reparenting)
            if "&" in text:
                text = unescape(text)
            kids = stack[-1].children
            last = kids[-1] if kids else None
            if last is not None and last.tag is None:
                last.data += text
            else:
                t = Text(text, stack[-1])
                t._pos = len(kids)
                kids.append(t)
            pos = m.end()
            continue
        ctag = group(_G_CTAG)
        if ctag is not None:
            # handle_endtag, inlined
            tag = ctag.lower()
            if tag not in VOID_ELEMENTS:
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == tag:
                        del stack[i:]
                        break
            pos = m.end()
            continue
        tag = group(_G_TAG)
        if tag is not None:
            tag = tag.lower()
            attrs_s = group(_G_ATTRS)
            selfclose = group(_G_SELFCLOSE)
            if selfclose and attrs_s and attrs_s[-1] not in " \t\r\n\"'":
                # `<img src=x/>`: stdlib folds the '/' into the unquoted value
                raise _FastParseBail
            if attrs_s and "<" in attrs_s:
                raise _FastParseBail  # tag soup like `<div<!-- -->`
            # attr scan builds the first-occurrence-wins dict directly
            # (== _make_attrs over the (name, value) list)
            attrs: dict = {}
            if attrs_s and not attrs_s.isspace():
                apos = 0
                for am in _ATTR.finditer(attrs_s):
                    if am.start() != apos:
                        raise _FastParseBail
                    apos = am.end()
                    name = am.group(1).lower()
                    if am.group(2) is None:
                        val = ""
                    else:
                        if am.group(4) is not None:
                            val = am.group(4)
                        elif am.group(5) is not None:
                            val = am.group(5)
                        else:
                            val = am.group(6) or ""
                        if "&" in val:
                            val = unescape(val)
                    if name not in attrs:
                        attrs[name] = val
                if attrs_s[apos:].strip():
                    raise _FastParseBail
            # _open, inlined
            root.element_count += 1
            if max_elements is not None and root.element_count > max_elements:
                raise TooManyElementsError(
                    f"document has more than {max_elements} elements"
                )
            if tag in _P_CLOSERS:
                for i in range(len(stack) - 1, 0, -1):
                    t = stack[i].tag
                    if t == "p":
                        del stack[i:]
                        break
                    if t not in _P_SCOPE_INLINE:
                        break
            while len(stack) > 1 and tag in _AUTO_CLOSE.get(stack[-1].tag, ()):
                stack.pop()
            el = Element(tag, attrs)
            top = stack[-1]
            el.parent = top
            el._pos = len(top.children)
            top.children.append(el)
            pos = m.end()
            if selfclose or tag in VOID_ELEMENTS:
                continue
            stack.append(el)
            if tag in _RAW_END:
                rm = _RAW_END[tag].search(html, pos)
                if rm is None:
                    # EOF inside raw text — stdlib buffers and drops it;
                    # don't replicate, defer
                    raise _FastParseBail
                raw = html[pos : rm.start()]
                if raw:
                    # handle_data again (raw text: no unescape — stdlib
                    # does not convert charrefs inside script/style)
                    kids = el.children
                    last = kids[-1] if kids else None
                    if last is not None and last.tag is None:
                        last.data += raw
                    else:
                        t = Text(raw, el)
                        t._pos = len(kids)
                        kids.append(t)
                gt = html.find(">", rm.start())
                if gt == -1:
                    raise _FastParseBail
                if html[rm.end() : gt].strip():
                    raise _FastParseBail  # `</script foo>` — let stdlib decide
                # handle_endtag for the raw container
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == tag:
                        del stack[i:]
                        break
                pos = gt + 1
            continue
        decl = group(_G_DECL)
        if decl is not None and decl.startswith("["):
            raise _FastParseBail  # CDATA marked section — stdlib semantics
        # comment / doctype / PI: dropped, same as the builder callbacks
        pos = m.end()


def parse_html(html: str, max_elements: int | None = None) -> Document:
    """Parse an HTML string into a Document, normalizing to html>body shape.

    Uses the fast tokenizer when the markup is clean, transparently falling
    back to stdlib html.parser otherwise (identical trees either way —
    differential-tested).  Raises TooManyElementsError when the element count
    exceeds ``max_elements`` (conditions.lisp:6-21)."""
    if USE_FAST_PARSER:
        builder = _TreeBuilder(max_elements)
        try:
            _fast_feed(html, builder)
        except _FastParseBail:
            pass
        else:
            doc = builder.root
            _ensure_structure(doc)
            return doc
    builder = _TreeBuilder(max_elements)
    builder.feed(html)
    builder.close()
    doc = builder.root
    _ensure_structure(doc)
    return doc


def _ensure_structure(doc: Document) -> None:
    html = doc.html
    if html is None:
        head = next(
            (n for n in doc.children if isinstance(n, Element) and n.tag == "head"),
            None,
        )
        body = next(
            (n for n in doc.children if isinstance(n, Element) and n.tag == "body"),
            None,
        )
        if head is None:
            head = Element("head")
        if body is None:
            body = Element("body")
        for node in list(doc.children):
            if node is head or node is body:
                continue
            if isinstance(node, Element) and node.tag in _HEAD_TAGS:
                head.append_child(node)
            else:
                body.append_child(node)
        html = Element("html")
        html.append_child(head)
        html.append_child(body)
        doc.children = []
        head.parent = body.parent = html
        doc.append_child(html)
        return
    if doc.body is None:
        body = Element("body")
        for node in list(html.children):
            if isinstance(node, Element) and node.tag in ("head", "body"):
                continue
            body.append_child(node)
        html.append_child(body)
    # hoist any stray top-level siblings of <html> into body
    body = doc.body
    for node in list(doc.children):
        if node is html:
            continue
        body.append_child(node)


# ---------------------------------------------------------------------------
# Query subset (SURVEY.md §2.10 — exactly what the algorithm needs)
# ---------------------------------------------------------------------------

def iter_elements(root: Element):
    """Pre-order DFS over descendant elements (clss ordered-select '*',
    readability-plump.lisp:10,17). Excludes ``root`` itself."""
    stack = [c for c in reversed(root.children) if c.tag is not None]
    while stack:
        el = stack.pop()
        yield el
        kids = el.children
        if kids:
            stack.extend(
                c for c in reversed(kids) if c.tag is not None
            )


def _gebt_stack(root: Element, want) -> list[Element]:
    """Iterative fallback for pathologically deep trees (no recursion
    depth bound; ~2× slower than the recursive hot path)."""
    single = isinstance(want, str)
    out: list[Element] = []
    stack = list(reversed(root.children))
    while stack:
        n = stack.pop()
        if n.tag is not None:  # Text carries tag=None
            if (n.tag == want) if single else (n.tag in want):
                out.append(n)
            kids = n.children
            if kids:
                stack.extend(reversed(kids))
    return out


def get_elements_by_tag(root: Element, *tags: str) -> list[Element]:
    """All descendant elements with tag in ``tags``, document order
    (qsa, readability.lisp:28-32).  Hot path: plain recursive descent —
    measured ~1.9× the explicit-stack form (no reversed()/extend()/pop()
    churn; this is the single hottest DOM routine in extraction).  A
    RecursionError on a pathologically deep tree falls back to the
    unbounded iterative walk."""
    if len(tags) == 1:
        want = tags[0]
        out: list[Element] = []
        append = out.append

        def walk(n):
            for c in n.children:
                if c.tag == want:
                    append(c)
                if c.children:
                    walk(c)

        try:
            walk(root)
        except RecursionError:
            return _gebt_stack(root, want)
        return out
    want_set = frozenset(tags)
    out = []
    append = out.append

    def walk_set(n):
        for c in n.children:
            if c.tag in want_set:
                append(c)
            if c.children:
                walk_set(c)

    try:
        walk_set(root)
    except RecursionError:
        return _gebt_stack(root, want_set)
    return out


def has_ancestor_tag(node: Element, tag: str, max_depth: int = 3,
                     filter_fn=None) -> bool:
    """Readability._hasAncestorTag (readability.lisp:394-406).
    max_depth <= 0 means unlimited (JS -1)."""
    depth = 0
    cur = node.parent
    while cur is not None and cur.tag != "#document":
        if max_depth > 0 and depth > max_depth:
            return False
        if cur.tag == tag and (filter_fn is None or filter_fn(cur)):
            return True
        cur = cur.parent
        depth += 1
    return False


def next_node_skip_ws(node):
    """Readability._nextNode (readability.lisp:84-93): skip whitespace-only
    text siblings starting at ``node`` itself."""
    while node is not None and isinstance(node, Text) and node.is_whitespace:
        node = _text_next(node)
    return node


def _text_next(t: Text):
    p = t.parent
    if p is None:
        return None
    sibs = p.children
    i = _index_of(p, t)
    return sibs[i + 1] if i + 1 < len(sibs) else None


def node_next_sibling(node):
    """next sibling for Element or Text (readability.lisp:81-83)."""
    if isinstance(node, Element):
        return node.next_sibling
    return _text_next(node)


def remove_and_get_next(node: Element):
    """Readability._removeAndGetNext: next node in pre-order that is not a
    descendant of ``node``, then remove ``node``."""
    nxt = get_next_node(node, ignore_self_and_kids=True)
    node.detach()
    return nxt


def get_next_node(node: Element, ignore_self_and_kids: bool = False):
    """Readability._getNextNode: pre-order successor over elements."""
    if not ignore_self_and_kids:
        fec = node.first_element_child
        if fec is not None:
            return fec
    sib = _next_element_sibling(node)
    if sib is not None:
        return sib
    cur = node.parent
    while cur is not None and cur.tag != "#document":
        sib = _next_element_sibling(cur)
        if sib is not None:
            return sib
        cur = cur.parent
    return None


def _next_element_sibling(node: Element):
    p = node.parent
    if p is None:
        return None
    sibs = p.children
    i = _index_of(p, node)
    for j in range(i + 1, len(sibs)):
        if isinstance(sibs[j], Element):
            return sibs[j]
    return None


def set_node_tag(node: Element, tag: str) -> Element:
    """Readability._setNodeTag (readability.lisp:105-112).  Our DOM owns the
    struct, so we mutate in place and keep identity (score survives, matching
    JS which copies ``readability`` over)."""
    node.tag = tag
    return node
