"""Hand-authored golden expectations — derived from the WRITTEN semantics,
never from running the engine.

This is the independent correctness anchor the round-1 verdict asked for:
``tests/fixtures/`` snapshots are engine-generated (a regression gate);
the expectations here were derived by hand from the case HTML plus the
documented algorithm (SURVEY §2.3-2.4, readability-plump.lisp:161-190,
Readability.js semantics cited by the reference's TODOs), and committed as
files under ``tests/fixtures-authored/`` that ``make_goldens.py`` must
never write.  ``test_authored_goldens.py`` asserts byte-equality without
ever invoking the generator.

Derivation rules used (the engine's documented output contract):
- extracted_text = the normalized inner texts of the top-level children of
  the readability-page-1 wrapper, joined by "\\n\\n" (one block per child);
  normalization = trim + collapse \\s{2,} to one space (_getInnerText,
  readability.lisp:60-67).
- text_content is the pre-order concatenation of text nodes, so sibling
  <p>s whose literal text ends in a trailing space concatenate into a
  single-space-separated run.

Worked example of the method (class-weight, the non-obvious case):
paragraph score = 1 + (commas+1) + min(len//100, 3) (JS _grabArticle);
div init = +5 + classWeight (±25, regex.lisp:15-19).  #one = 30 + 45 = 75,
#two = -20 + 45 = 25; sibling threshold = max(10, 0.2*75) = 15, so
grab-article MERGES #two (25 >= 15) — but prep-article's
clean-conditionally then removes it because JS _cleanConditionally drops
any node with classWeight + 0 < 0 and 'widget' is a negative class.
Hence: WINNER block only.
"""

# The literal sentences the cases are built from (tests/golden_cases.py).
S = (
    "Body content sentences with commas, clauses, and length enough to score "
    "well in candidate selection, which keeps this paragraph firmly in the "
    "article. "
)
S2 = (
    "Identical paragraph content with commas, weight, and length to make "
    "both containers score the same way, exactly. "
)
LOOSE = (
    "Loose phrasing text with commas, and enough length to be scored as a "
    "paragraph, truly. "
)
SEG1 = "Segment text with commas, structure, and heft enough to be real content. "
SEG2 = "Second segment with commas, and plenty of words to matter here, still. "
WINNER = (
    "WINNER marker paragraph, long enough to contribute to the final text output."
)
# the RTL article sentence (golden_cases.RTL_S — restated here by hand,
# like S above, so the expectation stays independent of the generator)
RTL_S = (
    "فقرة المحتوى الرئيسي تحتوي على جمل عربية طويلة، وفواصل متعددة، "
    "وكلمات كافية لرفع درجة هذه الفقرة في اختيار المرشح الأعلى بوضوح. "
)

# name -> {text, title?, byline?}; every derivation commented with its
# reasoning chain.
AUTHORED: dict[str, dict] = {
    # <article> with 4 paragraphs of S*4; article is the only scored
    # ancestor -> top candidate; no siblings; one block = S*16.
    "basic-article": {
        "text": (S * 16).strip(),
        # <title> "... | Site": split at the separator, first part has 5
        # words >= 3 -> kept (JS _getArticleTitle).
        "title": "The Basic Article Fixture Title",
    },
    # script-decoy — derivation chain: the <script> body is RAW TEXT to
    # the parser (stdlib CDATA semantics; the fast tokenizer bails to the
    # stdlib path on unterminated-raw-text ambiguity), so the decoy "<p>"
    # inside it is never an element; remove-scripts (SURVEY #39,
    # extract.py) then drops the script node wholesale, and the comment is
    # dropped at parse (remove-non-elements).  What remains is exactly
    # basic-article's shape: <article> with 3 paragraphs of S*4 → top
    # candidate → one block = S*12.
    "script-decoy": {
        "text": (S * 12).strip(),
        # "Script Decoy Soup | Site": the first pipe part has 3 words, and
        # JS _getArticleTitle REVERTS to the original title when the split
        # candidate has <= 4 words and the separator is non-hierarchical
        # (| is not in the \\/>» hierarchical set) — so the untouched
        # title survives.  (The other title fixtures cover the >=5-word
        # keep path; this one pins the revert rule.)
        "title": "Script Decoy Soup | Site",
    },
    # entity-soup-malformed — derivation chain:
    # (1) character references decode at parse (dom.py convert_charrefs /
    #     unescape): &amp;→&, &#8217;→’, &#8211;→–, &mdash;→—, &quot;→".
    # (2) the unclosed <p>s: a <p> start tag implies closing an open p
    #     (HTML5 §13.2.6.4.7, dom.py:36), and </article> pops the last one
    #     (end-tag recovery pops through open children) → three sibling
    #     <p>s under <article>, exactly basic-article's shape.
    # (3) the crossed inline run <b>bold <i>then italic</b> crossed</i>:
    #     </b> pops through the open <i>; the stray </i> is ignored; the
    #     trailing text lands back in the <p>.  text_content is the
    #     pre-order text-node concatenation, so the run reads
    #     "bold then italic crossed inline ..." with single spaces.
    # (4) selection as in basic-article: <article> is the only scored
    #     ancestor → top candidate → ONE block = the concatenation of the
    #     three paragraph texts (each rep ends in one space; no \s{2,}
    #     runs → normalization is strip only).
    "entity-soup-malformed": {
        "text": (
            "AT&T’s third–quarter report — \"steady growth,\" "
            "analysts said — came with commas, clauses, and enough length "
            "to stay scored as article body content. " * 3
            + "Second paragraph keeps bold then italic crossed inline runs, "
              "with commas, and plenty of words to remain scored as body "
              "content in the article, truly. " * 3
            + "Third paragraph closes nothing before the article ends, yet "
              "carries commas, clauses, and sufficient length to contribute "
              "real content to the result. " * 3
        ).strip(),
        # <title> "Entity Soup & Markup Recovery | Example Site": split at
        # the pipe, first part has 5 words >= 3 -> kept (JS
        # _getArticleTitle), entities already decoded by the parser.
        "title": "Entity Soup & Markup Recovery",
    },
    # div.sidebar and div.social-share match the unlikely-candidate regex
    # (regex.lisp:9-10: 'sidebar', 'social') and not the maybe regex ->
    # stripped in the grab pass; remaining: 3 paragraphs in div#page.
    "unlikely-classes": {"text": (S * 12).strip()},
    # display:none / hidden attr / aria-hidden=true are all invisible per
    # _isProbablyVisible -> removed; 3 paragraphs remain.
    "hidden-content": {"text": (S * 12).strip()},
    # div#nav2 (30 links, ~zero non-link text, <10 commas) is removed by
    # prep-article clean-conditionally: weight 0 < 25 and linkDensity ~1 >
    # 0.2 (readability.lisp:467-485 / JS clause 5).
    "link-density": {"text": (S * 12).strip()},
    # the youtube iframe matches *videos-regex* -> kept (no text); the
    # tracker iframe doesn't -> cleaned.  Text unaffected either way.
    "video-embed-kept": {"text": (S * 12).strip()},
    # unwrap-noscript-images swaps the lazy img for the noscript's; no text.
    "noscript-img": {"text": (S * 12).strip()},
    # ul.tags: 'tags' matches the negative regex -> weight -25 < 0 ->
    # removed outright by clean-conditionally (weight + 0 < 0).
    "clean-conditional": {"text": (S * 12).strip()},
    # rtl-aria-hidden — derivation chain (written BEFORE running):
    # 1. Visibility gate (JS _isProbablyVisible / node-visible-p): the
    #    aria-hidden='true' div is skipped by the grab-article traversal
    #    BEFORE any scoring, so the nav decoy paragraph never becomes a
    #    candidate and its text cannot leak (same machinery the
    #    hidden-content fixture pins for style/hidden-attr).
    # 2. Scoring: 4 real paragraphs (3 Arabic + 1 English).  Arabic
    #    commas U+060C are in the COMMAS class (extract.py:65, mirroring
    #    Readability.js REGEXPS.commas), so the RTL paragraphs earn
    #    their comma points: each RTL_P has 8 Arabic commas + length
    #    bonus 3 -> 1+9+3; LONG_P scores as in basic-article.  All four
    #    score <article> in full (init 0 for ARTICLE in the JS base
    #    table) and div#page at half -> article is top candidate, no
    #    climb (parent scores half), no 0.75 alternative.
    # 3. Single-child hoist guard: div.siteinfo (visible, <25 chars of
    #    text -> never scored) keeps div#page at TWO children after the
    #    decoy's removal, so the JS single-child climb does NOT promote
    #    the top candidate past the dir attribute.  (First derivation
    #    attempt missed this: with the decoy removed and no second
    #    sibling, the hoist makes div#page the top candidate and dir
    #    comes back null — in Readability.js too.  The fixture pins the
    #    non-hoisted wiring on purpose.)
    # 4. Sibling merge over div#page's children: div.siteinfo has no
    #    score and is not a <p> -> not appended; article is the one
    #    block.  Article direction (JS _articleDir, extract.py:622):
    #    first dir attr on [parentOfTopCandidate=div#page (none),
    #    topCandidate=article (dir='rtl')] -> dir = 'rtl'.
    # 5. Text: the four paragraphs' texts concatenate (each literal ends
    #    in '. ') -> RTL_S*12 + S*4, stripped.  Title: 'X | Site' split
    #    at the first separator; first part has 5 words >= 3 -> kept
    #    (no short-part revert).
    "rtl-aria-hidden": {
        "text": (RTL_S * 12 + S * 4).strip(),
        "title": "عنوان المقال التجريبي الطويل Mixed",
        "dir": "rtl",
        "html_excludes": ["شريط تنقل مخفي"],
    },
    # nested-table-lazy-img — derivation chain (written BEFORE running):
    # 1. strip-unlikelys does NOT remove td.nav ('nav' is not in
    #    REGEXPS.unlikelyCandidates, regexes.py:14-21), so the nav cell is
    #    present at scoring time.
    # 2. Scoring: the 4 paragraphs score div.story in full (init +5, class
    #    'story' positive -> +25), inner td at half, deeper ancestors at
    #    /(3·level); div.story is the clear top candidate and no
    #    alternative reaches the 0.75 ratio (inner td ≈ (3 + sum/2) ≪
    #    (30 + sum)), so no common-ancestor override; the parent-climb
    #    stops immediately (parent scores are all lower).
    # 3. JS single-child climb: div.story is the ONLY element child of its
    #    td, which is the only child of its tr -> table -> outer td; the
    #    climb stops at the outer td (its parent tr has TWO children:
    #    td.nav and the content td).  Top candidate := outer content td.
    # 4. Sibling merge over the outer tr: td.nav was never scored (it
    #    contains no <p>) and is not a <p> itself -> NOT appended; the nav
    #    links stay out of the article.  One block: the outer td.
    # 5. prep-article: both layout tables inside the content are
    #    single-cell (1×1) -> unwrapped (same rule the single-cell-table
    #    fixture pins); div.story survives clean-conditionally (weight
    #    +25, linkDensity 0, img=1 ≤ p=4).
    # 6. fix-lazy-images (extract.py:728): the src is a base64 data URL
    #    with payload < 133 chars and data-src matches the image-ext
    #    regex -> placeholder src REMOVED; class contains 'lazy' and
    #    data-src matches the single-image pattern -> data-src copied to
    #    src.  fix-relative-urls then absolutizes src/data-src against the
    #    page URL: photos/hero.jpg -> .../stories/2026/photos/hero.jpg.
    # 7. Text: inner texts of the 4 paragraphs concatenate (each ends in
    #    '. '), the img contributes nothing -> S*12 + caption, stripped.
    #    Title: 'A | B' split, first part has 5 words >= 4 -> kept.
    "nested-table-lazy-img": {
        "text": (
            S * 12
            + "Lazy caption sentence with commas, context, and length to "
            "stay with the story, naturally."
        ).strip(),
        "title": "Nested Table Layout Rescue Story",
        "html_contains": [
            "https://news.example.org/stories/2026/photos/hero.jpg",
        ],
        "html_excludes": ["base64", "Home"],
    },
    # the 4th <p>'s text nodes: "See " + "the other page" + " and " +
    # " inline for more of the story, truly." -> the img contributes
    # nothing, the double space collapses to one under \s{2,} -> " ".
    "relative-urls": {
        "text": (
            S * 12 + "See the other page and inline for more of the story, truly."
        ).strip()
    },
    # base-href-media — derivation chain (JS _fixRelativeUris + HTML-spec
    # base, the ref's srcset TODO readability.lisp:210-217):
    # 1. baseURI = first <base href> resolved against the page URL →
    #    'https://cdn.example.net/assets/v2/' (absolute href wins as-is).
    # 2. baseURI != documentURI, so the JS hash guard (baseURI ==
    #    documentURI && uri[0] == '#') does NOT fire: '#frag' resolves
    #    like any relative URL → base + '#frag'.
    # 3. '../docs/page.html' against .../assets/v2/ → parent dir →
    #    https://cdn.example.net/assets/docs/page.html.
    # 4. srcset candidates rewritten one by one (regex.lisp:48-50 shape):
    #    'img/photo-480.jpg 480w' → base-relative; '/img/photo-960.jpg 2x'
    #    → root-relative against the base's HOST (cdn.example.net).
    # 5. the data: URL has a scheme → RFC 3986 join returns it unchanged;
    #    fix-lazy-images leaves it too (payload < 133 but no OTHER attr
    #    matches the image-ext regex, so the placeholder-removal clause
    #    never fires).
    # 6. nothing resolves against the page URL → news.example.com must
    #    not appear anywhere in the serialized article.
    # 7. Text: the figure contributes no text; the 4th <p>'s nodes
    #    concatenate with single spaces → S*12 + the link sentence.
    #    Title: 'A | B' pipe split, first part 5 words >= 3 → kept.
    "base-href-media": {
        "text": (
            S * 12
            + "See the appendix and the footnote for more of the story, truly."
        ).strip(),
        "title": "Base Href Srcset Resolution Story",
        "html_contains": [
            'href="https://cdn.example.net/assets/docs/page.html"',
            'href="https://cdn.example.net/assets/v2/#frag"',
            'src="https://cdn.example.net/assets/v2/img/photo.jpg"',
            "https://cdn.example.net/assets/v2/img/photo-480.jpg 480w",
            "https://cdn.example.net/img/photo-960.jpg 2x",
            'src="data:image/gif;base64,R0lGODlhAQABAAAAACw="',
        ],
        "html_excludes": ["news.example.com", 'href="#frag"'],
    },
    # base-href-lazy-img — derivation chain (the two ref-TODO
    # implementations composed, IN ORDER):
    # 1. fix-lazy-images (prep-article): the src is a base64 data URL
    #    with payload < 133 chars and ANOTHER attribute (data-src)
    #    matches the image-ext regex -> placeholder src REMOVED; class
    #    contains 'lazy' and data-src matches the single-image pattern
    #    -> data-src copied to src.  (Same two clauses the
    #    nested-table-lazy-img fixture pins — unchanged here.)
    # 2. fix-relative-urls: baseURI = the <base href> (absolute, wins
    #    as-is over the page URL), so the PROMOTED src resolves to
    #    https://cdn.example.net/assets/v2/photos/hero.jpg — NOT against
    #    news.example.com.  data-src itself is not a rewrite target
    #    (src/poster/srcset only, per the JS), so it keeps the relative
    #    bytes; the base64 placeholder must be gone entirely.
    # 3. Text: S*12 + the caption paragraph (img contributes nothing).
    #    Title: 'A | B' pipe split, first part 6 words >= 3 -> kept.
    "base-href-lazy-img": {
        "text": (
            S * 12
            + "Lazy caption sentence with commas, context, and length to "
            "stay with the story, naturally."
        ).strip(),
        "title": "Lazy Image Under Moved Base Story",
        "html_contains": [
            'src="https://cdn.example.net/assets/v2/photos/hero.jpg"',
        ],
        "html_excludes": ["base64", "news.example.com"],
    },
    # replace-brs: the <br><br> run becomes a <p> pulling SEG2 in; SEG1
    # stays as loose text wrapped by the div-children loop; one block.
    "br-runs": {"text": (SEG1 * 3 + SEG2 * 3).strip()},
    # prep-article unwraps the single-cell table; the td's paragraph plus
    # the two following paragraphs = S*12 in document order.
    "single-cell-table": {"text": (S * 12).strip()},
    # span rel=author is detected by _checkByline (readability-plump.lisp:
    # 128-135), recorded, and REMOVED from the content.
    "byline-rel-author": {
        "text": (S * 12).strip(),
        "byline": "Alice B. Charles",
    },
    # title split derivations per JS _getArticleTitle (see each comment).
    "title-pipe": {
        "text": (S * 12).strip(),
        # "A | B": first part, 5 words >= 3 -> kept, trimmed.
        "title": "Five Word Article Title Here",
    },
    "title-colon": {
        "text": (S * 12).strip(),
        # no hierarchical separator; after-colon part has 7 words >= 3 and
        # before-colon "Site Name" has 2 <= 5 words -> after-colon kept.
        "title": "Seven Word Article Title Goes Right Here",
    },
    "title-h1": {
        "text": (S * 12).strip(),
        # <title> "Shorty" is < 15 chars and the page has exactly one h1 ->
        # the h1's inner text becomes the title.
        "title": "A Completely Different Long Heading For This",
    },
    # attempt 1 strips div.comment (unlikely regex 'comment'); the grabbed
    # text is < *char-threshold* 500, so the retry loop relaxes
    # strip-unlikelys and re-grabs; still < 500 through all flags -> the
    # longest attempt (the 71-char paragraph) is kept.
    "short-article-retry": {
        "text": (
            "Short real content, under the five hundred character threshold, sadly."
        )
    },
    # the leaf div has no block children -> retagged <p> and scored; inner
    # beats outer (divider 2), then the single-child hoist climbs
    # inner -> outer (outer's only element child is inner); one block.
    "div-soup": {"text": (LOOSE * 3 + S * 12).strip()},
    # see the worked example in the module docstring: sibling #two IS
    # merged by grab-article but then removed by clean-conditionally's
    # negative-class-weight rule; WINNER block only.
    "class-weight": {"text": (S2 * 9 + WINNER).strip()},
    # markDataTables marks the <th>-bearing table a DATA table, so
    # clean-conditionally's fishiness rule (low commas, short content)
    # never evaluates it — cell texts stay, concatenated in cell order.
    "data-table-kept": {
        "text": (S * 12 + "Name Value Latency low Cost high").strip()
    },
    # the §2.9 replace-brs broken-branch resolution: the <br><br> run sits
    # INSIDE a <p>, so the new paragraph's parent is a <p> and is retagged
    # <div> (JS semantics; the reference's `(set-tag-name )` is the broken
    # branch).  Both segments survive as one block.
    "br-p-parent": {
        "text": (
            S * 12
            + "First segment before the break, with enough words to stay real "
            "content. Second segment after the break, also long enough to "
            "stay in the output."
        ).strip()
    },
    # clean-conditionally's code-ancestor guard fires BEFORE the negative
    # class weight rule, so div.widget ('widget' = -25) inside <code> is
    # preserved verbatim.
    "code-guard": {
        "text": (
            S * 12
            + "widget configuration example, shown verbatim inside the code "
            "block."
        ).strip()
    },
    # _headerDuplicatesTitle: the h1 whose text matches the <title> (text
    # similarity > 0.75) is removed from the content.
    "header-dup-title": {
        "text": (S * 12).strip(),
        "title": "Exact Heading Match Example Title",
    },
}
