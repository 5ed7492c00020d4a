"""The named golden fixture corpus (FIXTURES.md §A layout).

Each case is (name, html, url) — deterministic literals / generator calls.
``make_goldens.py`` materializes tests/fixtures/<name>/{source.html,
expected.txt, expected-metadata.json, expected-spans.json}; the snapshot
test re-extracts source.html and compares. Regenerate ONLY after an
intentional semantic change (python tests/make_goldens.py) and review the
diff — these files are the per-turn text-equality regression gate."""

from cl_readability_spark.pipeline.corpus import make_article_html

LONG_P = (
    "<p>"
    + "Body content sentences with commas, clauses, and length enough to score "
    "well in candidate selection, which keeps this paragraph firmly in the "
    "article. " * 4
    + "</p>"
)

RTL_S = (
    "فقرة المحتوى الرئيسي تحتوي على جمل عربية طويلة، وفواصل متعددة، "
    "وكلمات كافية لرفع درجة هذه الفقرة في اختيار المرشح الأعلى بوضوح. "
)
RTL_P = "<p>" + RTL_S * 4 + "</p>"

CASES: dict[str, tuple[str, str | None]] = {
    "basic-article": (
        "<html lang='en'><head><title>The Basic Article Fixture Title | Site</title></head>"
        f"<body><article id='a'>{LONG_P * 4}</article></body></html>",
        None,
    ),
    # raw-text decoys: <script> bodies are CDATA (never parsed as markup)
    # and comments are dropped at parse — paragraph-looking content inside
    # either must not leak into the article
    "script-decoy": (
        "<html lang='en'><head><title>Script Decoy Soup | Site</title></head>"
        f"<body><article id='a'>{LONG_P * 3}"
        "<script>document.write(\"<p>decoy paragraph that must never appear, "
        "with commas, and plenty of length to score well if it ever leaked "
        "into the DOM as an element, which it must not.</p>\");</script>"
        "<!-- <p>comment decoy paragraph, equally long and comma-rich, that "
        "the parser must drop wholesale before scoring ever sees it.</p> -->"
        "</article></body></html>",
        None,
    ),
    # hand-transcribed real-world pathology (no network: transcribed, not
    # fetched): wire-service-style copy full of character references plus
    # the two classic tag-soup failures — paragraphs never closed (HTML5
    # implied close, dom.py:36) and crossed inline nesting
    # (<b><i></b></i>: the </b> pops through the open <i>, the stray </i>
    # is ignored — dom.py handle_endtag recovery).  Selection shape mirrors
    # basic-article: one <article>, three scoreable paragraphs.
    "entity-soup-malformed": (
        "<html lang='en'><head><title>Entity Soup &amp; Markup Recovery | Example Site</title></head>"
        "<body><article id='wire'>"
        + (
            "<p>"
            + "AT&amp;T&#8217;s third&#8211;quarter report &mdash; &quot;steady growth,&quot; "
              "analysts said &mdash; came with commas, clauses, and enough length to stay "
              "scored as article body content. " * 3
        )  # never closed: the next <p> start tag closes it (HTML5 implied)
        + (
            "<p>"
            + "Second paragraph keeps <b>bold <i>then italic</b> crossed</i> inline runs, "
              "with commas, and plenty of words to remain scored as body content in the "
              "article, truly. " * 3
        )  # crossed </b></i> + still no </p>
        + (
            "<p>"
            + "Third paragraph closes nothing before the article ends, yet carries commas, "
              "clauses, and sufficient length to contribute real content to the result. " * 3
        )  # closed implicitly by </article>
        + "</article></body></html>",
        None,
    ),
    "div-soup": (
        "<html><body><div id='outer'><div id='inner'>"
        + "<div>"
        + "Loose phrasing text with commas, and enough length to be scored as a paragraph, truly. " * 3
        + "</div>" * 1
        + LONG_P * 3
        + "</div></div></body></html>",
        None,
    ),
    "br-runs": (
        "<html><body><div id='m'>"
        + ("Segment text with commas, structure, and heft enough to be real content. " * 3)
        + "<br><br>"
        + ("Second segment with commas, and plenty of words to matter here, still. " * 3)
        + "</div></body></html>",
        None,
    ),
    "unlikely-classes": (
        "<html><body><div id='page'>"
        "<div class='sidebar'><p>SIDEBAR-JUNK links and noise</p></div>"
        + LONG_P * 3
        + "<div class='social-share'><p>SHARE-JUNK buttons</p></div>"
        "</div></body></html>",
        None,
    ),
    "class-weight": (
        "<html><body>"
        "<div id='one' class='article-text'>"
        + ("<p>"
           + "Identical paragraph content with commas, weight, and length to make "
             "both containers score the same way, exactly. " * 3
           + "</p>") * 3
        + "<p>WINNER marker paragraph, long enough to contribute to the final text output.</p></div>"
        "<div id='two' class='widget-box'>"
        + ("<p>"
           + "Identical paragraph content with commas, weight, and length to make "
             "both containers score the same way, exactly. " * 3
           + "</p>") * 3
        + "<p>LOSER marker paragraph, long enough to contribute to the final text output.</p></div>"
        "</body></html>",
        None,
    ),
    "link-density": (
        "<html><body><div id='page'><div id='nav2'><p>"
        + "".join(f"<a href='/l/{i}'>navigation link number {i} with text</a> " for i in range(30))
        + "</p></div>"
        + LONG_P * 3
        + "</div></body></html>",
        None,
    ),
    "clean-conditional": (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<ul class='tags'>"
        + "".join(f"<li><a href='/t/{i}'>tag {i}</a></li>" for i in range(25))
        + "</ul></div></body></html>",
        None,
    ),
    "video-embed-kept": (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<iframe src='https://www.youtube.com/embed/abc123'></iframe>"
        "<iframe src='https://tracker.example.net/pixel'></iframe>"
        "</div></body></html>",
        None,
    ),
    "noscript-img": (
        "<html><body><div id='page'>"
        "<img src='spinner.gif' class='lazyload'>"
        "<noscript><img src='hero-image.jpg'></noscript>"
        + LONG_P * 3
        + "</div></body></html>",
        None,
    ),
    "relative-urls": (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<p>See <a href='/other/page'>the other page</a> and "
        "<img src='pics/photo.jpg'> inline for more of the story, truly.</p>"
        "</div></body></html>",
        "https://news.example.com/articles/today.html",
    ),
    "title-pipe": (
        "<html><head><title>Five Word Article Title Here | Long Site Name</title></head>"
        f"<body><div>{LONG_P * 3}</div></body></html>",
        None,
    ),
    "title-colon": (
        "<html><head><title>Site Name: Seven Word Article Title Goes Right Here</title></head>"
        f"<body><div>{LONG_P * 3}</div></body></html>",
        None,
    ),
    "title-h1": (
        "<html><head><title>Shorty</title></head>"
        "<body><div><h1>A Completely Different Long Heading For This</h1>"
        + LONG_P * 3
        + "</div></body></html>",
        None,
    ),
    "byline-rel-author": (
        "<html><body><div id='page'><span rel='author'>Alice B. Charles</span>"
        + LONG_P * 3
        + "</div></body></html>",
        None,
    ),
    "short-article-retry": (
        "<html><body><div class='comment'>"
        "<p>Short real content, under the five hundred character threshold, sadly.</p>"
        "</div></body></html>",
        None,
    ),
    "hidden-content": (
        "<html><body><div id='page'>"
        "<div style='display: none'><p>HIDDEN-STYLE text</p></div>"
        "<div hidden><p>HIDDEN-ATTR text</p></div>"
        "<div aria-hidden='true'><p>HIDDEN-ARIA text</p></div>"
        + LONG_P * 3
        + "</div></body></html>",
        None,
    ),
    "single-cell-table": (
        "<html><body><div id='page'>"
        f"<table><tr><td>{LONG_P}</td></tr></table>{LONG_P * 2}"
        "</div></body></html>",
        None,
    ),
    # hand-transcribed real-world pathology (transcribed, not fetched):
    # 2000s-portal layout — the article buried in nested layout TABLEs
    # (outer 1×2 with a nav cell, inner 1×1 holding the story div) plus a
    # lazy-loaded hero image: base64 placeholder src + the real URL in
    # data-src, relative to the page URL.
    # RTL + mixed-language pathology: an Arabic article under dir='rtl'
    # with one English paragraph inline, behind an aria-hidden nav decoy.
    # Pins (a) the article-dir wiring (JS _articleDir: first dir attr on
    # parentOfTopCandidate → topCandidate → ancestors) and (b) that the
    # visibility gate drops aria-hidden='true' boilerplate BEFORE scoring
    # (Arabic commas U+060C count via REGEXPS.commas, so the RTL
    # paragraphs score on their own punctuation).
    "rtl-aria-hidden": (
        "<html lang='ar'><head><title>"
        "عنوان المقال التجريبي الطويل Mixed | Site</title></head>"
        "<body><div id='page'>"
        "<div aria-hidden='true'><p>شريط تنقل مخفي بفواصل، وروابط كثيرة، "
        "يجب ألا يظهر في النص المستخرج أبداً.</p></div>"
        f"<article dir='rtl' id='main'>{RTL_P * 3}{LONG_P}</article>"
        # a second VISIBLE sibling: without it the aria-hidden removal
        # leaves div#page single-child and the JS single-child hoist
        # promotes the top candidate past the dir attribute (verified
        # against the written JS semantics — the hoist is in
        # _grabArticle); <25 chars of inner text so it is never scored
        # and never merged
        "<div class='siteinfo'><p><a href='/x'>صفحة</a></p></div>"
        "</div></body></html>",
        None,
    ),
    "nested-table-lazy-img": (
        "<html lang='en'><head><title>Nested Table Layout Rescue Story | "
        "Example Host</title></head><body>"
        "<table width='100%'><tr>"
        "<td class='nav'><a href='/'>Home</a> <a href='/world'>World</a> "
        "<a href='/sport'>Sport</a></td>"
        "<td><table><tr><td><div class='story'>"
        + LONG_P * 3
        + "<p>Lazy caption sentence with commas, context, and length to stay "
        "with the story, naturally.</p>"
        "<img class='lazyload' src='data:image/gif;base64,R0lGODlhAQABAIAAAP"
        "///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw==' data-src='photos/hero.jpg'>"
        "</div></td></tr></table></td>"
        "</tr></table></body></html>",
        "https://news.example.org/stories/2026/index.html",
    ),
    # the two ref-TODO implementations composed: fix-lazy-images promotes
    # the data-src, THEN fix-relative-urls resolves the promoted src
    # against the <base>-moved base, not the page URL.
    "base-href-lazy-img": (
        "<html><head><title>Lazy Image Under Moved Base Story | Site</title>"
        "<base href='https://cdn.example.net/assets/v2/'></head>"
        "<body><div id='page'>"
        + LONG_P * 3
        + "<p>Lazy caption sentence with commas, context, and length to stay "
        "with the story, naturally.</p>"
        "<img class='lazyload' src='data:image/gif;base64,R0lGODlhAQABAIAAAP"
        "///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw==' data-src='photos/hero.jpg'>"
        "</div></body></html>",
        "https://news.example.com/articles/today.html",
    ),
    "data-table-kept": (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<table><tr><th>Name </th><th>Value </th></tr>"
        "<tr><td>Latency </td><td>low </td></tr>"
        "<tr><td>Cost </td><td>high </td></tr></table>"
        "</div></body></html>",
        None,
    ),
    "br-p-parent": (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<p>First segment before the break, with enough words to stay real content. "
        "<br><br>Second segment after the break, also long enough to stay in the output.</p>"
        "</div></body></html>",
        None,
    ),
    "code-guard": (
        "<html><body><div id='page'>"
        + LONG_P * 3
        + "<pre><code><div class='widget'>widget configuration example, "
        "shown verbatim inside the code block.</div></code></pre>"
        "</div></body></html>",
        None,
    ),
    "header-dup-title": (
        "<html><head><title>Exact Heading Match Example Title</title></head>"
        "<body><div id='page'><h1>Exact Heading Match Example Title</h1>"
        + LONG_P * 3
        + "</div></body></html>",
        None,
    ),
    # <base href> moves the resolution base off the page URL; the 4th <p>
    # mixes a parent-relative link, an in-page hash link (which a changed
    # base RESOLVES, per JS _fixRelativeUris' baseURI==documentURI guard),
    # a relative src + mixed relative/root-relative srcset, and a data-URL
    # img that must pass through untouched.
    "base-href-media": (
        "<html><head><title>Base Href Srcset Resolution Story | Site</title>"
        "<base href='https://cdn.example.net/assets/v2/'></head>"
        "<body><div id='page'>"
        + LONG_P * 3
        + "<p>See <a href='../docs/page.html'>the appendix</a> and "
        "<a href='#frag'>the footnote</a> for more of the story, truly.</p>"
        "<figure>"
        "<img src='img/photo.jpg' "
        "srcset='img/photo-480.jpg 480w, /img/photo-960.jpg 2x'>"
        "<img src='data:image/gif;base64,R0lGODlhAQABAAAAACw='>"
        "</figure>"
        "</div></body></html>",
        "https://news.example.com/articles/today.html",
    ),
    "corpus-article-small": (make_article_html(123, n_paragraphs=8), None),
    "corpus-article-big": (make_article_html(777, n_paragraphs=60), None),
    "corpus-article-plain": (make_article_html(55, n_paragraphs=4, boilerplate=False), None),
}
