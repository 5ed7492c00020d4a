"""Deterministic synthetic transcript corpus (FIXTURES.md §B).

Generates multi-turn conversations whose ``text`` column carries HTML in the
shape Readability cares about: a main-content region of paragraphs plus
boilerplate (nav/sidebar/footer/comments), with log-normal-ish doc-length
skew, ~5% plain-text turns and ~1% malformed turns.  Seeded ``random.Random``
only — no wall clock, no global RNG — so every call site (tests, bench,
scaling runs) sees identical data.
"""

from __future__ import annotations

import random

_WORDS = (
    "analysis spark data pipeline cluster executor shuffle partition schema "
    "column transcript conversation agent extraction content article reader "
    "paragraph heuristic candidate score density weight threshold sibling "
    "merge retry flag iceberg snapshot checkpoint lineage metric throughput "
    "scaling efficiency vectorized arrow batch python java scala memory disk "
    "network latency bandwidth quality tokens corpus document boilerplate"
).split()


def _sentence(rng: random.Random) -> str:
    n = rng.randint(6, 16)
    words = [rng.choice(_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    # commas matter to the scoring (comma bonus)
    if n > 8:
        words[rng.randint(2, n - 3)] += ","
    return " ".join(words) + "."


def _paragraph(rng: random.Random, sentences: int) -> str:
    return " ".join(_sentence(rng) for _ in range(sentences))


def make_article_html(
    seed: int,
    n_paragraphs: int = 5,
    sentences_per_paragraph: int = 4,
    boilerplate: bool = True,
    title: str | None = None,
) -> str:
    """One article-shaped HTML document; fully determined by the arguments."""
    rng = random.Random(seed)
    title = title or f"Document {seed} Report Of The {rng.choice(_WORDS).capitalize()}"
    paras = "\n".join(
        f"<p>{_paragraph(rng, sentences_per_paragraph)}</p>"
        for _ in range(n_paragraphs)
    )
    nav = (
        '<div class="header"><ul>'
        + "".join(f'<li><a href="/s/{i}">Section {i}</a></li>' for i in range(5))
        + "</ul></div>"
    )
    sidebar = (
        '<div class="sidebar"><p>'
        + " ".join(f'<a href="/rel/{i}">related {i}</a>' for i in range(8))
        + "</p></div>"
    )
    comments = (
        '<div class="comments"><p>'
        + _sentence(rng)
        + "</p></div>"
    )
    footer = '<div class="footer"><p>Copyright, terms, privacy.</p></div>'
    boiler_top = nav if boilerplate else ""
    boiler_bottom = (sidebar + comments + footer) if boilerplate else ""
    return (
        f'<html lang="en"><head><title>{title} | Synthetic Site</title></head>'
        f"<body>{boiler_top}"
        f'<div id="main" class="article-content"><h1>{title}</h1>\n{paras}</div>'
        f"{boiler_bottom}</body></html>"
    )


def make_turn_text(rng: random.Random, conv_seed: int, turn_idx: int) -> str:
    """Per-turn payload: mostly HTML articles with skewed length, some plain
    text (~5%), some malformed HTML (~1%)."""
    roll = rng.random()
    doc_seed = conv_seed * 1000 + turn_idx
    if roll < 0.01:
        return "<div><p>unclosed paragraph <b>dangling " + _sentence(rng)
    if roll < 0.06:
        return _paragraph(rng, rng.randint(1, 4))
    # log-normal-ish length skew: a few 20×-sized docs
    r = rng.random()
    if r < 0.02:
        n_paras = rng.randint(60, 120)
    elif r < 0.2:
        n_paras = rng.randint(10, 25)
    else:
        n_paras = rng.randint(2, 8)
    return make_article_html(
        doc_seed,
        n_paragraphs=n_paras,
        sentences_per_paragraph=rng.randint(2, 5),
        boilerplate=rng.random() < 0.8,
    )


def build_transcript_rows(
    n_conversations: int, seed: int = 42, base_ts: int = 1_700_000_000
) -> list[tuple]:
    """Rows of the authoritative input schema (BASELINE.json input_hint):
    (conv_id, turn_idx, role, text, tool, ts-seconds).  ``ts`` is returned as
    epoch seconds; the Spark layer casts to timestamp."""
    rows: list[tuple] = []
    roles = ("user", "assistant", "tool")
    for c in range(n_conversations):
        conv_seed = seed * 100_000 + c
        rng = random.Random(conv_seed)
        conv_id = f"conv-{c:06d}"
        n_turns = rng.randint(1, 50)
        for t in range(n_turns):
            role = roles[rng.randint(0, 2)]
            tool = f"tool_{rng.randint(0, 9)}" if role == "tool" else None
            text = make_turn_text(rng, conv_seed, t)
            ts = base_ts + c * 86_400 + t * 60
            rows.append((conv_id, t, role, text, tool, ts))
    return rows
