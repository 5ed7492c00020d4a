"""Article metadata: JSON-LD + <meta> tags + title/byline merge.

The reference leaves these as TODOs (readability-plump.lisp:330,337-341,346)
while declaring the JSON-LD article-type regex (regex.lisp:54-55); per the
build rule we implement the Readability.js semantics those TODOs cite:
``_getJSONLD`` and ``_getArticleMetadata``.
"""

from __future__ import annotations

import json
import re

from cl_readability_spark.core.dom import Document, get_elements_by_tag
from cl_readability_spark.core.text import text_similarity

# regex.lisp:54-55 — Readability.REGEXPS.jsonLdArticleTypes
JSON_LD_ARTICLE_TYPES = re.compile(
    r"^Article|AdvertiserContentArticle|NewsArticle|AnalysisNewsArticle"
    r"|AskPublicNewsArticle|BackgroundNewsArticle|OpinionNewsArticle"
    r"|ReportageNewsArticle|ReviewNewsArticle|Report|SatiricalArticle"
    r"|ScholarlyArticle|MedicalScholarlyArticle|SocialMediaPosting|BlogPosting"
    r"|LiveBlogPosting|DiscussionForumPosting|TechArticle|APIReference$"
)

SCHEMA_ORG = re.compile(r"^https?\:\/\/schema\.org\/?$")

# Readability.js _getArticleMetadata property/name patterns
PROPERTY_PATTERN = re.compile(
    r"\s*(article|dc|dcterm|og|twitter)\s*:\s*"
    r"(author|creator|pub-date|description|title|site_name|published_time)\s*",
    re.I,
)
NAME_PATTERN = re.compile(
    r"^\s*(?:(dc|dcterm|og|twitter|parsely|weibo:(article|webpage))\s*[-\.:]\s*)?"
    r"(author|creator|pub-date|description|title|site_name|published_time)\s*$",
    re.I,
)

URL_RE = re.compile(r"^https?://", re.I)


def get_json_ld(doc: Document) -> dict:
    """Readability._getJSONLD: first schema.org Article-typed ld+json block
    wins; returns {title?, byline?, excerpt?, site_name?, published_time?}."""
    for script in get_elements_by_tag(doc, "script"):
        if script.get("type") != "application/ld+json":
            continue
        try:
            content = script.text_content()
            # strip CDATA markers (JS does the same)
            content = re.sub(r"^\s*<!\[CDATA\[|\]\]>\s*$", "", content)
            parsed = json.loads(content)
        except (ValueError, TypeError):
            continue
        if not isinstance(parsed, dict):
            continue
        context = parsed.get("@context")
        if not (isinstance(context, str) and SCHEMA_ORG.match(context.strip())):
            continue
        if "@type" not in parsed and isinstance(parsed.get("@graph"), list):
            found = None
            for item in parsed["@graph"]:
                if (
                    isinstance(item, dict)
                    and isinstance(item.get("@type"), str)
                    and JSON_LD_ARTICLE_TYPES.search(item["@type"])
                ):
                    found = item
                    break
            if found is None:
                continue
            parsed = found
        at_type = parsed.get("@type")
        if not (isinstance(at_type, str) and JSON_LD_ARTICLE_TYPES.search(at_type)):
            continue

        metadata: dict = {}
        name = parsed.get("name")
        headline = parsed.get("headline")
        if isinstance(name, str) and isinstance(headline, str) and name != headline:
            from cl_readability_spark.core.extract import get_article_title

            title = get_article_title(doc)
            name_matches = text_similarity(name, title) > 0.75
            headline_matches = text_similarity(headline, title) > 0.75
            metadata["title"] = (
                headline.strip() if headline_matches and not name_matches else name.strip()
            )
        elif isinstance(name, str):
            metadata["title"] = name.strip()
        elif isinstance(headline, str):
            metadata["title"] = headline.strip()

        author = parsed.get("author")
        if isinstance(author, dict) and isinstance(author.get("name"), str):
            metadata["byline"] = author["name"].strip()
        elif isinstance(author, list):
            names = [
                a["name"].strip()
                for a in author
                if isinstance(a, dict) and isinstance(a.get("name"), str)
            ]
            if names:
                metadata["byline"] = ", ".join(names)

        if isinstance(parsed.get("description"), str):
            metadata["excerpt"] = parsed["description"].strip()
        publisher = parsed.get("publisher")
        if isinstance(publisher, dict) and isinstance(publisher.get("name"), str):
            metadata["site_name"] = publisher["name"].strip()
        if isinstance(parsed.get("datePublished"), str):
            metadata["published_time"] = parsed["datePublished"].strip()
        return metadata
    return {}


def get_article_metadata(doc: Document, jsonld: dict, fallback_title: str) -> dict:
    """Readability._getArticleMetadata: merge JSON-LD > meta tags > document
    title. Returns {title, byline, excerpt, site_name, published_time} (None
    where absent)."""
    values: dict[str, str] = {}
    for meta in get_elements_by_tag(doc, "meta"):
        content = meta.get("content")
        if not content:
            continue
        element_name = meta.get("name")
        element_property = meta.get("property")
        if element_property:
            for m in PROPERTY_PATTERN.finditer(element_property):
                # JS: matches[0].toLowerCase() with whitespace removed
                key = re.sub(r"\s", "", m.group(0)).lower()
                values[key] = content.strip()
        if element_name and NAME_PATTERN.match(element_name):
            key = re.sub(r"\s", "", element_name.lower()).replace(".", ":")
            values[key] = content.strip()

    def pick(*keys):
        for k in keys:
            if k in values:
                return values[k]
        return None

    title = jsonld.get("title") or pick(
        "dc:title", "dcterm:title", "og:title", "weibo:article:title",
        "weibo:webpage:title", "title", "twitter:title", "parsely-title",
    )
    if not title:
        title = fallback_title

    article_author = values.get("article:author")
    if article_author is not None and URL_RE.match(article_author):
        article_author = None
    byline = jsonld.get("byline") or pick(
        "dc:creator", "dcterm:creator", "author", "parsely-author"
    ) or article_author

    excerpt = jsonld.get("excerpt") or pick(
        "dc:description", "dcterm:description", "og:description",
        "weibo:article:description", "weibo:webpage:description",
        "description", "twitter:description",
    )
    site_name = jsonld.get("site_name") or values.get("og:site_name")
    published_time = jsonld.get("published_time") or values.get(
        "article:published_time"
    )

    return {
        "title": title or None,
        "byline": byline,
        "excerpt": excerpt,
        "site_name": site_name,
        "published_time": published_time,
    }
