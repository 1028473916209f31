"""Head/meta/language extraction.

Behavioral contract: the reference's head-extraction surface
(``crawl4ai/utils.py:1497-1580`` extract_metadata_using_lxml,
``crawl4ai/async_url_seeder.py:227-255`` lang/charset capture,
``crawl4ai/utils.py:2847-2905`` head fingerprint). Pure stdlib.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_LANG_RE = re.compile(r"<html[^>]*\blang=[\"']?([A-Za-z-]+)", re.IGNORECASE)


def extract_lang(html: str) -> str:
    """``<html lang>`` attribute (regex fast path, same as the Spark-native
    ``regexp_extract`` column used in the wave pipeline)."""
    m = _LANG_RE.search(html[:2048])
    return m.group(1) if m else ""


class _HeadParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.meta: dict[str, str] = {}
        self.lang = ""
        self._in_title = False
        self._done = False

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if self._done:
            return
        attrs_d = dict(attrs)
        if tag == "html":
            self.lang = (attrs_d.get("lang") or "").strip()
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            key = attrs_d.get("name") or attrs_d.get("property")
            content = attrs_d.get("content")
            if key and content is not None and key not in self.meta:
                self.meta[key.lower()] = content
        elif tag == "body":
            self._done = True

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
        elif tag == "head":
            self._done = True

    def handle_data(self, data: str) -> None:
        if self._in_title and not self._done:
            self.title_parts.append(data)


def extract_head_meta(html: str) -> dict:
    """Parse only the document head: title, meta map, lang."""
    parser = _HeadParser()
    try:
        # head is at the top; cap work for giant documents
        parser.feed(html[:65536])
        parser.close()
    except Exception:
        pass
    return {
        "title": "".join(parser.title_parts).strip(),
        "description": parser.meta.get("description", ""),
        "keywords": parser.meta.get("keywords", ""),
        "author": parser.meta.get("author", ""),
        "meta": parser.meta,
        "lang": parser.lang,
    }


# change-detection meta signals, in reference order (utils.py:2876-2886)
HEAD_FINGERPRINT_METAS = (
    ("name", "description"),
    ("name", "last-modified"),
    ("property", "og:title"),
    ("property", "og:description"),
    ("property", "og:image"),
    ("property", "og:updated_time"),
    ("property", "article:modified_time"),
)


def head_fingerprint_text(html: str) -> str:
    """Stable '|'-joined head signal string for cache validation —
    reference ``compute_head_fingerprint`` semantics (utils.py:2847-2905):
    lowercased head, title + 7 change-signal metas (both attribute
    orders), empty string when no signals. Hash the result with Spark's
    native ``xxhash64`` (the reference uses python-xxhash XXH64; we pin
    the Spark builtin as the engine's convention — same algorithm family,
    different seed, equality semantics identical)."""
    if not html:
        return ""
    head_lower = html[:65536].lower()
    signals: list[str] = []
    m = re.search(r"<title[^>]*>(.*?)</title>", head_lower, re.DOTALL)
    if m:
        signals.append(m.group(1).strip())
    for attr, value in HEAD_FINGERPRINT_METAS:
        for pattern in (
            rf'<meta[^>]*{attr}=["\']{re.escape(value)}["\'][^>]*content=["\']([^"\']*)["\']',
            rf'<meta[^>]*content=["\']([^"\']*)["\'][^>]*{attr}=["\']{re.escape(value)}["\']',
        ):
            hit = re.search(pattern, head_lower)
            if hit:
                signals.append(hit.group(1).strip())
                break
    return "|".join(signals)
