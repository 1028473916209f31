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


HEAD_FINGERPRINT_FIELDS = ("title", "description", "keywords", "author")


def head_fingerprint_text(html: str) -> str:
    """Stable '|'-joined head signal string; hash it with xxhash64 in Spark
    (reference joins head signals then XXH64s — utils.py:2847-2905)."""
    meta = extract_head_meta(html)
    return "|".join(meta[f] for f in HEAD_FINGERPRINT_FIELDS)
