"""Fast link extraction — the frontier-expansion hot path.

Behavioral contract mirrors the reference's prefetch quick path
(``crawl4ai/utils.py:2416-2477`` ``quick_extract_links``): anchors in
document order, ``<base href>`` honored for resolution (while
internal/external classification stays anchored to the page origin),
skip-prefix filter, frontier canonicalization, first-wins dedup across the
whole page, anchor text truncated to 200 chars.

This module is the cheap projection used by crawl waves that only expand
the frontier — full markdown/metadata extraction is a separate (prunable)
column so Catalyst can skip it entirely on links-only waves.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

from crawl4ai_spark.functions.urlnorm import (
    canonicalize_for_frontier,
    get_base_domain,
    is_external_url,
    should_skip_href,
)

ANCHOR_TEXT_MAX = 200


class _LinkParser(HTMLParser):
    """Single-pass anchor + <base href> collector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str, str]] = []  # (raw_href, text, title)
        self.base_href: str | None = None
        self._href: str | None = None
        self._title: str = ""
        self._text_parts: list[str] | None = None

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag == "a":
            amap = dict(attrs)
            href = amap.get("href")
            if self._href is not None:
                self._finish_anchor()
            if href is not None:
                self._href = href
                self._title = (amap.get("title") or "").strip()
                self._text_parts = []
        elif tag == "base" and self.base_href is None:
            href = dict(attrs).get("href")
            if href:
                self.base_href = href.strip()

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._href is not None:
            self._finish_anchor()

    def handle_data(self, data: str) -> None:
        if self._text_parts is not None:
            self._text_parts.append(data)

    def _finish_anchor(self) -> None:
        text = "".join(self._text_parts or []).strip()[:ANCHOR_TEXT_MAX]
        self.anchors.append((self._href or "", text, self._title))
        self._href = None
        self._title = ""
        self._text_parts = None

    def close(self) -> None:
        if self._href is not None:
            self._finish_anchor()
        super().close()


def extract_links(html: str, base_url: str) -> dict:
    """Extract {internal: [{href, text}], external: [...]} from raw HTML."""
    parser = _LinkParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return {"internal": [], "external": []}

    # Classification anchors to the true page origin even when <base> points
    # elsewhere; resolution follows <base href> (relative base resolved
    # against the page URL).
    base_domain = get_base_domain(base_url)
    resolve_base = base_url
    if parser.base_href:
        resolve_base = urljoin(base_url, parser.base_href)

    internal: list[dict] = []
    external: list[dict] = []
    seen: set[str] = set()
    for raw_href, text, title in parser.anchors:
        href = raw_href.strip()
        if should_skip_href(href):
            continue
        canonical = canonicalize_for_frontier(href, resolve_base)
        if not canonical or canonical in seen:
            continue
        seen.add(canonical)
        record = {"href": canonical, "text": text, "title": title}
        if is_external_url(canonical, base_domain):
            external.append(record)
        else:
            internal.append(record)
    return {"internal": internal, "external": external}
