"""HTML → markdown converter, byte-compatible with the reference dialect.

The reference generates markdown via its vendored html2text fork
(``crawl4ai/html2text/__init__.py``, ``CustomHTML2Text``) driven by
``DefaultMarkdownGenerator`` with a FIXED option set
(``markdown_generation_strategy.py:181-190``): ``body_width=0`` (no
wrapping), ``single_line_break=True``, ``mark_code=True``,
``escape_snob=False`` (and the CustomHTML2Text constructor pins
``ignore_mailto_links=True``, ``skip_internal_links=False``, all the
``escape_*`` flags off).  This module is a from-scratch event-driven
implementation of exactly that configuration — the large majority of the
upstream machinery (line wrapping, google-docs styles, reference-style
links, table padding, protected links) is dead code under these options
and is not reproduced.

Byte parity is enforced by ``tests/test_markdown_parity.py``, which runs
the reference converter (loaded from the read-only reference tree as a
test-time oracle) side by side with this one over the synthetic corpus
and an adversarial fixture battery.

Dialect summary (all verified against the oracle):
- blocks separated by a single ``\\n`` (single_line_break);
- ``# `` headings, ``_em_``, ``**strong**``, `` `code` ``,
  ``[text](url "title")``, ``![alt](src)``, autolinks ``<url>`` when the
  anchor text equals its absolute href;
- lists ``  * item`` / ``  1. item`` (two spaces per nesting level, three
  for a ul directly inside an ol), ``start`` attribute honored;
- ``<pre data-language="x">`` → ```` ```x ```` fenced block, verbatim;
- ``<br>`` → ``"  \\n"``; ``<hr>`` → ``* * *``; blockquotes ``> ``-prefixed;
- GFM table rows with a ``---`` separator after the first row; soft breaks
  leave a trailing two-space on table/caption lines;
- entity refs are "unified" (``&mdash;``→``--``, ``&nbsp;``→space, ...);
- no markdown-character escaping in text (escape flags all off); URLs,
  image alt and link titles escape ``\\ [ ] ( )``.
"""

from __future__ import annotations

import html.entities
import re
import string
from html.parser import HTMLParser
from urllib.parse import urljoin

# Entity "unification" table of the reference converter (html2text
# config.UNIFIABLE): named/numeric character references rendered as ASCII.
UNIFIED_ENTITIES: dict[str, str] = {
    "rsquo": "'", "lsquo": "'", "rdquo": '"', "ldquo": '"',
    "copy": "(C)", "mdash": "--", "nbsp": " ", "rarr": "->", "larr": "<-",
    "middot": "*", "ndash": "-", "oelig": "oe", "aelig": "ae",
    "agrave": "a", "aacute": "a", "acirc": "a", "atilde": "a", "auml": "a",
    "aring": "a", "egrave": "e", "eacute": "e", "ecirc": "e", "euml": "e",
    "igrave": "i", "iacute": "i", "icirc": "i", "iuml": "i",
    "ograve": "o", "oacute": "o", "ocirc": "o", "otilde": "o", "ouml": "o",
    "ugrave": "u", "uacute": "u", "ucirc": "u", "uuml": "u",
    "lrm": "", "rlm": "",
}
_NBSP_MARK = "&nbsp_place_holder;"
_UNIFIED_BY_CODEPOINT = {
    html.entities.name2codepoint[k]: v
    for k, v in UNIFIED_ENTITIES.items()
    if k != "nbsp"
}
_ABS_URL_RE = re.compile(r"^[a-zA-Z+]+://")
_MD_URL_ESCAPE_RE = re.compile(r"([\\\[\]\(\)])")
_WS_RUN_RE = re.compile(r"\s+")
_STRESS_BOUNDARY_RE = re.compile(r"[^][(){}\s.!?]")


def _heading_level(tag: str) -> int:
    if len(tag) == 2 and tag[0] == "h" and "0" < tag[1] <= "9":
        return int(tag[1])
    return 0


def _escape_url(text: str) -> str:
    return _MD_URL_ESCAPE_RE.sub(r"\\\1", text)


class _OrderedListCounter:
    __slots__ = ("kind", "num")

    def __init__(self, kind: str, start_attr: str | None):
        self.kind = kind
        try:
            self.num = int(start_attr) - 1 if start_attr is not None else 0
        except ValueError:
            self.num = 0


class MarkdownEmitter(HTMLParser):
    """Streaming emitter for the fixed reference option set.

    State mirrors the *semantics* of the upstream machine: a count of
    pending block newlines, a pending-space flag, a blockquote depth used
    to prefix flushed newlines, and a soft-break suffix that produces the
    trailing two-space on table rows.
    """

    def __init__(self, base_url: str = "") -> None:
        super().__init__(convert_charrefs=False)
        self.base_url = base_url
        self._chunks: list[str] = []
        self._ended_nl = False        # last emitted chunk ended with \n
        self._pending_nl = 0          # block newlines to flush before next text
        self._pending_space = False   # collapsed leading whitespace to flush
        self._soft_suffix = ""        # "  " after table/caption rows
        self._fresh_line = True       # suppress breaks at start of output/li/quote
        self._suppress = 0            # inside head/style/script
        self._quote_depth = 0
        self._lists: list[_OrderedListCounter] = []
        self._after_list_tag = False
        self._in_header = False
        self._in_pre = False
        self._in_code = False
        self._in_link = False
        self._anchor_stack: list[dict | None] = []
        self._auto_link_href: str | None = None
        self._anchor_empty = False
        self._stress_open = False     # strip next text chunk (just opened mark)
        self._stress_closed = False   # maybe space-pad next text chunk
        self._last_text = ""
        self._active_tag = ""
        self._table_header_row = False
        self._cell_count = 0
        self._mid_row = False
        self._quote_toggle = False
        self._abbr_title: str | None = None
        self._abbr_text: str | None = None
        self._abbrs: dict[str, str] = {}

    # ── low-level output ────────────────────────────────────────────────

    def _push(self, s: str) -> None:
        self._chunks.append(s)
        if s:
            self._ended_nl = s.endswith("\n")

    def _emit(self, data: str, collapse: bool = False, force=False) -> None:
        """The whitespace/break-flushing gate every output passes through."""
        if self._abbr_text is not None:
            self._abbr_text += data
        if self._suppress:
            return
        if collapse:
            data = _WS_RUN_RE.sub(" ", data)
            if data.startswith(" "):
                self._pending_space = True
                data = data[1:]
        if not data and not force:
            return
        prefix = ">" * self._quote_depth
        if self._quote_depth and not (force and data and data[0] == ">"):
            prefix += " "
        if self._fresh_line:
            self._pending_space = False
            self._pending_nl = 0
            self._fresh_line = False
        if force == "end":
            self._pending_nl = 0
            self._push("\n")
            self._pending_space = False
        if self._pending_nl:
            self._push((self._soft_suffix + "\n" + prefix) * self._pending_nl)
            self._pending_space = False
            self._soft_suffix = ""
        if self._pending_space:
            if not self._ended_nl:
                self._push(" ")
            self._pending_space = False
        if self._abbrs and force == "end":
            for text, title in self._abbrs.items():
                self._push("  *[" + text + "]: " + title + "\n")
        self._pending_nl = 0
        self._push(data)

    def _break(self) -> None:
        """Queue a single block break (single_line_break mode)."""
        self._pending_nl = 1

    def _line_break(self) -> None:
        if self._pending_nl == 0:
            self._pending_nl = 1

    def _soft_break(self) -> None:
        self._line_break()
        self._soft_suffix = "  "

    # ── anchor helpers ──────────────────────────────────────────────────

    def _open_bracket_if_pending(self) -> None:
        if self._auto_link_href is not None:
            self._emit("[")
            self._auto_link_href = None
            self._anchor_empty = False

    # ── parser events ───────────────────────────────────────────────────

    def handle_starttag(self, tag: str, attrs: list) -> None:
        self._element(tag, dict(attrs), True)

    def handle_endtag(self, tag: str) -> None:
        self._element(tag, {}, False)

    def handle_entityref(self, name: str) -> None:
        if name in UNIFIED_ENTITIES:
            text = _NBSP_MARK if name == "nbsp" else UNIFIED_ENTITIES[name]
        else:
            ch = html.entities.html5.get(name + ";")
            text = ch if ch is not None else "&" + name + ";"
        if text:
            self.handle_data(text, True)

    def handle_charref(self, ref: str) -> None:
        try:
            cp = int(ref[1:], 16) if ref[0] in "xX" else int(ref)
        except ValueError:
            return
        if cp in _UNIFIED_BY_CODEPOINT:
            text = _UNIFIED_BY_CODEPOINT[cp]
        else:
            try:
                text = chr(cp)
            except ValueError:
                text = ""
        self.handle_data(text, True)

    def handle_data(self, data: str, is_entity: bool = False) -> None:
        if not data:
            return
        if self._in_pre:
            self._emit(data)
            return
        if self._in_code:
            self._emit(data.replace("\n", " "))
            return
        if self._stress_open:
            data = data.strip()
            self._stress_open = False
            self._stress_closed = True
        elif self._stress_closed:
            if (
                _STRESS_BOUNDARY_RE.match(data[0])
                and not _heading_level(self._active_tag)
                and self._active_tag not in ("a", "code", "pre")
            ):
                data = " " + data
            self._stress_closed = False
        if self._auto_link_href is not None:
            href = self._auto_link_href
            if href == data and _ABS_URL_RE.match(href):
                self._emit("<" + data + ">")
                self._anchor_empty = False
                return
            self._emit("[")
            self._auto_link_href = None
            self._anchor_empty = False
        self._last_text = data
        self._emit(data, collapse=True)

    # ── the per-element dispatcher ──────────────────────────────────────

    def _element(self, tag: str, attrs: dict, start: bool) -> None:
        # <base> can appear before anything else (it lives in <head>)
        if tag == "base" and start and attrs.get("href"):
            self.base_url = attrs["href"]

        # fenced code blocks (reference CustomHTML2Text pre handling —
        # verbatim content, language from data-language)
        if tag == "pre":
            if start:
                self._emit("\n```" + (attrs.get("data-language") or "") + "\n")
                self._in_pre = True
            else:
                self._emit("\n```\n")
                self._in_pre = False
            return
        if tag == "code":
            if self._in_pre:
                return
            if not self._in_link:
                self._emit("`")
                self._in_code = start
                return
            # inside a link the generic path below emits the backtick
            self._in_code = start

        self._active_tag = tag

        # a tag opening as the first content of an anchor commits the "["
        if (
            start
            and self._auto_link_href is not None
            and tag not in ("p", "div", "style", "dl", "dt", "img")
        ):
            self._open_bracket_if_pending()

        level = _heading_level(tag)
        if level:
            if self._anchor_stack:
                if start:
                    self._in_header = True
                    # heading inside a link: hoist '#' before the '['
                    if self._chunks and self._chunks[-1] == "[":
                        self._chunks.pop()
                        self._pending_space = False
                        self._emit("#" * level + " ")
                        self._emit("[")
                else:
                    self._pending_nl = 0
                    self._in_header = False
                    return
            else:
                self._break()
                if start:
                    self._in_header = True
                    self._emit("#" * level + " ")
                else:
                    self._in_header = False
                    return

        if tag in ("p", "div"):
            if not self._anchor_stack and not self._mid_row:
                self._break()

        if tag == "br" and start:
            self._emit("  \n> " if self._quote_depth > 0 else "  \n")

        if tag == "hr" and start:
            self._break()
            self._emit("* * *")
            self._break()

        if tag in ("head", "style", "script"):
            self._suppress += 1 if start else -1
        if tag == "body":
            self._suppress = 0

        if tag == "blockquote":
            if start:
                self._break()
                self._emit("> ", force=True)
                self._fresh_line = True
                self._quote_depth += 1
            else:
                self._quote_depth -= 1
                self._break()

        if tag in ("em", "i", "u"):
            mark = "_"
            if (
                start
                and self._last_text
                and self._last_text[-1] not in string.whitespace
                and self._last_text[-1] not in string.punctuation
            ):
                mark = " _"
                self._last_text += " "
            self._emit(mark)
            if start:
                self._stress_open = True

        if tag in ("strong", "b"):
            mark = "**"
            if start and self._last_text and self._last_text[-1] == "*":
                mark = " **"
                self._last_text += " "
            self._emit(mark)
            if start:
                self._stress_open = True

        if tag in ("del", "strike", "s"):
            mark = "~~"
            if start and self._last_text and self._last_text[-1] == "~":
                mark = " ~~"
                self._last_text += " "
            self._emit(mark)
            if start:
                self._stress_open = True

        if tag in ("kbd", "code", "tt"):
            self._emit("`")

        if tag == "abbr":
            if start:
                self._abbr_title = attrs.get("title")
                self._abbr_text = ""
            else:
                if self._abbr_title is not None and self._abbr_text is not None:
                    self._abbrs[self._abbr_text] = self._abbr_title
                    self._abbr_title = None
                self._abbr_text = None

        if tag == "q":
            self._emit('"')
            self._quote_toggle = not self._quote_toggle

        if tag == "a":
            if start:
                self._in_link = True
                href = attrs.get("href")
                if href is not None and not href.startswith("mailto:"):
                    self._anchor_stack.append(attrs)
                    self._auto_link_href = href
                    self._anchor_empty = True
                else:
                    self._anchor_stack.append(None)
            else:
                self._in_link = False
                if self._anchor_stack:
                    anchor = self._anchor_stack.pop()
                    if self._auto_link_href and not self._anchor_empty:
                        self._auto_link_href = None
                    elif anchor:
                        if self._anchor_empty:
                            self._emit("[")
                            self._anchor_empty = False
                            self._auto_link_href = None
                        self._pending_nl = 0
                        title = _escape_url(anchor.get("title") or "")
                        suffix = ' "{}"'.format(title) if title.strip() else ""
                        url = urljoin(self.base_url, anchor["href"])
                        self._emit("](" + _escape_url(url) + suffix + ")")

        if tag == "img" and start and attrs.get("src") is not None:
            alt = attrs.get("alt") or ""
            self._open_bracket_if_pending()
            self._emit("![" + _escape_url(alt) + "]")
            self._emit("(" + _escape_url(urljoin(self.base_url, attrs["src"])) + ")")

        if tag == "dl" and start:
            self._break()
            self._pending_nl = 0
        elif tag == "dt" and start:
            if self._pending_nl == 0:
                self._emit("\n\n")
            self._pending_nl = 0
        elif tag == "dt":
            self._emit("\n")
        elif tag == "dd" and start:
            self._emit("    ")
        elif tag == "dd":
            self._pending_nl = 0

        if tag in ("ol", "ul"):
            if not self._lists and not self._after_list_tag:
                self._break()
            if start:
                self._lists.append(_OrderedListCounter(tag, attrs.get("start")))
            elif self._lists:
                self._lists.pop()
                if not self._lists:
                    self._emit("\n")
            self._after_list_tag = True
        else:
            self._after_list_tag = False

        if tag == "li":
            self._line_break()
            if start:
                item = self._lists[-1] if self._lists else _OrderedListCounter("ul", None)
                enclosing = None
                for lst in self._lists:
                    self._emit("   " if enclosing == "ol" and lst.kind == "ul" else "  ")
                    enclosing = lst.kind
                if item.kind == "ol":
                    item.num += 1
                    self._emit(f"{item.num}. ")
                else:
                    self._emit("* ")
                self._fresh_line = True

        if tag == "caption" and not start:
            self._soft_break()

        if tag == "table" and start:
            self._table_header_row = True
            self._soft_break()
        if tag == "tr":
            if start:
                self._cell_count = 0
            else:
                self._emit(" |")
                self._mid_row = False
                self._soft_break()
                if self._table_header_row:
                    self._emit("| " + " | ".join(["---"] * self._cell_count) + " |")
                    self._soft_break()
                    self._table_header_row = False
        if tag in ("td", "th") and start:
            self._emit(" | " if self._mid_row else "| ")
            self._mid_row = True
            self._cell_count += 1

    # ── driver ──────────────────────────────────────────────────────────

    def convert(self, html_text: str) -> str:
        self.feed(html_text.replace("</' + 'script>", "</ignore>"))
        self.close()
        self._line_break()
        self._emit("", force="end")
        return "".join(self._chunks).replace(_NBSP_MARK, " ")


def convert_to_markdown(html_text: str, base_url: str = "") -> str:
    """Reference-dialect HTML→markdown, including the generator's
    ``"    ```"`` fence-unindent post-fix
    (markdown_generation_strategy.py:214)."""
    if html_text is None:
        html_text = ""
    out = MarkdownEmitter(base_url).convert(html_text)
    return out.replace("    ```", "```")
