"""HTML → markdown conversion — the engine's text-extraction invariant.

Role parity with the reference's markdown stage
(``crawl4ai/markdown_generation_strategy.py:55-260`` +
vendored html2text ``crawl4ai/html2text/__init__.py``): produce
``raw_markdown``, ``markdown_with_citations``, ``references_markdown`` per
page, with fenced code blocks carrying ``data-language`` and GFM tables.
Implementation is clean-room over stdlib ``html.parser`` (lxml/html2text
are unavailable here), with the conversion contract pinned by a byte-exact
round-trip invariant against the synthetic corpus generator
(markdown → HTML → this converter → identical markdown).

Conversion conventions (the engine's documented dialect):
- ``h1..h6`` → ``#``·n prefix; blocks separated by exactly one blank line;
  document ends with a single trailing newline.
- inline: ``**strong**``, ``*em*``, ```code```, ``[text](href)``,
  ``![alt](src)``; whitespace runs collapse to a single space.
- ``ul`` → ``- item``; ``ol`` → ``1. item`` (real numbering); nested lists
  indent two spaces per level.
- ``pre`` (optionally ``data-language`` / ``<code class="language-x">``) →
  fenced block preserving bytes verbatim.
- ``blockquote`` → ``> `` prefix per line; ``hr`` → ``---``.
- ``table`` → GFM pipe table (header row from ``th``).
- ``script/style/noscript/head/template`` dropped; unknown block tags are
  transparent containers.

Citations (reference semantics: LINK_PATTERN rewrite + "## References"
block, URL-deduped with a running counter): ``[text](url)`` becomes
``text⟨n⟩`` where n is the first-occurrence index of the url, and
``references_markdown`` lists ``⟨n⟩ url`` one per line.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    {"br", "img", "hr", "meta", "link", "input", "base", "source", "col", "wbr", "area", "embed"}
)
DROP_TAGS = frozenset({"script", "style", "noscript", "head", "template", "svg", "iframe"})
INLINE_TAGS = frozenset(
    {"a", "b", "strong", "i", "em", "code", "span", "img", "br", "u", "small", "sub", "sup"}
)

_WS_RE = re.compile(r"\s+")
_LINK_MD_RE = re.compile(r"\[([^\]]*)\]\(([^()\s]+)\)")


class Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # str | Node


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self._stack = [self.root]
        self._drop_depth = 0

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if self._drop_depth:
            if tag in DROP_TAGS or tag not in VOID_TAGS:
                self._drop_depth += 1 if tag in DROP_TAGS else 0
            return
        if tag in DROP_TAGS:
            self._drop_depth = 1
            return
        node = Node(tag, dict(attrs))
        self._stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        if self._drop_depth:
            return
        if tag in DROP_TAGS:
            return
        self._stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag: str) -> None:
        if self._drop_depth:
            if tag in DROP_TAGS:
                self._drop_depth -= 1
            return
        if tag in VOID_TAGS:
            return
        # close the nearest matching open tag (tolerate misnesting)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ──────────────────────────────────────────────────────────────────────────
# Rendering
# ──────────────────────────────────────────────────────────────────────────


def _render_inline(node: Node) -> str:
    """Render a node's children as inline markdown (whitespace collapsed)."""
    parts: list[str] = []
    for child in node.children:
        if isinstance(child, str):
            parts.append(child)
        else:
            parts.append(_render_inline_node(child))
    text = "".join(parts)
    return _WS_RE.sub(" ", text)


def _render_inline_node(node: Node) -> str:
    tag = node.tag
    if tag in ("strong", "b"):
        inner = _render_inline(node).strip()
        return f"**{inner}**" if inner else ""
    if tag in ("em", "i"):
        inner = _render_inline(node).strip()
        return f"*{inner}*" if inner else ""
    if tag == "code":
        inner = _render_inline(node).strip()
        return f"`{inner}`" if inner else ""
    if tag == "a":
        inner = _render_inline(node).strip()
        href = node.attrs.get("href", "")
        if not href:
            return inner
        return f"[{inner}]({href})"
    if tag == "img":
        alt = node.attrs.get("alt", "")
        src = node.attrs.get("src", "")
        return f"![{alt}]({src})"
    if tag == "br":
        return "\n"
    # transparent inline container (span, u, small, ...)
    return _render_inline(node)


def _pre_text(node: Node) -> str:
    """Verbatim text of a <pre> subtree (no whitespace collapsing)."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        for child in n.children:
            if isinstance(child, str):
                parts.append(child)
            else:
                walk(child)

    walk(node)
    return "".join(parts)


def _code_language(pre: Node) -> str:
    lang = pre.attrs.get("data-language", "")
    if lang:
        return lang
    for child in pre.children:
        if isinstance(child, Node) and child.tag == "code":
            for cls in (child.attrs.get("class") or "").split():
                if cls.startswith("language-"):
                    return cls[len("language-"):]
    return ""


def _render_list(node: Node, depth: int) -> str:
    ordered = node.tag == "ol"
    lines: list[str] = []
    index = 0
    indent = "  " * depth
    for child in node.children:
        if not (isinstance(child, Node) and child.tag == "li"):
            continue
        index += 1
        marker = f"{index}." if ordered else "-"
        # split li children into inline prefix and nested lists
        inline_children = Node("li")
        sublists: list[Node] = []
        for grand in child.children:
            if isinstance(grand, Node) and grand.tag in ("ul", "ol"):
                sublists.append(grand)
            else:
                inline_children.children.append(grand)
        text = _render_inline(inline_children).strip()
        lines.append(f"{indent}{marker} {text}")
        for sub in sublists:
            lines.append(_render_list(sub, depth + 1))
    return "\n".join(lines)


def _render_table(node: Node) -> str:
    rows: list[list[str]] = []
    header: list[str] | None = None

    def collect_rows(n: Node) -> None:
        nonlocal header
        for child in n.children:
            if not isinstance(child, Node):
                continue
            if child.tag == "tr":
                cells = [
                    (_render_inline(c).strip(), c.tag)
                    for c in child.children
                    if isinstance(c, Node) and c.tag in ("td", "th")
                ]
                if not cells:
                    continue
                if header is None and all(t == "th" for _, t in cells):
                    header = [txt for txt, _ in cells]
                else:
                    rows.append([txt for txt, _ in cells])
            elif child.tag in ("thead", "tbody", "tfoot"):
                collect_rows(child)

    collect_rows(node)
    if header is None:
        if not rows:
            return ""
        width = max(len(r) for r in rows)
        header = [f"Column {i + 1}" for i in range(width)]
    width = len(header)
    out = ["| " + " | ".join(header) + " |", "|" + "---|" * width]
    for row in rows:
        padded = row + [""] * (width - len(row))
        out.append("| " + " | ".join(padded[:width]) + " |")
    return "\n".join(out)


def _render_blocks(node: Node, blocks: list[str]) -> None:
    """Walk children of a container node, appending markdown blocks."""
    pending_inline: list = []

    def flush_inline() -> None:
        if not pending_inline:
            return
        holder = Node("p")
        holder.children = list(pending_inline)
        text = _render_inline(holder).strip()
        pending_inline.clear()
        if text:
            blocks.append(text)

    for child in node.children:
        if isinstance(child, str):
            pending_inline.append(child)
            continue
        tag = child.tag
        if tag in INLINE_TAGS:
            pending_inline.append(child)
            continue
        flush_inline()
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(tag[1])
            text = _render_inline(child).strip()
            if text:
                blocks.append("#" * level + " " + text)
        elif tag == "p":
            text = _render_inline(child).strip()
            if text:
                blocks.append(text)
        elif tag in ("ul", "ol"):
            rendered = _render_list(child, 0)
            if rendered:
                blocks.append(rendered)
        elif tag == "pre":
            code = _pre_text(child)
            code = code.strip("\n")
            blocks.append(f"```{_code_language(child)}\n{code}\n```")
        elif tag == "blockquote":
            inner_blocks: list[str] = []
            _render_blocks(child, inner_blocks)
            quoted = "\n\n".join(inner_blocks)
            if quoted:
                blocks.append("\n".join("> " + line if line else ">" for line in quoted.split("\n")))
        elif tag == "hr":
            blocks.append("---")
        elif tag == "table":
            rendered = _render_table(child)
            if rendered:
                blocks.append(rendered)
        else:
            # transparent block container: body, html, div, section, ...
            _render_blocks(child, blocks)
    flush_inline()


def html_to_markdown(html: str) -> str:
    """Convert an HTML document/fragment to the engine's markdown dialect."""
    root = parse_html(html)
    blocks: list[str] = []
    _render_blocks(root, blocks)
    if not blocks:
        return ""
    return "\n\n".join(blocks) + "\n"


# ──────────────────────────────────────────────────────────────────────────
# Citations
# ──────────────────────────────────────────────────────────────────────────


def add_citations(raw_markdown: str) -> tuple[str, str]:
    """Rewrite inline links as ``text⟨n⟩`` and build a references block."""
    url_index: dict[str, int] = {}

    def repl(match: re.Match) -> str:
        text, url = match.group(1), match.group(2)
        n = url_index.setdefault(url, len(url_index) + 1)
        if text.startswith("!"):
            return match.group(0)
        return f"{text}⟨{n}⟩"

    # protect images: handle ![alt](src) by temporary marker
    cited = _LINK_MD_RE.sub(
        lambda m: m.group(0)
        if m.start() > 0 and raw_markdown[m.start() - 1] == "!"
        else repl(m),
        raw_markdown,
    )
    if not url_index:
        return cited, ""
    refs = "## References\n\n" + "\n".join(f"⟨{n}⟩ {url}" for url, n in url_index.items()) + "\n"
    return cited, refs


def generate_markdown_result(html: str) -> dict:
    """Full markdown stage output (struct mirrored in the Spark schema)."""
    raw = html_to_markdown(html)
    cited, refs = add_citations(raw)
    return {
        "raw_markdown": raw,
        "markdown_with_citations": cited,
        "references_markdown": refs,
    }
