"""Content-scraping stage: cleaned_html + media + rich links.

Semantics ported (clean-room, over the stdlib Node tree) from the
reference's ``LXMLWebScrapingStrategy._scrap``
(``crawl4ai/content_scraping_strategy.py:617-905``), step for step:

- exclude_all_images / excluded_tags / excluded_selector removal
  (``:663-697``),
- css_selector / target_elements scoping into a synthetic ``<div>``
  (``:705-730``),
- mermaid SVG → fenced ``pre data-language="mermaid"`` block
  (``:732-790``),
- style/link/meta/noscript removal and script removal with tail-text
  preservation (``:792-816``; sibling text nodes make tail preservation
  automatic in this tree model),
- link extraction with title/base_domain/intrinsic_score
  (``:255-311``; scoring ``utils.py:3344-3456``),
- image scoring/filtering with src/data-src/srcset/``<picture>`` variants
  (``process_image`` ``:410-515``; threshold ``config.IMAGE_SCORE_THRESHOLD``),
- video/audio collection incl. nested ``<source>`` (``:344-359``),
- remove_forms / only_text flattening (``ONLY_TEXT_ELIGIBLE_TAGS``,
  ``config.py:52-74``) / base64 image stripping (``:870-874``),
- empty-element pruning (``remove_empty_elements_fast`` ``:517-575``:
  bottom-up, bypass tags, ``<pre>/<code>`` exempt),
- attribute whitelist (``IMPORTANT_ATTRS`` ``config.py:51`` ± ``data-*``,
  ``:577-612``),
- serialize → ``cleaned_html`` (compact serialization; the reference's
  lxml ``pretty_print`` whitespace is a documented deviation — SURVEY.md
  §7 treats raw_markdown/text as the primary byte invariant and
  cleaned_html as secondary).

Everything is pure Python (no Spark imports) so it runs inside Arrow
UDF batches; the Spark wiring lives in ``extraction.udfs``.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

from crawl4ai_spark.extraction.markdown import (
    Node,
    node_to_html,
    parse_html,
)
from crawl4ai_spark.extraction.meta import extract_head_meta
from crawl4ai_spark.extraction.schema_extract import select
from crawl4ai_spark.functions.urlnorm import (
    canonicalize_full,
    get_base_domain,
    is_external_url,
)

IMPORTANT_ATTRS = frozenset(
    {"src", "href", "alt", "title", "width", "height", "class", "id", "rowspan", "colspan"}
)
ONLY_TEXT_ELIGIBLE_TAGS = frozenset(
    {"b", "i", "u", "span", "del", "ins", "sub", "sup", "strong", "em", "code",
     "kbd", "var", "s", "q", "abbr", "cite", "dfn", "time", "small", "mark"}
)
EMPTY_BYPASS_TAGS = frozenset(
    {"a", "img", "br", "hr", "input", "meta", "link", "source", "track", "wbr",
     "tr", "td", "th"}
)
IMAGE_FORMATS = ("jpg", "jpeg", "png", "webp", "avif", "gif")
# reference config.py:75-85
SOCIAL_MEDIA_DOMAINS = (
    "facebook.com", "twitter.com", "x.com", "linkedin.com", "instagram.com",
    "pinterest.com", "tiktok.com", "snapchat.com", "reddit.com",
)
IMAGE_SCORE_THRESHOLD = 2
_BASE64_SRC_RE = re.compile(r'data:image/[^;]+;base64,([^"]+)')
_ICONISH = ("button", "icon", "logo")


# ──────────────────────────────────────────────────────────────────────────
# tree helpers (no parent pointers: removal/inspection walk with ancestors)
# ──────────────────────────────────────────────────────────────────────────


def _text_content(node: Node) -> str:
    parts: list[str] = []

    def walk(n) -> None:
        if isinstance(n, str):
            parts.append(n)
            return
        for c in n.children:
            walk(c)

    walk(node)
    return "".join(parts)


def _leading_text(node: Node) -> str:
    """Text immediately after the open tag (lxml ``.text`` analog)."""
    if node.children and isinstance(node.children[0], str):
        return node.children[0]
    return ""


def _remove_where(root: Node, predicate) -> None:
    """Drop element nodes where predicate(node) — sibling text (the lxml
    'tail') is untouched because text lives as sibling list entries."""

    def walk(n: Node) -> None:
        n.children = [
            c for c in n.children if not (isinstance(c, Node) and predicate(c))
        ]
        for c in n.children:
            if isinstance(c, Node):
                walk(c)

    walk(root)


def _iter_with_ancestors(root: Node):
    """Yield (node, ancestors) in document order; ancestors innermost-last."""
    stack: list[tuple[Node, list[Node]]] = [(root, [])]
    while stack:
        node, anc = stack.pop()
        yield node, anc
        child_anc = anc + [node]
        for c in reversed(node.children):
            if isinstance(c, Node):
                stack.append((c, child_anc))


def _find_all(root: Node, tag: str) -> list[tuple[Node, list[Node]]]:
    return [(n, a) for n, a in _iter_with_ancestors(root) if n.tag == tag]


_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)


def _drop_tags_balanced(html: str, drop_tags: frozenset) -> bool:
    """True when, scanning left to right, every drop-tag open is matched
    by a LATER close — the precondition under which pruning drop-tag
    subtrees from a tolerant full parse equals parse-time dropping (an
    unclosed ``<iframe>`` swallows the rest of the document at parse
    time; a post-prune would not). Comments are stripped first (both
    parsers ignore them, so tokens inside must not sway the count), stray
    closes are ignored (both parsers drop them), and the scan is
    order-aware — a plain count would call ``</iframe>…<iframe>``
    balanced. Conservative: a self-closing ``<svg/>`` counts as an
    unmatched open and triggers the two-parse fallback."""
    lower = _COMMENT_RE.sub("", html.lower())
    for tag in drop_tags:
        if tag not in lower:
            continue
        events = [(m.start(), 1) for m in re.finditer(rf"<{tag}\b", lower)]
        events += [(m.start(), -1) for m in re.finditer(rf"</{tag}\s*>", lower)]
        depth = 0
        for _, d in sorted(events):
            depth = max(0, depth + d)  # floor: stray close is a no-op
        if depth != 0:
            return False
    return True


# ──────────────────────────────────────────────────────────────────────────
# media
# ──────────────────────────────────────────────────────────────────────────


def parse_srcset(s: str) -> list[dict]:
    """``srcset`` entries as [{url, width}] (width descriptor digits only)."""
    out: list[dict] = []
    for part in (s or "").split(","):
        bits = part.strip().split()
        if not bits:
            continue
        width = None
        if len(bits) >= 2:
            width = bits[1].rstrip("w").split(".")[0]
        out.append({"url": bits[0], "width": width})
    return out


def _closest_described_ancestor(ancestors: list[Node], min_words: int) -> str | None:
    """Nearest ancestor whose leading text is non-empty and whose full text
    clears ``min_words`` (reference find_closest_parent_with_useful_text)."""
    for anc in reversed(ancestors):
        if _leading_text(anc):
            full = _text_content(anc)
            if len(full.split()) >= min_words:
                return full.strip()
    return None


def score_image(
    img: Node,
    ancestors: list[Node],
    index: int,
    total_images: int,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    desc_min_words: int = 1,
) -> list[dict] | None:
    """Reference ``process_image`` scoring + variant expansion
    (content_scraping_strategy.py:410-515)."""
    attrs = img.attrs
    style = attrs.get("style") or ""
    alt = attrs.get("alt") or ""
    src = attrs.get("src") or ""
    data_src = attrs.get("data-src") or ""
    srcset = attrs.get("srcset") or ""
    data_srcset = attrs.get("data-srcset") or ""

    if "display:none" in style:
        return None
    parent = ancestors[-1] if ancestors else None
    if parent is not None:
        if parent.tag in ("button", "input"):
            return None
        parent_classes = (parent.attrs.get("class") or "").split()
        if any(k in cls for cls in parent_classes for k in _ICONISH):
            return None
    if (src and any(k in src for k in _ICONISH)) or (
        alt and any(k in alt for k in _ICONISH)
    ):
        return None

    score = 0
    width = attrs.get("width")
    if width and width.isdigit() and int(width) > 150:
        score += 1
    height = attrs.get("height")
    if height and height.isdigit() and int(height) > 150:
        score += 1
    if alt:
        score += 1
    score += int(index / total_images < 0.5)

    detected_format = None
    for candidate in (src, data_src, srcset, data_srcset):
        if candidate:
            hits = [f for f in IMAGE_FORMATS if f in candidate.lower()]
            if hits:
                detected_format = hits[0]
                score += 1
                break
    if srcset or data_srcset:
        score += 1
    in_picture = any(a.tag == "picture" for a in ancestors)
    if in_picture:
        score += 1

    if score <= image_score_threshold:
        return None

    base = {
        "alt": alt,
        "desc": _closest_described_ancestor(ancestors + [img], desc_min_words),
        "score": score,
        "type": "image",
        "group_id": index,
        "format": detected_format,
    }
    seen: set[str] = set()
    variants: list[dict] = []

    def add(u: str | None, w: str | None = None) -> None:
        if u and not u.startswith("data:") and u not in seen:
            seen.add(u)
            v = dict(base, src=u)
            if w:
                v["width"] = w
            variants.append(v)

    add(src)
    add(data_src)
    for chunk in (srcset, data_srcset):
        for entry in parse_srcset(chunk):
            add(entry["url"], entry["width"])
    if in_picture:
        picture = next(a for a in reversed(ancestors) if a.tag == "picture")
        for source, _ in _find_all(picture, "source"):
            for entry in parse_srcset(source.attrs.get("srcset") or ""):
                add(entry["url"], entry["width"])
    for attr, value in attrs.items():
        if attr.startswith("data-") and ("src" in attr or "srcset" in attr) and value and "http" in value:
            add(value)

    return variants or None


def _collect_media(root: Node, desc_min_words: int, image_score_threshold: int) -> dict:
    media = {"images": [], "videos": [], "audios": []}
    images = _find_all(root, "img")
    total = len(images)
    for idx, (img, anc) in enumerate(images):
        got = score_image(img, anc, idx, total, image_score_threshold, desc_min_words)
        if got:
            media["images"].extend(got)
    for kind in ("video", "audio"):
        for elem, anc in _find_all(root, kind):
            info = {
                "src": elem.attrs.get("src"),
                "alt": elem.attrs.get("alt"),
                "type": kind,
                "desc": _closest_described_ancestor(anc + [elem], desc_min_words),
            }
            media[kind + "s"].append(info)
            for source, _ in _find_all(elem, "source"):
                if source.attrs.get("src"):
                    media[kind + "s"].append(dict(info, src=source.attrs["src"]))
    return media


# ──────────────────────────────────────────────────────────────────────────
# links (rich struct: title / base_domain / intrinsic_score)
# ──────────────────────────────────────────────────────────────────────────


def extract_page_context(title: str, headlines: str, meta_desc: str, base_url: str) -> dict:
    """Per-page term set + docs-site flag for link intrinsic scoring
    (reference utils.py:3299-3341)."""
    domain = urlparse(base_url).netloc.lower() if base_url else ""
    text = f"{title or ''} {headlines or ''} {meta_desc or ''}".lower()
    strip = '.,!?;:"()[]{}'
    terms = {w.strip(strip) for w in text.split() if len(w.strip(strip)) > 2}
    return {
        "terms": terms,
        "domain": domain,
        "is_docs_site": any(p in domain for p in ("docs.", "api.", "developer.", "reference.")),
    }


_GENERIC_LINK_TEXTS = {"click here", "read more", "more info", "link", "here"}


def link_intrinsic_score(
    link_text: str, url: str, title_attr: str, class_attr: str, rel_attr: str,
    page_context: dict,
) -> float:
    """0-10 link quality heuristic (reference utils.py:3344-3456)."""
    score = 0.0
    if title_attr and len(title_attr.strip()) > 3:
        score += 1.0
    cls = (class_attr or "").lower()
    if any(k in cls for k in ("nav", "menu", "primary", "main", "important")):
        score += 1.5
    if any(k in cls for k in ("ad", "sponsor", "track", "promo", "banner")):
        score -= 1.0
    rel = (rel_attr or "").lower()
    if any(k in rel for k in ("canonical", "next", "prev", "chapter")):
        score += 1.0
    if any(k in rel for k in ("nofollow", "sponsored", "ugc")):
        score -= 0.5

    low = url.lower()
    if any(p in low for p in ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")):
        score += 2.0
    elif any(p in low for p in ("/blog/", "/article/", "/post/", "/news/")):
        score += 1.0
    if any(p in low for p in ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")):
        score -= 1.5
    depth = url.count("/") - 2
    if depth <= 2:
        score += 1.0
    elif depth > 5:
        score -= 0.5
    if url.startswith("https://"):
        score += 0.5

    if link_text:
        text = link_text.strip()
        if len(text) > 3:
            score += 1.0
        words = len(text.split())
        if words >= 2:
            score += 0.5
        if words >= 4:
            score += 0.5
        if text.lower() in _GENERIC_LINK_TEXTS:
            score -= 1.0

    strip = '.,!?;:"()[]{}'
    if page_context.get("terms") and link_text:
        link_words = {
            w.strip(strip).lower() for w in link_text.split() if len(w.strip(strip)) > 2
        }
        if link_words:
            overlap = len(link_words & page_context["terms"])
            if overlap:
                score += (overlap / min(len(link_words), 10)) * 2.0
    if page_context.get("is_docs_site") and link_text and any(
        k in link_text.lower() for k in ("api", "reference", "guide", "tutorial", "example")
    ):
        score += 1.0
    return max(0.0, min(score, 10.0))


def _collect_links(
    root: Node,
    url: str,
    base_domain: str,
    page_context: dict | None,
    exclude_external_links: bool,
    exclude_domains: set[str],
) -> tuple[dict, dict, set]:
    """First-wins per-URL link dicts keyed by normalized href; returns
    (internal, external, removed_hrefs) — excluded external anchors are
    removed from the tree by the caller via removed node identity set."""
    # <base href> overrides the resolution base (reference :246-253)
    for base_el, _ in _find_all(root, "base"):
        href = (base_el.attrs.get("href") or "").strip()
        if href:
            url = href
            break

    internal: dict[str, dict] = {}
    external: dict[str, dict] = {}
    removed: set[int] = set()
    for link, _ in _find_all(root, "a"):
        href = (link.attrs.get("href") or "").strip()
        if not href:
            continue
        normalized = canonicalize_full(href, url)
        if not normalized:
            continue
        data = {
            "href": normalized,
            "text": _text_content(link).strip(),
            "title": (link.attrs.get("title") or "").strip(),
            "base_domain": base_domain,
            "intrinsic_score": 0.0,
        }
        if page_context is not None:
            data["intrinsic_score"] = link_intrinsic_score(
                data["text"], normalized, data["title"],
                link.attrs.get("class") or "", link.attrs.get("rel") or "",
                page_context,
            )
        if is_external_url(normalized, base_domain):
            link_domain = get_base_domain(normalized)
            data["base_domain"] = link_domain
            if exclude_external_links or link_domain in exclude_domains:
                removed.add(id(link))
                continue
            external.setdefault(normalized, data)
        else:
            internal.setdefault(normalized, data)
    return internal, external, removed


# ──────────────────────────────────────────────────────────────────────────
# cleaning passes
# ──────────────────────────────────────────────────────────────────────────


def _replace_mermaid_svgs(root: Node) -> None:
    """svg[id^=mermaid-] → fenced mermaid block (reference :732-790)."""

    def transform(parent: Node) -> None:
        for i, child in enumerate(parent.children):
            if not isinstance(child, Node):
                continue
            if child.tag == "svg" and (child.attrs.get("id") or "").startswith("mermaid-"):
                labels: list[str] = []
                seen: set[str] = set()
                for sel in (".nodeLabel", ".label span", ".edgeLabel span"):
                    for n in select(child, sel):
                        text = _text_content(n).strip()
                        if text and text not in seen:
                            seen.add(text)
                            labels.append(text)
                if not labels:
                    for n, _ in _iter_with_ancestors(child):
                        if n.tag in ("text", "tspan"):
                            text = _leading_text(n).strip()
                            if text and text not in seen:
                                seen.add(text)
                                labels.append(text)
                if not labels:
                    continue
                kind = child.attrs.get("aria-roledescription", "diagram")
                pre = Node("pre", {"data-language": "mermaid"})
                code = Node("code", {"class": "language-mermaid"})
                code.children = [f"%% {kind} diagram\n" + "\n".join(labels)]
                pre.children = [code]
                parent.children[i] = pre
            else:
                transform(child)

    transform(root)


def _only_text_flatten(root: Node) -> None:
    def transform(parent: Node) -> None:
        for i, child in enumerate(parent.children):
            if not isinstance(child, Node):
                continue
            if child.tag in ONLY_TEXT_ELIGIBLE_TAGS and _leading_text(child):
                span = Node("span")
                span.children = [_text_content(child)]
                parent.children[i] = span
            else:
                transform(child)

    transform(root)


def _prune_empty_elements(root: Node, word_count_threshold: int) -> None:
    """Bottom-up removal of childless elements below the word threshold;
    bypass tags and pre/code subtrees exempt (reference :517-575)."""

    def prune(node: Node, in_code_block: bool) -> None:
        inner = in_code_block or node.tag in ("pre", "code")
        kept = []
        for child in node.children:
            if isinstance(child, Node):
                prune(child, inner)
                if (
                    not inner
                    and child.tag not in EMPTY_BYPASS_TAGS
                    and not any(isinstance(g, Node) for g in child.children)
                    and len(_text_content(child).strip().split()) < word_count_threshold
                ):
                    continue
            kept.append(child)
        node.children = kept

    prune(root, False)


def _whitelist_attributes(root: Node, keep_data_attributes: bool) -> None:
    for node, _ in _iter_with_ancestors(root):
        if node.tag == "#root":
            continue
        node.attrs = {
            k: v
            for k, v in node.attrs.items()
            if k in IMPORTANT_ATTRS or (keep_data_attributes and k.startswith("data-"))
        }


# ──────────────────────────────────────────────────────────────────────────
# the scrape entry point
# ──────────────────────────────────────────────────────────────────────────


def scrape_page(
    html: str,
    url: str,
    *,
    word_count_threshold: int = 1,
    css_selector: str | None = None,
    target_elements: list[str] | None = None,
    excluded_tags: list[str] | None = None,
    excluded_selector: str | None = None,
    only_text: bool = False,
    remove_forms: bool = False,
    exclude_all_images: bool = False,
    keep_data_attributes: bool = False,
    exclude_external_links: bool = False,
    exclude_social_media_links: bool = False,
    exclude_domains: set[str] | None = None,
    exclude_external_images: bool = False,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    image_description_min_word_threshold: int = 1,
    score_links: bool = False,
    include_tables: bool = False,
) -> dict:
    """Run the full scraping battery; returns
    ``{cleaned_html, media, links, metadata, success}``."""
    if not html:
        return {
            "cleaned_html": "",
            "media": {"images": [], "videos": [], "audios": []},  # + tables when include_tables
            "links": {"internal": [], "external": []},
            "metadata": {},
            "success": False,
        }
    root = parse_html(html, drop_tags=frozenset())

    # snapshot tables before any battery mutation: same result as
    # re-parsing the original html with DROP_TAGS (what extract_tables
    # does), without the second full parse — tables under a DROP_TAGS
    # ancestor are skipped and DROP_TAGS subtrees inside a table pruned.
    # Equivalence to parse-time dropping holds only when every drop tag
    # is properly closed (an *unclosed* <iframe> swallows the rest of the
    # document at parse time, while post-pruning the tolerant full tree
    # would not), so a cheap open/close-count guard falls back to the
    # two-parse path on misnested input.
    table_snapshots: list[Node] | None = None
    if include_tables and "table" not in set(excluded_tags or ()):
        from crawl4ai_spark.extraction.markdown import DROP_TAGS

        if _drop_tags_balanced(html, DROP_TAGS):
            table_snapshots = []
            for t, ancestors in _find_all(root, "table"):
                if any(a.tag in DROP_TAGS for a in ancestors):
                    continue
                snap = t.clone()
                _remove_where(snap, lambda n: n.tag in DROP_TAGS)
                table_snapshots.append(snap)

    base_domain = get_base_domain(url)
    exclude_domains = set(exclude_domains or ())
    if exclude_social_media_links:
        # reference merges the social list into exclude_domains (:817-825)
        exclude_domains |= set(SOCIAL_MEDIA_DOMAINS)

    meta = extract_head_meta(html)
    page_context = None
    if score_links:
        headlines = " ".join(
            _text_content(n).strip()
            for tag in ("h1", "h2", "h3")
            for n, _ in _find_all(root, tag)
            if _text_content(n).strip()
        )
        page_context = extract_page_context(
            meta.get("title") or "", headlines, meta.get("description") or "", url
        )

    if exclude_all_images:
        _remove_where(root, lambda n: n.tag == "img")
    if excluded_tags:
        banned = set(excluded_tags)
        _remove_where(root, lambda n: n.tag in banned)
    if excluded_selector:
        doomed = {id(n) for n in select(root, excluded_selector)}
        if doomed:
            _remove_where(root, lambda n: id(n) in doomed)

    _replace_mermaid_svgs(root)

    # style/link/meta/noscript/script removal (tail text survives as
    # sibling text nodes in this tree model; <title> stays, as in the
    # reference — the markdown stage suppresses <head> content itself)
    _remove_where(root, lambda n: n.tag in ("style", "link", "meta", "noscript", "script"))

    if exclude_external_images:
        _remove_where(
            root,
            lambda n: n.tag == "img"
            and is_external_url(n.attrs.get("src") or "", base_domain),
        )

    internal, external, removed_links = _collect_links(
        root, url, base_domain, page_context, exclude_external_links, exclude_domains
    )
    if removed_links:
        _remove_where(root, lambda n: id(n) in removed_links)

    media = _collect_media(root, image_description_min_word_threshold, image_score_threshold)
    if include_tables and "table" not in set(excluded_tags or ()):
        # reference: table extraction strategy feeds media["tables"]
        # (content_scraping_strategy.py:849-858)
        if table_snapshots is not None:
            from crawl4ai_spark.extraction.tables import extract_table_data

            candidates = (extract_table_data(s) for s in table_snapshots)
        else:  # misnested drop tags: re-parse with parse-time dropping
            from crawl4ai_spark.extraction.tables import extract_tables

            candidates = iter(extract_tables(html))
        media["tables"] = [t for t in candidates if t.get("is_data_table")]

    if remove_forms:
        _remove_where(root, lambda n: n.tag == "form")
    if only_text:
        _only_text_flatten(root)

    for img, _ in _find_all(root, "img"):
        src = img.attrs.get("src") or ""
        if _BASE64_SRC_RE.match(src):
            img.attrs["src"] = _BASE64_SRC_RE.sub("", src)

    _prune_empty_elements(root, word_count_threshold)
    _whitelist_attributes(root, keep_data_attributes)

    # content scoping for cleaned_html (links/media keep whole-page scope)
    content: Node = root
    if css_selector:
        matches = select(root, css_selector)
        if matches:
            content = Node("div")
            content.children = [m.clone() for m in matches]
    if target_elements:
        source = content
        picked: list[Node] = []
        for sel in target_elements:
            picked.extend(select(source, sel))
        content = Node("div")
        content.children = [m.clone() for m in picked]

    return {
        "cleaned_html": node_to_html(content).strip(),
        "media": media,
        "links": {"internal": list(internal.values()), "external": list(external.values())},
        "metadata": meta,
        "success": True,
    }


def bm25_contextual_scores(query: str, docs: list[str], k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25) -> list[float]:
    """Per-link contextual relevance: Okapi BM25 of ``query`` against the
    batch of link context strings, min-max normalized to [0, 1].

    Clean-room implementation of the published Okapi BM25 formula with
    the same conventions the reference gets from the ``rank_bm25``
    library (``async_url_seeder.py:1703-1748`` _calculate_bm25_score →
    BM25Okapi defaults k1=1.5 b=0.75 epsilon=0.25; negative IDFs floored
    at ε·avg-idf) and the same normalization: empty query/doc list →
    zeros, *all-empty* docs → zeros (the reference's explicit pre-BM25
    guard, async_url_seeder.py:1718-1721 — not the 0.5 all-equal case),
    all-equal scores → 0.5 each.
    """
    import math

    if not query or not docs:
        return [0.0] * len(docs)
    tokenized = [d.lower().split() for d in docs]
    if all(not t for t in tokenized):
        return [0.0] * len(docs)
    n = len(tokenized)
    avgdl = sum(len(t) for t in tokenized) / n
    df: dict[str, int] = {}
    for toks in tokenized:
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    idf: dict[str, float] = {}
    neg = []
    for w, f in df.items():
        v = math.log(n - f + 0.5) - math.log(f + 0.5)
        idf[w] = v
        if v < 0:
            neg.append(w)
    avg_idf = sum(idf.values()) / len(idf)
    for w in neg:
        idf[w] = epsilon * avg_idf
    q_toks = query.lower().split()
    scores = []
    for toks in tokenized:
        dl = len(toks)
        tf: dict[str, int] = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        s = 0.0
        for q in q_toks:
            f = tf.get(q, 0)
            if f:
                s += idf.get(q, 0.0) * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    lo, hi = min(scores), max(scores)
    if hi == lo:
        return [0.5] * len(scores)
    return [(s - lo) / (hi - lo) for s in scores]


def link_total_score(
    intrinsic_score: float | None,
    contextual_score: float | None,
    score_links_enabled: bool = False,
    query_provided: bool = False,
) -> float:
    """Combined link score with the reference's fallback ladder
    (utils.py:3459-3504 calculate_total_score): no scoring → neutral 5.0;
    intrinsic only → clamped intrinsic; both → 0.7·intrinsic +
    0.3·(contextual×10), clamped to [0, 10]."""
    if not score_links_enabled:
        return 5.0
    intrinsic = intrinsic_score if intrinsic_score is not None else 0.0
    if not query_provided or contextual_score is None:
        return max(0.0, min(intrinsic, 10.0))
    contextual = min((contextual_score or 0.0) * 10.0, 10.0)
    return max(0.0, min(intrinsic * 0.7 + contextual * 0.3, 10.0))
