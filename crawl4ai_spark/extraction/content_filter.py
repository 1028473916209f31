"""Content filters — fit_markdown production (pruning + BM25 block filter).

Semantic contract: ``crawl4ai/content_filter_strategy.py`` —
PruningContentFilter (:541-799): recursive tree prune with composite
score 0.4·text_density + 0.2·(1−link_density) + 0.2·tag_weight +
0.1·class_id_weight + 0.1·log(text_len+1), fixed threshold (default
0.48); BM25ContentFilter (:381-538): page query from title/h1/meta, text
blocks scored against it, priority-tag weighting, threshold.

Clean-room implementations over the stdlib DOM. These are tree-recursive
per page (not relationally expressible), so they run inside the markdown
pandas UDF — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import math
import re

from crawl4ai_spark.extraction.markdown import Node, html_to_markdown, parse_html
from crawl4ai_spark.extraction.meta import extract_head_meta

PRUNE_THRESHOLD = 0.48

# tag weights for the composite score (content-bearing > structural)
TAG_WEIGHTS = {
    "article": 1.0, "main": 1.0, "section": 0.9, "p": 0.9, "pre": 0.9,
    "blockquote": 0.85, "h1": 0.9, "h2": 0.85, "h3": 0.8, "h4": 0.75,
    "table": 0.8, "ul": 0.7, "ol": 0.7, "div": 0.5, "span": 0.4,
    "aside": 0.2, "nav": 0.1, "footer": 0.1, "header": 0.2, "form": 0.1,
}

_NEGATIVE_CLASS_RE = re.compile(
    r"(nav|menu|sidebar|footer|header|banner|ad[sv]?|promo|social|share|comment|widget)",
    re.IGNORECASE,
)
_POSITIVE_CLASS_RE = re.compile(
    r"(content|article|main|body|post|text|entry|story)", re.IGNORECASE
)

_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "aside", "nav", "footer",
     "header", "ul", "ol", "table", "blockquote", "pre", "form",
     "h1", "h2", "h3", "h4", "h5", "h6", "span"}
)


def _text_len(node: Node) -> int:
    total = 0
    for child in node.children:
        if isinstance(child, str):
            total += len(child.strip())
        else:
            total += _text_len(child)
    return total


def _link_text_len(node: Node) -> int:
    total = 0
    for child in node.children:
        if isinstance(child, Node):
            if child.tag == "a":
                total += _text_len(child)
            else:
                total += _link_text_len(child)
    return total


def _html_len(node: Node) -> int:
    total = 0
    for child in node.children:
        if isinstance(child, str):
            total += len(child)
        else:
            total += 40 + _html_len(child)  # rough tag overhead
    return total


def _class_id_weight(node: Node) -> float:
    blob = f"{node.attrs.get('class', '')} {node.attrs.get('id', '')}"
    weight = 0.5
    if _NEGATIVE_CLASS_RE.search(blob):
        weight -= 0.5
    if _POSITIVE_CLASS_RE.search(blob):
        weight += 0.5
    return max(0.0, min(1.0, weight))


def node_score(node: Node) -> float:
    """Composite content score in [0, ~1.3] (PruningContentFilter formula)."""
    text_len = _text_len(node)
    html_len = max(_html_len(node), 1)
    text_density = text_len / html_len
    link_density = _link_text_len(node) / max(text_len, 1)
    tag_weight = TAG_WEIGHTS.get(node.tag, 0.5)
    return (
        0.4 * min(text_density * 3.0, 1.0)
        + 0.2 * (1.0 - min(link_density, 1.0))
        + 0.2 * tag_weight
        + 0.1 * _class_id_weight(node)
        + 0.1 * min(math.log(text_len + 1) / 8.0, 1.0)
    )


def prune_tree(node: Node, threshold: float = PRUNE_THRESHOLD) -> None:
    """Bottom-up removal of low-scoring block subtrees (in place)."""
    kept = []
    for child in node.children:
        if isinstance(child, Node):
            prune_tree(child, threshold)
            if child.tag in _BLOCK_TAGS:
                if _text_len(child) == 0 or node_score(child) < threshold:
                    continue
        kept.append(child)
    node.children = kept


def fit_markdown(html: str, threshold: float = PRUNE_THRESHOLD) -> str:
    """Pruned-content markdown (the reference's fit_markdown surface):
    prune the tree, serialize, and convert with the reference-parity
    dialect (the reference re-runs html2text on the filtered html,
    markdown_generation_strategy.py:229-243)."""
    from crawl4ai_spark.extraction.markdown import node_to_html

    root = parse_html(html)
    prune_tree(root, threshold)
    return html_to_markdown(node_to_html(root))


# ── BM25 block filter ────────────────────────────────────────────────────

_PRIORITY_TAGS = {"h1": 5.0, "h2": 3.0, "h3": 2.0, "p": 1.0, "li": 0.8, "blockquote": 1.2}


def _tokenize(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if len(t) > 2]


def bm25_fit_blocks(html: str, threshold: float = 1.0, k1: float = 1.2, b: float = 0.75) -> list[str]:
    """Markdown blocks whose BM25 score vs the page's own query (title +
    h1 + meta description/keywords) clears the threshold, in document
    order (BM25ContentFilter semantics)."""
    meta = extract_head_meta(html)
    root = parse_html(html)

    # collect candidate text blocks with their tags
    blocks: list[tuple[str, str]] = []

    def walk(node: Node) -> None:
        for child in node.children:
            if not isinstance(child, Node):
                continue
            if child.tag in ("p", "li", "blockquote", "h1", "h2", "h3", "pre"):
                text = " ".join(
                    s if isinstance(s, str) else "" for s in _flatten(child)
                )
                text = re.sub(r"\s+", " ", text).strip()
                if text:
                    blocks.append((child.tag, text))
            else:
                walk(child)

    def _flatten(node: Node):
        for c in node.children:
            if isinstance(c, str):
                yield c
            else:
                yield from _flatten(c)

    walk(root)
    if not blocks:
        return []

    query = _tokenize(" ".join([meta["title"], meta["description"], meta["keywords"]]))
    if not query:
        return [t for _, t in blocks]

    docs = [_tokenize(t) for _, t in blocks]
    n = len(docs)
    avg_dl = sum(len(d) for d in docs) / n
    df: dict[str, int] = {}
    for d in docs:
        for term in set(d):
            df[term] = df.get(term, 0) + 1
    out = []
    for (tag, text), toks in zip(blocks, docs):
        score = 0.0
        for q in set(query):
            tf = toks.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - df.get(q, 0) + 0.5) / (df.get(q, 0) + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avg_dl))
        score *= _PRIORITY_TAGS.get(tag, 1.0)
        if score >= threshold:
            out.append(text)
    return out
