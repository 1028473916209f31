"""Schema-driven structured extraction (the JsonCss operator family).

Semantic contract: ``crawl4ai/extraction_strategy.py:1043-1330``
JsonCssExtractionStrategy — a declarative schema
``{baseSelector, fields: [{name, selector, type, attribute, pattern,
transform, default}]}`` evaluated per page: every baseSelector match
yields one record; field types ``text`` / ``attribute`` / ``html`` /
``regex``; transforms lower/upper/strip. (The engine is selector
semantics, not byte-parity — SURVEY.md §2.8.)

Implementation: clean-room minimal CSS engine over the stdlib DOM from
``extraction.markdown.parse_html``. Supported selector subset: tag,
``.class``, ``#id``, compound (``div.card#x``), attribute presence /
equality (``[href]``, ``[rel=next]``), descendant (space) and child
(``>``) combinators, and ``,`` alternation — the subset real-world
crawl schemas overwhelmingly use.

Spark surface: ``schema_extract_udf(schema)`` → pandas UDF html →
``array<map<string,string>>``; explode to rows downstream.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, MapType, StringType

from crawl4ai_spark.extraction.markdown import Node, parse_html

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"([.#][\w-]+|\[[^\]]+\])")


class _Simple:
    __slots__ = ("tag", "classes", "ids", "attrs")

    def __init__(self, token: str):
        m = _SIMPLE_RE.fullmatch(token)
        if not m:
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.classes: list[str] = []
        self.ids: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        for part in _PART_RE.findall(m.group("rest") or ""):
            if part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("#"):
                self.ids.append(part[1:])
            else:
                body = part[1:-1]
                if "=" in body:
                    k, v = body.split("=", 1)
                    self.attrs.append((k.strip(), v.strip().strip("'\"")))
                else:
                    self.attrs.append((body.strip(), None))

    def matches(self, node: Node) -> bool:
        if self.tag and node.tag != self.tag:
            return False
        if self.classes:
            node_classes = (node.attrs.get("class") or "").split()
            if not all(c in node_classes for c in self.classes):
                return False
        if self.ids and not all(node.attrs.get("id") == i for i in self.ids):
            return False
        for key, want in self.attrs:
            if key not in node.attrs:
                return False
            if want is not None and node.attrs.get(key) != want:
                return False
        return True


def _compile_one(selector: str) -> list[tuple[str, _Simple]]:
    """'div.card > a.title b' → [(desc, div.card), (child, a.title), (desc, b)]"""
    tokens = selector.replace(">", " > ").split()
    steps: list[tuple[str, _Simple]] = []
    combinator = "desc"
    for tok in tokens:
        if tok == ">":
            combinator = "child"
            continue
        steps.append((combinator, _Simple(tok)))
        combinator = "desc"
    if not steps:
        raise ValueError(f"empty selector: {selector!r}")
    return steps


def compile_selector(selector: str) -> list[list[tuple[str, _Simple]]]:
    return [_compile_one(s.strip()) for s in selector.split(",") if s.strip()]


def _iter_nodes(node: Node):
    for child in node.children:
        if isinstance(child, Node):
            yield child
            yield from _iter_nodes(child)


def _match_steps(root: Node, steps: list[tuple[str, _Simple]]) -> list[Node]:
    current = [root]
    for combinator, simple in steps:
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            pool = (
                (c for c in base.children if isinstance(c, Node))
                if combinator == "child"
                else _iter_nodes(base)
            )
            for node in pool:
                if simple.matches(node) and id(node) not in seen:
                    seen.add(id(node))
                    nxt.append(node)
        current = nxt
    return current


def select(root: Node, selector: str) -> list[Node]:
    """Document-order matches of a (possibly comma-joined) selector."""
    out: list[Node] = []
    seen: set[int] = set()
    for steps in compile_selector(selector):
        for node in _match_steps(root, steps):
            if id(node) not in seen:
                seen.add(id(node))
                out.append(node)
    order = {id(n): i for i, n in enumerate(_iter_nodes(root))}
    out.sort(key=lambda n: order.get(id(n), 0))
    return out


def _node_text(node: Node) -> str:
    parts: list[str] = []

    def walk(n: Node) -> None:
        for child in n.children:
            if isinstance(child, str):
                parts.append(child)
            else:
                walk(child)

    walk(node)
    return re.sub(r"\s+", " ", "".join(parts)).strip()


def _node_html(node: Node) -> str:
    def render(n) -> str:
        if isinstance(n, str):
            return n
        inner = "".join(render(c) for c in n.children)
        attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
        return f"<{n.tag}{attrs}>{inner}</{n.tag}>"

    return render(node)


_TRANSFORMS = {
    "lower": str.lower,
    "upper": str.upper,
    "strip": str.strip,
}


def extract_with_schema(html: str, schema: dict) -> list[dict]:
    """Evaluate a JsonCss-style schema against one HTML document."""
    root = parse_html(html)
    records: list[dict] = []
    for base in select(root, schema["baseSelector"]):
        record: dict[str, str] = {}
        for field in schema.get("fields", []):
            targets = select(base, field["selector"]) if field.get("selector") else [base]
            value: str | None = None
            if targets:
                node = targets[0]
                ftype = field.get("type", "text")
                if ftype == "text":
                    value = _node_text(node)
                elif ftype == "attribute":
                    value = node.attrs.get(field.get("attribute", ""), None)
                elif ftype == "html":
                    value = _node_html(node)
                elif ftype == "regex":
                    m = re.search(field.get("pattern", ""), _node_text(node))
                    value = m.group(1) if (m and m.groups()) else (m.group(0) if m else None)
            if value is None:
                value = field.get("default")
            if value is not None:
                for t in field.get("transform", []) if isinstance(field.get("transform"), list) else (
                    [field["transform"]] if field.get("transform") else []
                ):
                    fn = _TRANSFORMS.get(t)
                    if fn:
                        value = fn(value)
                record[field["name"]] = value
        if record:
            records.append(record)
    return records


def schema_extract_udf(schema: dict):
    """Arrow UDF factory: html (binary/str) → array<map<string,string>>.
    The schema travels to executors inside the closure (broadcast-like)."""
    schema_json = json.dumps(schema)

    @pandas_udf(ArrayType(MapType(StringType(), StringType())))
    def udf(html: pd.Series) -> pd.Series:
        loaded = json.loads(schema_json)
        out = []
        for doc in html:
            if doc is None:
                out.append([])
                continue
            if isinstance(doc, (bytes, bytearray)):
                doc = bytes(doc).decode("utf-8", errors="replace")
            try:
                out.append(extract_with_schema(doc, loaded))
            except Exception:
                out.append([])
        return pd.Series(out)

    return udf
