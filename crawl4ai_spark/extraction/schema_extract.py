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


# ──────────────────────────────────────────────────────────────────────────
# Minimal XPath engine (the JsonXPath variant's selector subset)
# ──────────────────────────────────────────────────────────────────────────

_XSTEP_RE = re.compile(r"(//|/)((?:[\w*-]+))((?:\[[^\]]*\])*)")
_XPRED_RE = re.compile(r"\[([^\]]*)\]")


def _xpath_parse(expr: str) -> list[tuple[str, str, list[str]]]:
    """'.//div[@class="x"][2]/span' → [(desc, div, preds), (child, span, [])]."""
    expr = expr.strip()
    if expr.startswith("."):
        expr = expr[1:]
    if not expr.startswith("/"):
        expr = "/" + expr  # bare 'div' → child step
    steps: list[tuple[str, str, list[str]]] = []
    pos = 0
    while pos < len(expr):
        m = _XSTEP_RE.match(expr, pos)
        if not m:
            raise ValueError(f"unsupported xpath: {expr!r} at {pos}")
        axis = "desc" if m.group(1) == "//" else "child"
        steps.append((axis, m.group(2), _XPRED_RE.findall(m.group(3) or "")))
        pos = m.end()
    return steps


def _xpath_pred_ok(node: Node, pred: str) -> bool | None:
    """True/False for attribute predicates; None = positional (handled
    by the caller)."""
    pred = pred.strip()
    if pred.isdigit():
        return None
    if pred.startswith("@"):
        body = pred[1:]
        if "=" in body:
            key, want = body.split("=", 1)
            return node.attrs.get(key.strip()) == want.strip().strip("'\"")
        return body.strip() in node.attrs
    raise ValueError(f"unsupported xpath predicate: {pred!r}")


def _iter_nodes_with_parent(node: Node):
    for child in node.children:
        if isinstance(child, Node):
            yield child, node
            yield from _iter_nodes_with_parent(child)


def xpath_select(root: Node, expr: str) -> list[Node]:
    """Evaluate the supported XPath subset (``/`` and ``//`` steps, tag or
    ``*`` tests, ``[@attr]`` / ``[@attr='v']`` / positional ``[n]``
    predicates) relative to ``root`` — the selector surface of the
    reference's JsonXPathExtractionStrategy schemas
    (extraction_strategy.py:2449-2520).

    Positional predicates follow real XPath semantics: position is
    evaluated *within each parent's* matched children (``//li[2]`` is
    ``descendant::*/li[2]``, the second ``li`` of every parent — lxml
    parity), not the nth match in pooled document order.
    """
    contexts = [root]
    for axis, test, preds in _xpath_parse(expr):
        nxt: list[Node] = []
        seen: set[int] = set()
        for ctx in contexts:
            if axis == "child":
                pool = [(c, ctx) for c in ctx.children if isinstance(c, Node)]
            else:
                pool = list(_iter_nodes_with_parent(ctx))
            matched = [(n, p) for n, p in pool if test == "*" or n.tag == test]
            for pred in preds:
                stripped = pred.strip()
                if stripped.isdigit():
                    # nth among this parent's surviving matches (document
                    # order within each sibling group)
                    want = int(stripped)
                    counter: dict[int, int] = {}
                    keep = []
                    for n, p in matched:
                        k = counter.get(id(p), 0) + 1
                        counter[id(p)] = k
                        if k == want:
                            keep.append((n, p))
                    matched = keep
                else:
                    matched = [(n, p) for n, p in matched if _xpath_pred_ok(n, pred)]
            for n, _ in matched:
                if id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        contexts = nxt
    return contexts


# ──────────────────────────────────────────────────────────────────────────
# Schema evaluation (the JsonCss / JsonXPath engine)
# ──────────────────────────────────────────────────────────────────────────

# reference transform names (extraction_strategy.py:1288-1295) + legacy
_TRANSFORMS = {
    "lowercase": str.lower,
    "uppercase": str.upper,
    "strip": str.strip,
    "lower": str.lower,
    "upper": str.upper,
}

_ENGINES = {"css": select, "xpath": xpath_select}


def _apply_transforms(value, spec):
    names = spec if isinstance(spec, list) else [spec]
    for name in names:
        fn = _TRANSFORMS.get(name)
        if fn is not None and isinstance(value, str):
            value = fn(value)
    return value


def _extract_single_field(engine, element: Node, field: dict):
    """Type-pipeline evaluation of one scalar field
    (reference _extract_single_field, extraction_strategy.py:1180-1231):
    optional sub-selector (first match), then a step list over
    text / attribute / html / regex, then transform, then default."""
    if field.get("selector"):
        matches = engine(element, field["selector"])
        if not matches:
            return field.get("default")
        value = matches[0]
    else:
        value = element
    steps = field.get("type", "text")
    steps = steps if isinstance(steps, list) else [steps]
    for step in steps:
        try:
            if step == "text":
                value = _node_text(value) if isinstance(value, Node) else None
            elif step == "attribute":
                value = (
                    value.attrs.get(field.get("attribute", ""))
                    if isinstance(value, Node)
                    else None
                )
            elif step == "html":
                value = _node_html(value) if isinstance(value, Node) else None
            elif step == "regex":
                pattern = field.get("pattern")
                if pattern:
                    if isinstance(value, Node):
                        value = _node_text(value)
                    m = re.search(pattern, value) if isinstance(value, str) else None
                    value = m.group(field.get("group", 1)) if m else None
        except Exception:
            value = None
        if value is None:
            break
    if "transform" in field:
        value = _apply_transforms(value, field["transform"])
    return value if value is not None else field.get("default")


def _extract_field(engine, element: Node, field: dict):
    try:
        ftype = field.get("type", "text")
        if ftype == "nested":
            matches = engine(element, field["selector"])
            return _extract_item(engine, matches[0], field["fields"]) if matches else {}
        if ftype == "list":
            return [
                {
                    f["name"]: v
                    for f in field["fields"]
                    if (v := _extract_single_field(engine, el, f)) is not None
                }
                for el in engine(element, field["selector"])
            ]
        if ftype == "nested_list":
            return [
                _extract_item(engine, el, field["fields"])
                for el in engine(element, field["selector"])
            ]
        return _extract_single_field(engine, element, field)
    except Exception:
        return field.get("default")


def _extract_item(engine, element: Node, fields: list[dict]) -> dict:
    item: dict = {}
    for field in fields:
        if field.get("type") == "computed":
            fn = field.get("function")
            try:
                value = fn(item) if callable(fn) else field.get("default")
            except Exception:
                value = field.get("default")
        else:
            value = _extract_field(engine, element, field)
        if value is not None:
            item[field["name"]] = value
    return item


def extract_with_schema(html: str, schema: dict, engine: str = "css") -> list[dict]:
    """Evaluate a JsonCss/JsonXPath schema against one HTML document.

    Full reference field model (extraction_strategy.py:1043-1330):
    ``baseSelector`` + optional ``baseFields``; field types ``text`` /
    ``attribute`` / ``html`` / ``regex`` (or a pipeline list of those),
    ``nested`` (first match → dict), ``list`` (scalar fields per match),
    ``nested_list`` (recursive dicts per match), ``computed``
    (``function`` callable only — the reference disables ``expression``
    eval for security, and callables don't survive the JSON-serialized
    UDF closure; use computed fields on the local API).
    ``engine``: "css" (default) or "xpath".
    """
    sel = _ENGINES[engine]
    root = parse_html(html)
    records: list[dict] = []
    for base in sel(root, schema["baseSelector"]):
        item: dict = {}
        for field in schema.get("baseFields", []):
            value = _extract_single_field(sel, base, field)
            if value is not None:
                item[field["name"]] = value
        item.update(_extract_item(sel, base, schema.get("fields", [])))
        if item:
            records.append(item)
    return records


def schema_extract_udf(schema: dict, engine: str = "css"):
    """Arrow UDF factory: html → array<map<string,string>> (flat view —
    nested/list values are JSON-encoded strings). The schema travels to
    executors inside the closure (broadcast-like); must be
    JSON-serializable (no computed-function callables)."""
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
                recs = extract_with_schema(doc, loaded, engine)
                out.append(
                    [
                        {
                            k: v if isinstance(v, str) else json.dumps(v, sort_keys=True)
                            for k, v in r.items()
                        }
                        for r in recs
                    ]
                )
            except Exception:
                out.append([])
        return pd.Series(out)

    return udf


def schema_extract_json_udf(schema: dict, engine: str = "css"):
    """Arrow UDF factory: html → array<string> of JSON records (the
    nested-faithful view; one JSON string per baseSelector match)."""
    schema_json = json.dumps(schema)

    @pandas_udf(ArrayType(StringType()))
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
                out.append(
                    [
                        json.dumps(r, sort_keys=True)
                        for r in extract_with_schema(doc, loaded, engine)
                    ]
                )
            except Exception:
                out.append([])
        return pd.Series(out)

    return udf
