"""HTML table extraction — data-vs-layout scoring + structured rows.

Semantic contract: ``crawl4ai/table_extraction.py:66-296`` — per
``<table>``: a layout-vs-data heuristic score (thead/tbody/th presence,
caption/summary, column-count consistency, nested-table and
role=presentation penalties, minimum 2×2 shape), then header/row
extraction with colspan expansion, row alignment and default
"Column i" headers.

Clean-room over the stdlib DOM (``extraction.markdown.parse_html``).
Spark surface: ``udf_extract_tables`` html → array of table structs;
explode downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from crawl4ai_spark.extraction.markdown import Node, parse_html

TABLE_STRUCT = StructType(
    [
        StructField("headers", ArrayType(StringType())),
        StructField("rows", ArrayType(ArrayType(StringType()))),
        StructField("caption", StringType()),
        StructField("score", DoubleType()),
        StructField("is_data_table", BooleanType()),
    ]
)

DATA_TABLE_THRESHOLD = 5.0


def _text(node: Node) -> str:
    parts: list[str] = []

    def walk(n: Node) -> None:
        for child in n.children:
            if isinstance(child, str):
                parts.append(child)
            else:
                walk(child)

    walk(node)
    return " ".join("".join(parts).split())


def _find(node: Node, tag: str) -> list[Node]:
    out = []
    for child in node.children:
        if isinstance(child, Node):
            if child.tag == tag:
                out.append(child)
            out.extend(_find(child, tag))
    return out


def _direct_rows(table: Node) -> list[Node]:
    rows: list[Node] = []
    for child in table.children:
        if not isinstance(child, Node):
            continue
        if child.tag == "tr":
            rows.append(child)
        elif child.tag in ("thead", "tbody", "tfoot"):
            rows.extend(c for c in child.children if isinstance(c, Node) and c.tag == "tr")
    return rows


def _cells(row: Node) -> list[tuple[str, str, int]]:
    """(text, tag, colspan) for each td/th, colspan clamped to [1, 20]."""
    out = []
    for cell in row.children:
        if isinstance(cell, Node) and cell.tag in ("td", "th"):
            try:
                span = max(1, min(int(cell.attrs.get("colspan", "1")), 20))
            except ValueError:
                span = 1
            out.append((_text(cell), cell.tag, span))
    return out


def score_table(table: Node) -> float:
    """Data-likeness score (signals per table_extraction.py:132-211)."""
    score = 0.0
    rows = _direct_rows(table)
    has_thead = any(isinstance(c, Node) and c.tag == "thead" for c in table.children)
    has_tbody = any(isinstance(c, Node) and c.tag == "tbody" for c in table.children)
    n_th = len(_find(table, "th"))
    if has_thead:
        score += 2.0
    if has_tbody:
        score += 1.0
    if n_th:
        score += 2.0
    if any(isinstance(c, Node) and c.tag == "caption" for c in table.children):
        score += 2.0
    if table.attrs.get("summary"):
        score += 1.0
    if (table.attrs.get("role") or "").lower() == "presentation":
        score -= 3.0
    score -= 3.0 * len(_find(table, "table"))  # nested tables → layout
    widths = [sum(span for _, _, span in _cells(r)) for r in rows if _cells(r)]
    if widths:
        mean = sum(widths) / len(widths)
        variance = sum((w - mean) ** 2 for w in widths) / len(widths)
        if variance < 1.0:
            score += 2.0
    if len(rows) >= 2 and widths and max(widths) >= 2:
        score += 2.0
    return score


def extract_table_data(table: Node) -> dict:
    """headers/rows with colspan expansion + row padding/truncation."""
    rows = _direct_rows(table)
    header: list[str] | None = None
    body: list[list[str]] = []
    for row in rows:
        cells = _cells(row)
        if not cells:
            continue
        expanded: list[str] = []
        for text, _tag, span in cells:
            expanded.extend([text] * span)
        if header is None and all(tag == "th" for _, tag, _ in cells):
            header = expanded
        else:
            body.append(expanded)
    if header is None:
        width = max((len(r) for r in body), default=0)
        header = [f"Column {i + 1}" for i in range(width)]
    width = len(header)
    aligned = [(r + [""] * (width - len(r)))[:width] for r in body]
    captions = [c for c in table.children if isinstance(c, Node) and c.tag == "caption"]
    score = score_table(table)
    return {
        "headers": header,
        "rows": aligned,
        "caption": _text(captions[0]) if captions else "",
        "score": score,
        "is_data_table": score >= DATA_TABLE_THRESHOLD,
    }


def extract_tables(html: str) -> list[dict]:
    root = parse_html(html)
    return [extract_table_data(t) for t in _find(root, "table")]


@pandas_udf(ArrayType(TABLE_STRUCT))
def udf_extract_tables(html: pd.Series) -> pd.Series:
    out = []
    for doc in html:
        if doc is None:
            out.append([])
            continue
        if isinstance(doc, (bytes, bytearray)):
            doc = bytes(doc).decode("utf-8", errors="replace")
        try:
            out.append(extract_tables(doc))
        except Exception:
            out.append([])
    return pd.Series(out)
