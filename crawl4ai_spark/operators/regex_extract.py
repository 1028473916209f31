"""Regex-based structured extraction — native regexp_extract_all.

Semantic contract: ``crawl4ai/extraction_strategy.py:2558-2735``
RegexExtractionStrategy — a catalog of built-in patterns (DEFAULT_PATTERNS
:2636-2664: email, url, ipv4/6, uuid, currency, dates, phones, …) applied
IGNORECASE|MULTILINE, emitting {url, label, value} matches.

Spark: one ``regexp_extract_all`` per selected pattern + posexplode — all
JVM-side. (The reference also reports byte spans; Spark's regex functions
don't expose offsets, so the span column is produced only by the optional
pandas-UDF parity path — documented trade-off, the value set is the
contract here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pattern catalog (functionally equivalent to the reference's builtin set;
# spellings adapted to Java regex).
BUILTIN_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?<![\d.])(?:\d{1,3}\.){3}\d{1,3}(?![\d.])",
    "uuid": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "currency": r"[$€£¥]\s?\d+(?:[.,]\d{1,2})?",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "phone_intl": r"\+\d{1,3}[\s.-]?\d{1,4}[\s.-]?\d{3,4}[\s.-]?\d{3,4}",
    "hex_color": r"#[0-9a-fA-F]{6}\b",
    "number": r"(?<![\w.])\d+(?:\.\d+)?(?![\w.])",
}


def regex_extract_matches(
    docs: DataFrame,
    patterns: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, label, value) rows for every match of every selected pattern —
    case-insensitive multiline, like the reference."""
    patterns = patterns or BUILTIN_PATTERNS
    per_label = [
        F.struct(
            F.lit(label).alias("label"),
            F.regexp_extract_all(F.col(text_col), F.lit(f"(?im)({regex})"), 1).alias("values"),
        )
        for label, regex in sorted(patterns.items())
    ]
    return (
        docs.select(F.col(id_col), F.explode(F.array(*per_label)).alias("m"))
        .select(F.col(id_col), F.col("m.label").alias("label"), F.explode("m.values").alias("value"))
    )
