"""Sitemap seeding source — XML urlset/sitemapindex parsing.

Semantic contract: the reference's sitemap seeder
(``crawl4ai/async_url_seeder.py:885-1280``): robots.txt ``Sitemap:``
lines discover sitemap URLs; sitemap XML yields ``<loc>`` entries;
``<sitemapindex>`` nests further sitemaps (gzip + namespace tolerant —
namespace handling per ``tests/unit/test_sitemap_namespace_parsing.py``).

Batch design: no live fetch — sitemap BODIES arrive as a DataFrame
column (from the pages table, a warehouse dump, or any connector); the
parser is an Arrow UDF over stdlib ``xml.etree`` that classifies each
document and explodes its locs. Index recursion becomes a driver-side
loop: parse → collect nested sitemap urls → join their bodies → repeat
(bounded depth, same shape as the crawl wave loop).
"""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

SITEMAP_RESULT = StructType(
    [
        StructField("kind", StringType()),  # 'urlset' | 'index' | 'invalid'
        StructField("locs", ArrayType(StringType())),
    ]
)

_ROBOTS_SITEMAP_RE = r"(?im)^sitemap:\s*(\S+)"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_urls(body: bytes | str) -> tuple[str, list[str]]:
    """Classify one sitemap document and return its <loc> entries."""
    if body is None:
        return ("invalid", [])
    if isinstance(body, str):
        data = body.encode("utf-8", errors="replace")
    else:
        data = bytes(body)
    if data[:2] == b"\x1f\x8b":  # gzipped sitemap
        try:
            data = gzip.decompress(data)
        except OSError:
            return ("invalid", [])
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return ("invalid", [])
    root_tag = _strip_ns(root.tag)
    if root_tag not in ("urlset", "sitemapindex"):
        return ("invalid", [])
    locs = []
    for el in root.iter():
        if _strip_ns(el.tag) == "loc" and el.text and el.text.strip():
            locs.append(el.text.strip())
    return ("index" if root_tag == "sitemapindex" else "urlset", locs)


@pandas_udf(SITEMAP_RESULT)
def udf_parse_sitemap(body: pd.Series) -> pd.DataFrame:
    rows = []
    for b in body:
        kind, locs = parse_sitemap_urls(b)
        rows.append({"kind": kind, "locs": locs})
    return pd.DataFrame(rows)


def sitemap_urls_from_robots(robots: DataFrame, rules_col: str = "rules_text") -> DataFrame:
    """(host, sitemap_url) rows from robots.txt ``Sitemap:`` lines —
    pure JVM regex, no UDF."""
    return robots.select(
        "host",
        F.explode(F.regexp_extract_all(F.col(rules_col), F.lit(_ROBOTS_SITEMAP_RE), 1)).alias(
            "sitemap_url"
        ),
    )


def expand_sitemaps(
    sitemap_bodies: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    max_depth: int = 3,
) -> DataFrame:
    """Resolve nested sitemap indexes against an in-table body store
    (driver loop, one job per nesting level — mirrors the crawl wave).
    Returns (source_sitemap, url) page entries."""
    bodies = sitemap_bodies.select(F.col(url_col).alias("sm_url"), F.col(body_col).alias("body"))
    frontier = bodies
    pages = None
    for _ in range(max_depth):
        parsed = frontier.select(
            "sm_url", udf_parse_sitemap("body").alias("p")
        ).persist()
        urlsets = parsed.where(F.col("p.kind") == "urlset").select(
            F.col("sm_url").alias("source_sitemap"), F.explode("p.locs").alias("url")
        )
        pages = urlsets if pages is None else pages.unionByName(urlsets)
        nested = (
            parsed.where(F.col("p.kind") == "index")
            .select(F.explode("p.locs").alias("sm_url"))
            .distinct()
        )
        if nested.isEmpty():
            parsed.unpersist()
            break
        frontier = nested.join(bodies, "sm_url")
        parsed.unpersist()
    return pages
