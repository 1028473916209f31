"""64-bit fingerprints — the URL-seen-set key and content-change hash.

The reference fingerprints content with XXH64 (``crawl4ai/utils.py:2841-2843``)
and prototypes a bloom-filter seen-set keyed on URL hashes
(``crawl4ai/deep_crawling/crazy.py:102-165``). Spark ships the same XXH64
algorithm natively (``xxhash64``, seed 42 — JVM-side, whole-stage-codegen
friendly), so fingerprints here are pure column expressions: zero Python,
zero shuffle, computed during the scan projection.

Engine convention (documented contract, stable across the codebase):
    url_fp     = xxhash64(canonical_url)          # seed 42 (Spark default)
    content_fp = xxhash64(text)                   # change detection
Collision risk at 10^10 URLs: ~3e-? — birthday bound ≈ (10^10)^2 / 2^65
≈ 2.7e-0 ... per-pair 2^-64; expected collisions ≈ 2.7 at 10^10 keys, which
is why the seen-set anti-join keys on (url_fp, url) when exactness is
required and on url_fp alone only in the bloom pre-filter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_fingerprint(url_col: Column | str) -> Column:
    """64-bit URL fingerprint (native XXH64, JVM-side)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.xxhash64(col)


def content_fingerprint(text_col: Column | str) -> Column:
    """64-bit content hash for change detection / exact dedup."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.xxhash64(col)
