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


# ── pure-Python replica of Spark's xxhash64 over LONG inputs ─────────────
#
# Spark evaluates `xxhash64(col_1, ..., col_n)` as a left fold: h = 42
# (the fixed Spark seed), then h = hashLong(col_i, h) for each column in
# order, where hashLong is the XXH64 single-8-byte-block specialization
# (public algorithm — xxHash spec; Spark's XXH64.hashLong). Having the
# same fold in pure Python lets driver-side code (oracle builders, test
# fixtures) recompute a Spark hash ordering without a SparkSession.
# Parity is pinned by tests/test_properties.py against F.xxhash64.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _hash_long(value: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M64
    k = (value & _M64) * _P2 & _M64
    k = _rotl64(k, 31) * _P1 & _M64
    h ^= k
    h = (_rotl64(h, 27) * _P1 + _P4) & _M64
    h ^= h >> 33
    h = h * _P2 & _M64
    h ^= h >> 29
    h = h * _P3 & _M64
    h ^= h >> 32
    return h


def xxhash64_longs(*values: int) -> int:
    """Signed 64-bit result of Spark's ``F.xxhash64(lit(v1), ..., lit(vn))``
    for bigint inputs — the exact left fold Spark performs (seed 42)."""
    h = 42
    for v in values:
        h = _hash_long(v, h)
    return h - (1 << 64) if h >= (1 << 63) else h
