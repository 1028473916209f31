"""Perceptual image hashing + image near-duplicate detection.

The training-data dedup battery (exact hash, MinHash/LSH, SimHash,
n-gram Jaccard, embedding cosine, SemDeDup, exact-substring) covers
TEXT; a web corpus also carries millions of re-hosted / re-encoded /
lightly-edited IMAGES. The standard industrial answer (used by e.g.
LAION's pipeline and every image-dedup writeup since Zauner 2010,
"Implementation and Benchmarking of Perceptual Image Hash Functions")
is a 64-bit perceptual hash per image + a Hamming-distance cutoff:

- ``ahash64`` — average hash: 8×8 luma resize, bit = pixel > mean.
- ``dhash64`` — difference hash: 9×8 luma resize, bit = horizontal
  gradient sign (robust to global brightness/contrast shifts).
- ``phash64`` — DCT hash: 32×32 luma resize, orthonormal 2-D DCT-II,
  keep the top-left 8×8 low-frequency block, bit = coefficient >
  median of the 64 (robust to re-encoding, mild noise and resizing).

The reference (crawl4ai) extracts media URLs and scores relevance
(`docs/md_v2/core/link-media.md`) but never fingerprints image CONTENT;
a 100 TB multimodal pipeline must. Everything here is pure
stdlib+numpy over the repo's own clean-room decoders (PNG/GIF/BMP/JPEG
— `operators/multimodal.py`, `operators/jpeg.py`), so the hashes are
deterministic across machines — a hard requirement for a distributed
dedup key.

Scale shape
-----------
``image_hashes`` is one Arrow-batched ``mapInPandas`` projection —
payload bytes never shuffle, each task emits 5 scalar columns per
image. ``phash_neardup_candidates`` is the SimHash/LSH banding play in
the hash domain: split the 64-bit hash into ``n_bands`` equal bit
slices; by pigeonhole, two hashes within Hamming distance
``d < n_bands`` agree on at least one slice, so a self-equi-join on
(band index, band value) has EXACT recall for ``max_hamming <=
n_bands - 1`` while shuffling only ``n_bands`` 8-byte rows per image —
never the O(n²) cross join. Flat/monochrome web images (tracking
pixels, spacer gifs) all share a handful of hashes and would create
quadratic hot buckets, so ``max_band_freq`` drops pathological buckets
with an auditable count, same contract as ``dedup.max_shingle_freq``.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "resize_bilinear",
    "to_gray",
    "ahash64",
    "dhash64",
    "phash64",
    "hash_image_payload",
    "image_hashes",
    "resize_images",
    "phash_neardup_candidates",
    "synth_image_corpus",
    "video_frame_hashes",
    "video_neardup_candidates",
    "video_neardup_shifted",
    "synth_video_corpus",
]


# ──────────────────────────────────────────────────────────────────────────
# numpy core (runs inside the Arrow batches; also the driver-side mirror
# for oracle literal export)
# ──────────────────────────────────────────────────────────────────────────


def to_gray(width: int, height: int, channels: int, pix: bytes) -> np.ndarray:
    """ITU-R BT.601 luma as float64 H×W (the same weights the feature
    decoder uses, so gray values agree across the module)."""
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(height, width, channels)
    a = arr.astype("float64")
    if channels >= 3:
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return a[:, :, 0]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample (half-pixel-center convention, the PIL/OpenCV
    default): output sample j maps to source coordinate
    ``(j + 0.5) * in/out - 0.5`` clamped to the image. Identity when the
    size is unchanged. Pure-numpy gather + lerp — vectorized, no Python
    loops, float64 so the hash bit pattern is machine-independent.

    This is also the module's generic "resize" plumbing step for
    multimodal payloads (`resize_images` below wraps it per-channel).
    """
    in_h, in_w = img.shape[:2]
    ys = (np.arange(out_h, dtype="float64") + 0.5) * (in_h / out_h) - 0.5
    xs = (np.arange(out_w, dtype="float64") + 0.5) * (in_w / out_w) - 0.5
    ys = np.clip(ys, 0.0, in_h - 1.0)
    xs = np.clip(xs, 0.0, in_w - 1.0)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    if img.ndim == 2:
        p00 = img[np.ix_(y0, x0)]
        p01 = img[np.ix_(y0, x1)]
        p10 = img[np.ix_(y1, x0)]
        p11 = img[np.ix_(y1, x1)]
    else:
        fy = fy[:, :, None]
        fx = fx[:, :, None]
        p00 = img[np.ix_(y0, x0)]
        p01 = img[np.ix_(y0, x1)]
        p10 = img[np.ix_(y1, x0)]
        p11 = img[np.ix_(y1, x1)]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major MSB-first 64-bit pack → SIGNED int64 (two's complement)
    so the value stores in a Spark/parquet long without widening."""
    v = 0
    for b in bits.reshape(-1).astype(bool):
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def ahash64(gray: np.ndarray) -> int:
    g = resize_bilinear(gray, 8, 8)
    return _pack_bits(g > g.mean())


def dhash64(gray: np.ndarray) -> int:
    g = resize_bilinear(gray, 8, 9)  # 9 columns → 8 horizontal gradients
    return _pack_bits(g[:, 1:] > g[:, :-1])


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n, dtype="float64")[:, None]
        m = np.cos(math.pi * (2 * np.arange(n, dtype="float64")[None, :] + 1) * k / (2 * n))
        m *= math.sqrt(2.0 / n)
        m[0, :] = math.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def phash64(gray: np.ndarray) -> int:
    g = resize_bilinear(gray, 32, 32)
    m = _dct_matrix(32)
    d = m @ g @ m.T
    # quantize before thresholding: the dgemm above is the one BLAS-
    # dependent step, and exact-zero AC coefficients (flat images) come
    # back as ±1e-13 noise whose sign varies by backend — rounding to
    # 1e-6 pins the bit pattern across driver/executor/architectures
    low = np.round(d[:8, :8], 6)
    return _pack_bits(low > np.median(low))


def hash_image_payload(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """bytes → (width, height, ahash, dhash, phash), or None when the
    payload is not a pixel-decodable image (probe-only or opaque
    formats keep the poison-tolerance contract: null hashes, not an
    error)."""
    from crawl4ai_spark.operators.multimodal import decode_image_pixels

    decoded = decode_image_pixels(payload)
    if decoded is None:
        return None
    w, h, c, pix = decoded
    if w < 2 or h < 2:  # a 1-pixel tracking gif has no gradient content
        return None
    gray = to_gray(w, h, c, pix)
    return w, h, ahash64(gray), dhash64(gray), phash64(gray)


# ──────────────────────────────────────────────────────────────────────────
# Spark operators
# ──────────────────────────────────────────────────────────────────────────

_HASH_SCHEMA = (
    "media_id long, decode_ok boolean, width int, height int, "
    "ahash long, dhash long, phash long"
)


def image_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-image perceptual hashes as one Arrow-batched ``mapInPandas``
    projection. Only (id, payload) reach Python — callers should not
    widen the projection — and only 7 scalar columns come back, so the
    expensive binary column dies inside the scan stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "decode_ok", "width", "height", "ahash", "dhash", "phash")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                res = None
                if payload is not None:
                    try:
                        res = hash_image_payload(bytes(payload))
                    except (ValueError, IndexError, OverflowError):
                        res = None  # malformed stream → poison row
                out["media_id"].append(mid)
                if res is None:
                    out["decode_ok"].append(False)
                    for k in ("width", "height", "ahash", "dhash", "phash"):
                        out[k].append(None)
                else:
                    w, h, a, d, p = res
                    out["decode_ok"].append(True)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["ahash"].append(a)
                    out["dhash"].append(d)
                    out["phash"].append(p)
            # nullable Int64, NOT plain lists: a None in the column would
            # coerce to float64 and silently round 64-bit hashes past 2^53
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "decode_ok": out["decode_ok"],
                    **{
                        k: pd.array(out[k], dtype="Int64")
                        for k in ("width", "height", "ahash", "dhash", "phash")
                    },
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, _HASH_SCHEMA)


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Generic resize plumbing step: decode → bilinear resample →
    packed RGB bytes (uint8, row-major). Non-decodable payloads yield
    ``decode_ok=false`` with a null pixel column. Output rows carry
    ``out_w*out_h*3`` bytes regardless of input size, so downstream
    stages (thumbnail sinks, embedding feeders) get bounded row widths
    — the property that keeps Arrow batch memory predictable when the
    input mixes icons with camera originals."""
    from crawl4ai_spark.operators.multimodal import decode_image_pixels

    schema = f"{id_col} long, decode_ok boolean, width int, height int, pixels binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks, ws, hs, pxs = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                decoded = None
                if payload is not None:
                    try:
                        decoded = decode_image_pixels(bytes(payload))
                    except (ValueError, IndexError, OverflowError):
                        decoded = None
                if decoded is None:
                    oks.append(False)
                    ws.append(None)
                    hs.append(None)
                    pxs.append(None)
                    continue
                w, h, c, pix = decoded
                arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c).astype("float64")
                if c == 1:
                    arr = np.repeat(arr, 3, axis=2)
                elif c > 3:
                    arr = arr[:, :, :3]
                small = resize_bilinear(arr, out_h, out_w)
                oks.append(True)
                ws.append(out_w)
                hs.append(out_h)
                pxs.append(np.clip(np.rint(small), 0, 255).astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "decode_ok": oks,
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "pixels": pxs,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def phash_neardup_candidates(
    hashes: DataFrame,
    hash_col: str = "phash",
    id_col: str = "media_id",
    max_hamming: int = 7,
    n_bands: int = 8,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance on a 64-bit
    perceptual hash: ``(media_id_a, media_id_b, hamming)`` with
    ``media_id_a < media_id_b`` and ``hamming <= max_hamming``.

    Mechanism: band the hash into ``n_bands`` equal bit slices
    (``shiftrightunsigned`` + mask, all codegen), self-equi-join on
    (band index, band value), dedup candidate pairs, then the exact
    distance ``bit_count(a ^ b)`` filters. Pigeonhole: ``hamming <
    n_bands`` ⇒ at least one band untouched ⇒ the join finds the pair —
    so recall is EXACT for ``max_hamming <= n_bands - 1`` (asserted
    here), at n_bands rows shuffled per image instead of an O(n²)
    cross join. Raise ``n_bands`` to 16 (4-bit slices) to keep
    exactness at looser thresholds.

    ``max_band_freq`` guards the flat-image pathology (every spacer
    gif shares one hash → a quadratic bucket): buckets with more
    members are dropped from the join. That trades recall ONLY among
    hashes so over-represented that they are better handled by the
    exact-duplicate (hash-groupBy) path first.
    """
    if not 1 <= n_bands <= 64 or 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the exact-recall bound "
            f"{n_bands - 1} for {n_bands} bands; raise n_bands"
        )
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    h = F.col(hash_col)
    bands = hashes.where(h.isNotNull()).select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(h, bits * b).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ])
        ).alias("_band", "_bv"),
    )
    if max_band_freq is not None:
        counts = bands.groupBy("_band", "_bv").agg(F.count("*").alias("_n"))
        bands = bands.join(
            counts.where(F.col("_n") <= max_band_freq).drop("_n"),
            ["_band", "_bv"],
        )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bv") == F.col("b._bv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
    )
    return pairs.select(
        f"{id_col}_a",
        f"{id_col}_b",
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


# ──────────────────────────────────────────────────────────────────────────
# Video near-dup: per-frame phash over sampled y4m luma planes
# ──────────────────────────────────────────────────────────────────────────

_FRAME_SCHEMA = "media_id long, frame_idx int, phash long"


def video_frame_hashes(
    media: DataFrame,
    frame_stride: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-sampled-frame perceptual hashes for y4m video payloads:
    ``(media_id, frame_idx, phash)`` rows, one per ``frame_stride``-th
    frame. The luma plane feeds ``phash64`` directly (video phash is
    computed on luma by convention — chroma is never materialized, so a
    skipped frame costs a pointer bump, not a copy). Non-video /
    undecodable payloads contribute zero rows (the dedup consumer's
    poison contract; per-payload decode status lives in
    ``multimodal.extract_media_features``). One Arrow ``mapInPandas``
    projection: payload bytes never shuffle, ~n_frames/stride 20-byte
    rows come back per clip."""
    from crawl4ai_spark.operators.multimodal import y4m_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            fidx: list[int] = []
            ph: list[int] = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    w, h, _fps, lumas = y4m_decode(bytes(payload), frame_stride)
                except (ValueError, IndexError, OverflowError):
                    continue
                if w < 2 or h < 2:
                    continue
                for k, luma in enumerate(lumas):
                    g = np.frombuffer(luma, dtype=np.uint8).reshape(h, w).astype("float64")
                    ids.append(mid)
                    fidx.append(k)
                    ph.append(phash64(g))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(fidx, dtype="int32"),
                    "phash": pd.array(ph, dtype="int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, _FRAME_SCHEMA)


def video_neardup_candidates(
    frame_hashes: DataFrame,
    max_hamming: int = 7,
    n_bands: int = 8,
    min_match_frac: float = 0.8,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate video pairs from per-frame hashes: two clips match
    when ≥ ``min_match_frac`` of their FRAME-ALIGNED sampled frames are
    within ``max_hamming`` bits — the re-encode / re-scale / brightness-
    shift / logo-stamp family (trimmed or time-shifted copies need
    sequence alignment and are out of scope; a 100 TB pipeline runs this
    cheap aligned pass first).

    Scale shape: the image banding play with ``frame_idx`` added to the
    join key, so a frame only meets the SAME frame index of other clips
    — bucket sizes stay |corpus|-bound per frame slot, never
    |corpus|×|frames|. Per-frame exactness is pigeonhole-exact for
    ``max_hamming <= n_bands - 1`` (enforced), so the pair-level
    match-fraction is exact, not approximate.

    Returns ``(media_id_a, media_id_b, n_matched, n_frames_a,
    n_frames_b, match_frac)`` with ``match_frac = n_matched /
    max(n_frames_a, n_frames_b)`` — the conservative denominator, so a
    3-frame clip can never claim a 100-frame clip as a duplicate."""
    if not 1 <= n_bands <= 64 or 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the exact-recall bound "
            f"{n_bands - 1} for {n_bands} bands; raise n_bands"
        )
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    h = F.col("phash")
    bands = frame_hashes.select(
        F.col(id_col).alias("_id"),
        F.col("frame_idx").alias("_f"),
        h.alias("_h"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(h, bits * b).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ])
        ).alias("_band", "_bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    frame_pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bv") == F.col("b._bv"))
            & (F.col("a._f") == F.col("b._f"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("_ida"),
            F.col("b._id").alias("_idb"),
            F.col("a._f").alias("_f"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
        .where(F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_hamming)
    )
    matched = frame_pairs.groupBy("_ida", "_idb").agg(F.count("*").alias("n_matched"))
    counts = frame_hashes.groupBy(F.col(id_col).alias("_cid")).agg(
        F.count("*").alias("_n")
    )
    return (
        matched.join(counts, matched["_ida"] == counts["_cid"])
        .select("_ida", "_idb", "n_matched", F.col("_n").alias("n_frames_a"))
        .join(counts, F.col("_idb") == counts["_cid"])
        .select(
            F.col("_ida").alias(f"{id_col}_a"),
            F.col("_idb").alias(f"{id_col}_b"),
            "n_matched",
            "n_frames_a",
            F.col("_n").alias("n_frames_b"),
            (
                F.col("n_matched")
                / F.greatest(F.col("n_frames_a"), F.col("_n"))
            ).alias("match_frac"),
        )
        .where(F.col("match_frac") >= min_match_frac)
    )


def video_neardup_shifted(
    frame_hashes: DataFrame,
    max_hamming: int = 7,
    n_bands: int = 8,
    min_matched_frames: int = 4,
    min_match_frac: float = 0.5,
    max_band_freq: int | None = None,
    id_col: str = "media_id",
) -> DataFrame:
    """TIME-SHIFT-invariant video near-dup: the Wang-2003 offset-
    histogram verification (``afp.audio_neardup_candidates``) applied to
    per-frame perceptual hashes, closing the limitation
    ``video_neardup_candidates`` documents — a trimmed or time-shifted
    copy (intro removed, clip re-cut with leading frames) never matches
    the frame-ALIGNED pass, but its matches concentrate at one
    consistent frame offset here, while random hash collisions between
    unrelated clips scatter across offsets.

    Mechanism: band each frame hash as in the aligned pass but WITHOUT
    ``frame_idx`` in the join key, verify candidates with the exact
    ``bit_count(a ^ b) <= max_hamming`` distance (pigeonhole-exact
    recall for ``max_hamming <= n_bands - 1``), then histogram matches
    per (pair, ``offset = frame_idx_a - frame_idx_b``) and keep each
    pair's best offset (max matched frames; smallest offset on ties,
    deterministically). A pair survives with ``n_matched >=
    min_matched_frames`` AND ``match_frac = n_matched /
    least(n_frames_a, n_frames_b) >= min_match_frac`` — the
    min-denominator is the subclip semantic (a trimmed copy can only
    overlap for the shorter clip's length), with the absolute
    ``min_matched_frames`` floor so a 2-frame fragment cannot claim
    anything on one lucky collision.

    Scale shape: dropping ``frame_idx`` from the key makes a bucket
    hold every sampled frame of every clip sharing the band value — the
    static-clip / spacer-loop pathology multiplies that quadratically,
    so ``max_band_freq`` drops buckets with more ROWS than the cap
    (direct join-cost bound; a clip whose frames are all identical is
    better served by the aligned pass or an exact-hash groupBy first).
    Everything else is two bounded-key hash shuffles (band join,
    offset-histogram agg) — never O(n²) in clips.
    """
    if not 1 <= n_bands <= 64 or 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the exact-recall bound "
            f"{n_bands - 1} for {n_bands} bands; raise n_bands"
        )
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    h = F.col("phash")
    bands = frame_hashes.select(
        F.col(id_col).alias("_id"),
        F.col("frame_idx").alias("_f"),
        h.alias("_h"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(h, bits * b).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ])
        ).alias("_band", "_bv"),
    )
    if max_band_freq is not None:
        counts = bands.groupBy("_band", "_bv").agg(F.count("*").alias("_n"))
        bands = bands.join(
            counts.where(F.col("_n") <= max_band_freq).drop("_n"),
            ["_band", "_bv"],
        )
    a, b = bands.alias("a"), bands.alias("b")
    frame_pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bv") == F.col("b._bv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("_ida"),
            F.col("b._id").alias("_idb"),
            F.col("a._f").alias("_fa"),
            F.col("b._f").alias("_fb"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
        .where(F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_hamming)
    )
    # at a fixed offset each _fa pairs with exactly one _fb (= _fa-offset),
    # and (_ida,_idb,_fa,_fb) is distinct above, so count(*) counts frames
    offsets = frame_pairs.groupBy(
        "_ida", "_idb", (F.col("_fa") - F.col("_fb")).alias("offset")
    ).agg(F.count("*").alias("n_matched"))
    best = offsets.groupBy("_ida", "_idb").agg(
        F.max(F.struct("n_matched", (-F.col("offset")).alias("_no"), "offset")).alias("_b")
    )
    counts = frame_hashes.groupBy(F.col(id_col).alias("_cid")).agg(
        F.count("*").alias("_n")
    )
    return (
        best.join(counts, best["_ida"] == counts["_cid"])
        .select("_ida", "_idb", "_b", F.col("_n").alias("n_frames_a"))
        .join(counts, F.col("_idb") == counts["_cid"])
        .select(
            F.col("_ida").alias(f"{id_col}_a"),
            F.col("_idb").alias(f"{id_col}_b"),
            F.col("_b.offset").alias("offset"),
            F.col("_b.n_matched").alias("n_matched"),
            "n_frames_a",
            F.col("_n").alias("n_frames_b"),
            (
                F.col("_b.n_matched") / F.least(F.col("n_frames_a"), F.col("_n"))
            ).alias("match_frac"),
        )
        .where(
            (F.col("n_matched") >= min_matched_frames)
            & (F.col("match_frac") >= min_match_frac)
        )
    )


def _y4m_encode(frames: list[np.ndarray]) -> bytes:
    """Minimal C420 YUV4MPEG2 writer from uint8 luma frames (zero
    chroma) — the mirror of multimodal.y4m_decode."""
    h, w = frames[0].shape
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    chroma = bytes((w * h) // 2)
    return head + b"".join(
        b"FRAME\n" + f.astype(np.uint8).tobytes() + chroma for f in frames
    )


def synth_video_corpus(n: int = 24, n_frames: int = 12) -> list[tuple[int, bytes]]:
    """Deterministic (media_id, payload) y4m corpus with planted
    structure mirroring ``synth_image_corpus``:

    - ``i % 4 == 1`` → NEAR-duplicate of clip ``i-1``: same frames, one
      8×8 block mildly brightened in EVERY frame (logo-stamp analogue).
    - ``i % 8 == 3`` → partial overlap: first half of ``i-1``'s frames
      duplicated, second half independent (must NOT pass min_match_frac
      thresholds ≥ 0.6).
    - every 7th payload is opaque bytes (poison: zero frame rows).
    - everything else: independent temporally-evolving low-pass fields.
    """
    out: list[tuple[int, bytes]] = []
    prev: list[np.ndarray] | None = None
    for i in range(n):
        if i % 7 == 5:
            out.append((i, bytes((i * 37 + j * 11) % 256 for j in range(128))))
            continue
        if i % 4 == 1 and prev is not None:
            frames = []
            for f in prev:
                g = f.copy()
                g[8:16, 8:16] = np.clip(g[8:16, 8:16].astype("int64") + 14, 0, 255).astype(
                    np.uint8
                )
                frames.append(g)
        elif i % 8 == 3 and prev is not None:
            half = n_frames // 2
            frames = [f.copy() for f in prev[:half]] + [
                _base_pixels(seed=5000 + i * 100 + k, w=64, h=48)[:, :, 0]
                for k in range(n_frames - half)
            ]
        else:
            base = _base_pixels(seed=4000 + i, w=64, h=48)[:, :, 0].astype("float64")
            drift = _base_pixels(seed=4500 + i, w=64, h=48)[:, :, 0].astype("float64")
            frames = [
                np.clip(
                    np.rint(base * (1 - k / (2 * n_frames)) + drift * (k / (2 * n_frames))),
                    0,
                    255,
                ).astype(np.uint8)
                for k in range(n_frames)
            ]
        out.append((i, _y4m_encode(frames)))
        prev = frames
    return out


# ──────────────────────────────────────────────────────────────────────────
# Deterministic fixture corpus (tests + oracle row share it)
# ──────────────────────────────────────────────────────────────────────────


def _bmp_encode(arr: np.ndarray) -> bytes:
    """Minimal 24-bit BMP writer (bottom-up, BGR, 4-byte row padding) —
    the mirror of multimodal.bmp_decode, used to plant pixel-exact
    duplicates in a second container format."""
    h, w = arr.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += arr[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
    off = 14 + 40
    size = off + len(body)
    hdr = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return hdr + info + bytes(body)


def _base_pixels(seed: int, w: int = 64, h: int = 48) -> np.ndarray:
    """Low-pass random field (coarse 6×8 noise bilinearly upsampled):
    broadband low-frequency content like a natural photo, so the 8×8
    DCT block has well-separated coefficients — measured: a mild local
    block edit moves phash ≤ 6 bits while independent seeds sit ≥ 16
    apart (median 32). Pure sinusoids fail here: their energy
    concentrates in a few coefficients, parking the other ~60 at the
    median where any edit flips dozens of bits."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), dtype="float64")
    for ch in range(3):
        img[:, :, ch] = resize_bilinear(rng.uniform(0, 255, size=(6, 8)), h, w)
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


def synth_image_corpus(n: int = 60) -> list[tuple[int, bytes]]:
    """Deterministic (media_id, payload) corpus with planted structure:

    - ``i % 5 == 1`` → NEAR-duplicate of image ``i-1``: the same pixels
      with one 8×8 block mildly brightened (re-crop/logo-stamp analogue).
    - ``i % 10 == 4`` → pixel-EXACT duplicate of ``i-1`` re-encoded as
      PNG instead of BMP (container change, Hamming 0).
    - every 13th payload is opaque bytes (poison row: null hashes).
    - everything else is an independent seeded base image.
    """
    from crawl4ai_spark.operators.multimodal import synth_png

    out: list[tuple[int, bytes]] = []
    prev: np.ndarray | None = None
    for i in range(n):
        if i % 13 == 7:
            out.append((i, bytes((i * 31 + j * 7) % 256 for j in range(96))))
            continue
        if i % 5 == 1 and prev is not None:
            arr = prev.copy()
            block = arr[8:16, 8:16].astype("int64") + 14
            arr[8:16, 8:16] = np.clip(block, 0, 255).astype(np.uint8)
            out.append((i, _bmp_encode(arr)))
            prev = arr
            continue
        if i % 10 == 4 and prev is not None:
            out.append((i, _png_encode_rgb(prev)))
            # prev unchanged: i has the same pixels as i-1
            continue
        prev = _base_pixels(seed=1000 + i)
        out.append((i, _bmp_encode(prev)))
    _ = synth_png  # imported to fail fast if multimodal moves
    return out


def _png_encode_rgb(arr: np.ndarray) -> bytes:
    """Store-only PNG writer for RGB uint8 pixels (filter 0 rows,
    single IDAT) — mirrors multimodal.png_decode."""
    import struct
    import zlib

    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
