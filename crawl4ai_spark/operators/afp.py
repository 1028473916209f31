"""Audio fingerprinting + audio near-duplicate detection.

The dedup battery covers text (hash/MinHash/SimHash/Jaccard/embedding/
substring) and images/video (`operators/phash.py`); a multimodal web
corpus also carries re-hosted / re-encoded / re-gained AUDIO. The
standard industrial answer is landmark fingerprinting (Wang 2003, "An
Industrial-Strength Audio Search Algorithm" — the Shazam constellation
scheme, also the shape of open-source Chromaprint/Dejavu): spectrogram
peaks survive noise, re-encoding and gain changes; PAIRS of peaks
hashed as (f_anchor, f_target, Δt) are time-shift-INVARIANT once you
histogram the anchor-time offsets between two clips.

The reference (crawl4ai) records audio URLs as media items
(`docs/md_v2/core/link-media.md`) but never fingerprints content; a
100 TB pipeline must. Everything here is stdlib+numpy over the repo's
clean-room PCM WAV decoder (`multimodal.wav_decode`), deterministic
across machines — a hard requirement for a distributed dedup key.

Scale shape
-----------
``audio_fingerprints`` is one Arrow-batched ``mapInPandas`` projection:
payload bytes never shuffle; each clip emits ~|peaks|·fan_out 16-byte
(hash, t) rows. ``audio_neardup_candidates`` is a hash-equi self-join
(never O(n²) cross) followed by the offset histogram as ONE hash
aggregation on (a, b, Δt) and a max-struct rollup per pair — two
bounded-key shuffles. Degenerate hashes (digital silence, test tones —
the audio analogue of the spacer-gif bucket) are dropped by
``max_hash_freq`` with the same auditable-cap contract as
``dedup.max_shingle_freq`` and ``phash.max_band_freq``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pcm_to_mono_float",
    "spectrogram",
    "grid_peaks",
    "constellation_hashes",
    "fingerprint_wav",
    "audio_fingerprints",
    "audio_neardup_candidates",
    "synth_audio_corpus",
]

# STFT geometry: 512-sample Hann frames, hop 256 (50% overlap) — at the
# 8 kHz fixture rate one frame is 64 ms, one hop 32 ms. 257 one-sided
# bins fit 9 bits; Δt ≤ 63 hops fits 6 bits → a 24-bit packed hash.
N_FFT = 512
HOP = 256
_CELL_T = 8  # peak-grid cell: 8 frames ...
_CELL_F = 16  # ... × 16 freq bins
_FAN_OUT = 5
_MAX_DT = 63


def pcm_to_mono_float(rate: int, channels: int, width: int, frames: bytes) -> np.ndarray:
    """Interleaved PCM → mono float64 in [-1, 1] (channel mean). Widths
    1 (unsigned), 2 and 4 (signed little-endian) — the stdlib ``wave``
    surface."""
    if width == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype("float64") / 128.0 - 1.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype("float64") / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype("float64") / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM width {width}")
    if channels > 1:
        usable = (len(x) // channels) * channels
        x = x[:usable].reshape(-1, channels).mean(axis=1)
    return x


def spectrogram(x: np.ndarray, n_fft: int = N_FFT, hop: int = HOP) -> np.ndarray:
    """|STFT| magnitude, Hann window, one-sided — (n_frames, n_fft//2+1)
    float64. Vectorized: frame gather via stride-free fancy indexing +
    one batched rfft."""
    if len(x) < n_fft:
        return np.zeros((0, n_fft // 2 + 1))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    return np.abs(np.fft.rfft(x[idx] * window[None, :], axis=1))


def grid_peaks(spec: np.ndarray) -> list[tuple[int, int]]:
    """Deterministic constellation: the spectrogram is tiled into
    ``_CELL_T × _CELL_F`` cells; each cell contributes its argmax
    (first-occurrence tie-break — exact float equality is deterministic
    here because every path is float64 numpy) when it clears the global
    median magnitude (drops silence cells). Grid-max is simpler than the
    classic dilate-and-compare local-maximum filter but keeps the two
    properties the hash needs: peaks ride the strongest partials (gain-
    and noise-robust) and their density is bounded (≤ 1 per cell)."""
    if spec.size == 0:
        return []
    floor = float(np.median(spec))
    n_t, n_f = spec.shape
    peaks: list[tuple[int, int]] = []
    for t0 in range(0, n_t, _CELL_T):
        for f0 in range(0, n_f, _CELL_F):
            cell = spec[t0 : t0 + _CELL_T, f0 : f0 + _CELL_F]
            flat = int(np.argmax(cell))
            dt, df = divmod(flat, cell.shape[1])
            if cell[dt, df] > floor:
                peaks.append((t0 + dt, f0 + df))
    peaks.sort()
    return peaks


def constellation_hashes(peaks: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Anchor→target pairing: each peak pairs with the next ``_FAN_OUT``
    peaks (time order) within ``_MAX_DT`` hops → ``(hash, t_anchor)``
    with ``hash = f1 << 15 | f2 << 6 | Δt`` (24 bits; f < 512, Δt < 64).
    The Δt-in-hash + anchor-time pair is what makes matching shift-
    invariant: a copy offset by k hops yields identical hashes whose
    anchor times all differ by exactly k."""
    out: list[tuple[int, int]] = []
    for i, (t1, f1) in enumerate(peaks):
        paired = 0
        for t2, f2 in peaks[i + 1 :]:
            dt = t2 - t1
            if dt > _MAX_DT:
                break
            if dt == 0:
                continue
            out.append(((f1 << 15) | (f2 << 6) | dt, t1))
            paired += 1
            if paired >= _FAN_OUT:
                break
    return out


def fingerprint_wav(payload: bytes) -> list[tuple[int, int]] | None:
    """WAV bytes → constellation ``(hash, t_anchor)`` list, or None for
    non-PCM / opaque payloads (poison rows contribute zero rows, the
    dedup-consumer contract shared with ``phash.video_frame_hashes``)."""
    from crawl4ai_spark.operators.multimodal import wav_decode

    try:
        rate, channels, width, frames = wav_decode(payload)
        x = pcm_to_mono_float(rate, channels, width, frames)
    except (ValueError, EOFError):
        return None
    return constellation_hashes(grid_peaks(spectrogram(x)))


# ──────────────────────────────────────────────────────────────────────────
# Spark operators
# ──────────────────────────────────────────────────────────────────────────

_FP_SCHEMA = "media_id long, hash int, t int"


def audio_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-clip constellation fingerprints as one Arrow ``mapInPandas``
    projection — ``(media_id, hash, t)`` rows; payload bytes die inside
    the scan stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            hs: list[int] = []
            ts: list[int] = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                fp = fingerprint_wav(bytes(payload))
                if not fp:
                    continue
                for h, t in fp:
                    ids.append(mid)
                    hs.append(h)
                    ts.append(t)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "hash": pd.array(hs, dtype="int32"),
                    "t": pd.array(ts, dtype="int32"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, _FP_SCHEMA)


def audio_neardup_candidates(
    fingerprints: DataFrame,
    min_matches: int = 20,
    max_hash_freq: int | None = None,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate audio pairs: clips sharing ≥ ``min_matches``
    constellation hashes at ONE consistent time offset —
    ``(media_id_a, media_id_b, offset, n_matches)`` with
    ``media_id_a < media_id_b``, keeping each pair's best offset
    (max matches; smallest offset on ties, deterministically).

    The offset histogram is the Wang-2003 verification step: random
    hash collisions between unrelated clips scatter across offsets,
    while a true copy — even one with leading silence or a trim —
    concentrates its matches at the single true Δt. So the operator is
    TIME-SHIFT-invariant, which the video frame-aligned matcher is not.

    ``max_hash_freq`` drops hashes appearing in more clips than the cap
    (digital silence / shared jingles / test tones), bounding the
    self-join's bucket sizes exactly like ``phash.max_band_freq``."""
    fp = fingerprints.select(
        F.col(id_col).alias("_id"), F.col("hash").alias("_h"), F.col("t").alias("_t")
    )
    if max_hash_freq is not None:
        freq = fp.groupBy("_h").agg(F.count_distinct("_id").alias("_n"))
        fp = fp.join(freq.where(F.col("_n") <= max_hash_freq).drop("_n"), "_h")
    a, b = fp.alias("a"), fp.alias("b")
    offsets = (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h")) & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            (F.col("a._t") - F.col("b._t")).alias("offset"),
        )
        .agg(F.count("*").alias("n_matches"))
    )
    best = offsets.groupBy(f"{id_col}_a", f"{id_col}_b").agg(
        F.max(F.struct("n_matches", (-F.col("offset")).alias("_no"), "offset")).alias("_b")
    )
    return best.select(
        f"{id_col}_a",
        f"{id_col}_b",
        F.col("_b.offset").alias("offset"),
        F.col("_b.n_matches").alias("n_matches"),
    ).where(F.col("n_matches") >= min_matches)


# ──────────────────────────────────────────────────────────────────────────
# Deterministic fixture corpus
# ──────────────────────────────────────────────────────────────────────────


def _wav_encode(x: np.ndarray, rate: int = 8000) -> bytes:
    """float [-1,1] → 16-bit mono PCM WAV (mirror of wav_decode)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _chirp_clip(seed: int, n: int = 16384, rate: int = 8000) -> np.ndarray:
    """Deterministic broadband clip: 6 seeded partials with drifting
    frequencies (chirps) + low seeded noise — spectrogram peaks are
    strong and well-separated, like tonal music."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(6):
        f0 = rng.uniform(200, 3200)
        f1 = f0 * rng.uniform(0.7, 1.4)
        amp = rng.uniform(0.3, 1.0)
        phase = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1]))
        x += amp * np.sin(phase + rng.uniform(0, 2 * np.pi))
    x += 0.02 * rng.standard_normal(n)
    return x / np.max(np.abs(x))


def synth_audio_corpus(n: int = 20) -> list[tuple[int, bytes]]:
    """Deterministic (media_id, payload) WAV corpus with planted
    structure:

    - ``i % 5 == 1`` → RE-GAINED near-duplicate of clip ``i-1``
      (×0.5 gain + fresh low noise: re-encode analogue).
    - ``i % 5 == 3`` → TIME-SHIFTED copy of clip ``i-2``'s signal:
      2048 samples (8 hops) of silence prepended, tail truncated.
    - every 9th payload is opaque bytes (poison: zero rows).
    - everything else: independent seeded chirp clips.
    """
    out: list[tuple[int, bytes]] = []
    clips: dict[int, np.ndarray] = {}
    for i in range(n):
        if i % 9 == 7:
            out.append((i, bytes((i * 41 + j * 13) % 256 for j in range(200))))
            continue
        if i % 5 == 1 and i - 1 in clips:
            rng = np.random.default_rng(9000 + i)
            x = 0.5 * clips[i - 1] + 0.01 * rng.standard_normal(len(clips[i - 1]))
        elif i % 5 == 3 and i - 2 in clips:
            src = clips[i - 2]
            x = np.concatenate([np.zeros(2048), src])[: len(src)]
        else:
            x = _chirp_clip(seed=7000 + i)
        clips[i] = x
        out.append((i, _wav_encode(x)))
    return out
