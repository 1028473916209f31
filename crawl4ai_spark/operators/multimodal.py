"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages. All three kinds have REAL
pure-stdlib decoders: PNG (zlib inflate + filter reconstruction) and
24-bit BMP pixel decode plus JPEG/GIF header dimension probes for
images, PCM WAV (stdlib ``wave``) for audio, and YUV4MPEG2 (y4m) with
strided frame sampling for video. Compressed-codec formats (JPEG
pixels, MP3, H.264) need external libs absent from this environment —
unrecognized payloads take a deterministic byte-histogram fallback, and
a deployment registers richer decoders (PIL/torchaudio/ffmpeg) via
``DecoderRegistry.register`` without touching the pipeline.

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


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the PNG spec —
# the decoder reconstructs each pass as its own filtered sub-image and
# scatters pixels back onto the full grid.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, width: int, height: int,
                  channels: int, depth: int) -> tuple[list[bytearray], int]:
    """Reverse PNG scanline filters 0-4 on one (sub-)image whose filtered
    scanlines start at ``raw[pos]``; returns the packed unfiltered rows
    and the position just past them. Filtering is byte-level with
    bpp = the byte width of one pixel, rounded UP to 1 for sub-byte
    depths, exactly as the spec defines the left-neighbor distance."""
    bits_pp = channels * depth
    stride = (width * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    if len(raw) < pos + height * (stride + 1):
        raise ValueError("short PNG pixel data")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
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
        rows.append(line)
        prev = line
    return rows, pos


def _png_row_samples(row: bytearray, width: int, channels: int, depth: int,
                     scale_subbyte: bool) -> list[int]:
    """Unpack one packed scanline into width*channels 8-bit samples.
    16-bit samples take the high byte (the spec's own 8-bit reduction);
    sub-byte samples unpack MSB-first and are scaled to full 8-bit range
    for gray (palette INDICES stay raw: scale_subbyte=False)."""
    n = width * channels
    if depth == 8:
        return list(row[:n])
    if depth == 16:
        return list(row[0 : 2 * n : 2])
    scale = 255 // ((1 << depth) - 1) if scale_subbyte else 1
    out = []
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    for i in range(n):
        byte = row[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append(((byte >> shift) & mask) * scale)
    return out


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode (zlib inflate + filter reconstruction) →
    (width, height, channels, raw interleaved 8-bit pixels).

    Full static-PNG coverage: color types 0 (gray), 2 (RGB), 3 (palette,
    expanded to RGB — RGBA when a tRNS chunk is present), 4 (gray+alpha),
    6 (RGBA); bit depths 1/2/4/8/16 (16-bit reduced to the high byte,
    sub-byte gray scaled to full range); interlace 0 and 1 (Adam7 — each
    pass unfiltered as its own sub-image then scattered). Filters 0-4
    per the spec (None/Sub/Up/Average/Paeth). Raises ValueError on
    malformed streams — the caller treats that as decode_ok=false, not a
    job failure.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = depth = color = interlace = None
    palette: bytes | None = None
    trns: bytes | None = None
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
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
            if depth not in (1, 2, 4, 8, 16) or interlace not in (0, 1):
                raise ValueError(f"bad PNG depth/interlace {depth}/{interlace}")
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"tRNS" and color == 3:
            trns = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    scale_subbyte = color != 3  # palette indices must stay raw
    # samples[y] = width*channels 8-bit values (or palette indices)
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, width, height, channels, depth)
        samples = [
            _png_row_samples(r, width, channels, depth, scale_subbyte) for r in rows
        ]
    else:
        samples = [[0] * (width * channels) for _ in range(height)]
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _png_unfilter(raw, off, pw, ph, channels, depth)
            for j, r in enumerate(rows):
                vals = _png_row_samples(r, pw, channels, depth, scale_subbyte)
                y = y0 + j * dy
                for i in range(pw):
                    x = x0 + i * dx
                    samples[y][x * channels : (x + 1) * channels] = vals[
                        i * channels : (i + 1) * channels
                    ]
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        out_ch = 4 if trns is not None else 3
        out = bytearray(height * width * out_ch)
        k = 0
        for row in samples:
            for idx in row:
                if 3 * idx + 2 >= len(palette):
                    raise ValueError("PNG palette index out of range")
                out[k : k + 3] = palette[3 * idx : 3 * idx + 3]
                if out_ch == 4:
                    out[k + 3] = trns[idx] if idx < len(trns) else 255
                k += out_ch
        return width, height, out_ch, bytes(out)
    out = bytearray(height * width * channels)
    k = 0
    for row in samples:
        out[k : k + len(row)] = bytes(row)
        k += len(row)
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
    import numpy as np

    # vectorized: strip per-row padding, flip bottom-up rows, BGR→RGB
    data = np.frombuffer(payload, np.uint8, count=row_bytes * height, offset=pixel_off)
    rows = data.reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return width, height, 3, rows[:, :, ::-1].tobytes()


def jpeg_probe(payload: bytes) -> tuple[int, int, int]:
    """JPEG dimension probe → (width, height, components) from the first
    SOF marker (baseline/progressive). Pure marker-walk, no pixel decode
    (Huffman+DCT needs a codec lib); raises ValueError on malformed
    streams."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, n = 2, len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while pos < n and payload[pos] == 0xFF:  # spec: optional fill bytes
            pos += 1
        if pos >= n:
            break
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: SOF must have preceded
            break
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            height, width = struct.unpack(">HH", payload[pos + 3 : pos + 7])
            return width, height, payload[pos + 7]
        pos += seglen
    raise ValueError("JPEG without SOF")


def gif_probe(payload: bytes) -> tuple[int, int, int]:
    """GIF87a/89a logical-screen dimensions → (width, height, 3)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", payload[6:10])
    return width, height, 3


def webp_probe(payload: bytes) -> tuple[int, int, int]:
    """WebP dimensions from the RIFF container → (width, height, c).
    Handles all three stream kinds: VP8 (lossy key frame: 0x9D012A start
    code then 14-bit dims), VP8L (lossless: 0x2F signature then packed
    14-bit dims-1), VP8X (extended: 24-bit canvas dims-1). Pixel decode
    is a VP8 codec — out of scope; the caller uses byte-stat features."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    fourcc = payload[12:16]
    if fourcc == b"VP8 ":
        if payload[23:26] != b"\x9d\x01\x2a":
            raise ValueError("WebP VP8 without key-frame start code")
        w, h = struct.unpack("<HH", payload[26:30])
        return (w & 0x3FFF), (h & 0x3FFF), 3
    if fourcc == b"VP8L":
        if len(payload) < 25 or payload[20] != 0x2F:
            raise ValueError("bad WebP VP8L signature")
        (bits,) = struct.unpack("<I", payload[21:25])
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, 4
    if fourcc == b"VP8X":
        if len(payload) < 30:
            raise ValueError("truncated WebP VP8X")
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        return w, h, 4 if payload[20] & 0x10 else 3  # alpha flag
    raise ValueError(f"unknown WebP chunk {fourcc!r}")


def ico_probe(payload: bytes) -> tuple[int, int, int]:
    """ICO directory probe → the LARGEST icon's (width, height, 4)
    (a 0 byte means 256 per the format)."""
    import struct

    if payload[:4] != b"\x00\x00\x01\x00" or len(payload) < 6:
        raise ValueError("not an ICO")
    (count,) = struct.unpack("<H", payload[4:6])
    if count == 0 or len(payload) < 6 + 16 * count:
        raise ValueError("empty/truncated ICO directory")
    best = (0, 0)
    for i in range(count):
        off = 6 + 16 * i
        w = payload[off] or 256
        h = payload[off + 1] or 256
        if w * h > best[0] * best[1]:
            best = (w, h)
    return best[0], best[1], 4


def svg_probe(payload: bytes) -> tuple[int, int, int]:
    """SVG dimension probe: width/height attributes on the root <svg>
    (unit suffixes stripped), falling back to the viewBox box. Vector →
    no intrinsic pixels; features use byte stats."""
    import re

    head = payload[:4096].decode("utf-8", "replace")
    m = re.search(r"<svg\b[^>]*>", head, re.IGNORECASE | re.DOTALL)
    if m is None:
        raise ValueError("not an SVG")
    tag = m.group(0)

    def attr(name: str) -> float | None:
        am = re.search(rf'{name}\s*=\s*["\']\s*([0-9.]+)', tag, re.IGNORECASE)
        return float(am.group(1)) if am else None

    w, h = attr("width"), attr("height")
    if w is None or h is None:
        vb = re.search(
            r'viewBox\s*=\s*["\']\s*[-0-9.]+[\s,]+[-0-9.]+[\s,]+([0-9.]+)[\s,]+([0-9.]+)',
            tag,
            re.IGNORECASE,
        )
        if vb is None:
            raise ValueError("SVG without width/height or viewBox")
        w, h = float(vb.group(1)), float(vb.group(2))
    return int(round(w)), int(round(h)), 4


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int, npix: int) -> bytearray:
    """GIF variable-width LZW decompression (LSB-first bit packing,
    clear/EOI codes, 12-bit dictionary cap with deferred-clear handling)
    → exactly ``npix`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < npix:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad initial GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("bad GIF LZW code")
        out += entry
        prev = entry
        # widen when the NEXT code could index past the current width;
        # 12 bits is the spec cap (deferred clears just keep emitting)
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < npix:
        raise ValueError("short GIF pixel data")
    del out[npix:]
    return out


def gif_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib GIF87a/89a FIRST-frame pixel decode → (screen_w,
    screen_h, 3, RGB bytes): block walk, variable-width LZW, the 4-pass
    interlace reorder, local-over-global color table, and GCE
    transparency compositing onto the logical-screen background — the
    web's third image format, so the feature extractor gets real pixels
    instead of the byte-statistics probe. Raises ValueError on malformed
    streams (the caller falls back to ``gif_probe``).

    Reference parity note: crawl4ai ships no codec (media stays URL/attr
    metadata, models.py MediaItem); this decoder serves the multimodal
    feature path SURVEY §2 adds for training-data pipelines.
    """
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg_index, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_pal: np.ndarray | None = None
    if flags & 0x80:
        gct_len = 2 << (flags & 0x07)
        global_pal = np.frombuffer(
            payload, np.uint8, count=gct_len * 3, offset=pos
        ).reshape(gct_len, 3)
        pos += gct_len * 3
    transparent = -1
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF with no image data")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            while pos < len(payload) and payload[pos]:
                size = payload[pos]
                if label == 0xF9 and size >= 4 and payload[pos + 1] & 0x01:
                    transparent = payload[pos + 4]
                pos += size + 1
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            lct_len = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload, np.uint8, count=lct_len * 3, offset=pos
            ).reshape(lct_len, 3)
            pos += lct_len * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image block")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code_size}")
        parts = []
        while pos < len(payload) and payload[pos]:
            size = payload[pos]
            parts.append(payload[pos + 1 : pos + 1 + size])
            pos += size + 1
        idx = np.frombuffer(
            _gif_lzw_decode(b"".join(parts), min_code_size, fw * fh), np.uint8
        ).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n = len(range(start, fh, step))
                rows[start::step] = idx[src : src + n]
                src += n
            idx = rows
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index out of palette range")
        # composite the frame onto the logical screen: background color
        # where the screen is uncovered or the pixel is GCE-transparent
        bg = pal[bg_index] if (global_pal is not None and bg_index < len(pal)) \
            else np.zeros(3, np.uint8)
        screen = np.broadcast_to(bg, (sh, sw, 3)).copy()
        y1, x1 = min(top + fh, sh), min(left + fw, sw)
        frame = pal[idx][: y1 - top, : x1 - left]
        if transparent >= 0:
            keep = (idx[: y1 - top, : x1 - left] != transparent)[:, :, None]
            screen[top:y1, left:x1] = np.where(keep, frame, screen[top:y1, left:x1])
        else:
            screen[top:y1, left:x1] = frame
        return sw, sh, 3, screen.tobytes()
    raise ValueError("GIF with no image data")


def decode_image_pixels(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """bytes → (width, height, channels, row-major pixel bytes) for the
    four formats with full clean-room pixel decoders (PNG, BMP, GIF,
    JPEG baseline+progressive); None for probe-only formats (WebP/ICO/
    SVG), streams the decoders reject, and opaque payloads. The shared
    entry point for every pixel consumer (feature extraction,
    perceptual hashing, resizing) so format dispatch lives in one
    place."""
    try:
        if payload[:2] == b"\xff\xd8":
            from crawl4ai_spark.operators.jpeg import jpeg_decode

            return jpeg_decode(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return gif_decode(payload)
        if payload[:8] == _PNG_MAGIC:
            return png_decode(payload)
        if payload[:2] == b"BM":
            return bmp_decode(payload)
    except ValueError:
        return None
    return None


def image_feature_decoder(payload: bytes, meta: dict) -> list[float]:
    """Real image decode → 16-dim feature vector
    ``[w, h, channels, mean_ch0..3, std_lum, 8-bin lum histogram]``.

    PNG (stdlib zlib), 24-bit BMP, JPEG (operators/jpeg.py — baseline AND
    progressive), and GIF (LZW, interlace, transparency compositing)
    decode pixels for real; streams those decoders reject (arithmetic
    JPEG, truncated LZW) and formats with header-only support — WebP
    (VP8/VP8L/VP8X), ICO directories, SVG (vector) — get a real
    dimension probe with payload-byte statistics in the pixel slots
    (``[w, h, c, byte_mean, 0, 0, 0, byte_std, 8-bin byte histogram]``);
    everything else falls back to the deterministic byte-histogram
    stand-in so the pipeline keeps its poison-tolerance contract.
    """
    import numpy as np

    if payload[:2] == b"\xff\xd8":
        try:
            from crawl4ai_spark.operators.jpeg import jpeg_decode

            w, h, c, pix = jpeg_decode(payload)
        except ValueError:
            w, h, c = jpeg_probe(payload)
            pix = None
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            w, h, c, pix = gif_decode(payload)
        except ValueError:
            w, h, c = gif_probe(payload)
            pix = None
    elif payload[:8] == _PNG_MAGIC:
        w, h, c, pix = png_decode(payload)
    elif payload[:2] == b"BM":
        w, h, c, pix = bmp_decode(payload)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        try:
            w, h, c = webp_probe(payload)
            pix = None
        except ValueError:
            return fake_histogram_decoder(payload, meta)
    elif payload[:4] == b"\x00\x00\x01\x00":
        try:
            w, h, c = ico_probe(payload)
            pix = None
        except ValueError:
            return fake_histogram_decoder(payload, meta)
    elif b"<svg" in payload[:256].lower():
        try:
            w, h, c = svg_probe(payload)
            pix = None
        except ValueError:
            return fake_histogram_decoder(payload, meta)
    else:
        return fake_histogram_decoder(payload, meta)
    if pix is None:  # dimension probe only: byte-level stats
        arr = np.frombuffer(payload, dtype=np.uint8).astype("float64")
        hist = np.bincount(arr.astype(np.uint8) >> 5, minlength=8).astype("float64")
        hist = hist / hist.sum()
        feats = [float(w), float(h), float(c), float(arr.mean()), 0.0, 0.0, 0.0,
                 float(arr.std()), *hist.tolist()]
        return [float(np.float32(v)) for v in feats]
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


def wav_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """PCM WAV decode via stdlib ``wave`` → (sample_rate, channels,
    sample_width_bytes, raw interleaved frames). Raises ValueError on
    non-PCM / malformed input."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            return (
                w.getframerate(),
                w.getnchannels(),
                w.getsampwidth(),
                w.readframes(w.getnframes()),
            )
    except wave.Error as exc:
        raise ValueError(f"bad WAV: {exc}") from exc


def audio_feature_decoder(payload: bytes, meta: dict) -> list[float]:
    """Real PCM WAV decode → 16-dim feature vector ``[sample_rate,
    channels, n_frames, duration_ms, mean, rms, zero_crossing_rate, peak,
    8-bin |amplitude| histogram]`` (samples normalized to [-1, 1]).

    MP3 (ID3v2-aware frame-header parse) and Ogg Vorbis (identification
    header + final granule position) get a real metadata probe —
    ``[sample_rate, channels, 0, duration_ms, byte_mean, 0, 0, byte_std,
    8-bin byte histogram]`` — since their sample decode is a codec, not
    plumbing. Everything else falls back to the byte-histogram stand-in.
    """
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        probe = None
        try:
            if payload[:3] == b"ID3" or (
                len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
            ):
                probe = mp3_probe(payload)
            elif payload[:4] == b"OggS":
                probe = ogg_vorbis_probe(payload)
        except (ValueError, IndexError, struct.error):
            probe = None
        if probe is None:
            return fake_histogram_decoder(payload, meta)
        rate, ch, dur_ms = probe
        arr = np.frombuffer(payload, dtype=np.uint8).astype("float64")
        hist = np.bincount(arr.astype(np.uint8) >> 5, minlength=8).astype("float64")
        hist = hist / hist.sum()
        feats = [float(rate), float(ch), 0.0, float(dur_ms),
                 float(arr.mean()), 0.0, 0.0, float(arr.std()), *hist.tolist()]
        return [float(np.float32(v)) for v in feats]
    rate, ch, sw, frames = wav_decode(payload)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {sw}")
    arr = np.frombuffer(frames, dtype=dtype).astype("float64")
    if sw == 1:
        arr = arr - 128.0
    arr = arr / float(2 ** (8 * sw - 1))
    n_frames = arr.size // max(ch, 1)
    if arr.size == 0:
        feats = [float(rate), float(ch), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] + [0.0] * 8
        return [float(np.float32(v)) for v in feats]
    ch0 = arr[::ch]
    zcr = float(np.mean(np.sign(ch0[1:]) != np.sign(ch0[:-1]))) if ch0.size > 1 else 0.0
    hist = np.bincount(
        np.clip(np.abs(arr) * 8.0, 0, 7).astype(np.int64), minlength=8
    ).astype("float64")
    hist = hist / hist.sum()
    feats = [
        float(rate), float(ch), float(n_frames),
        1000.0 * n_frames / rate,
        float(arr.mean()), float(np.sqrt(np.mean(arr**2))), zcr,
        float(np.abs(arr).max()),
        *hist.tolist(),
    ]
    return [float(np.float32(v)) for v in feats]


# MPEG-1/2/2.5 Layer III bitrate (kbps) and sample-rate tables, indexed
# [version_group][bitrate_index] / [version][samplerate_index] per the
# ISO 11172-3 / 13818-3 frame-header layout.
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def mp3_probe(payload: bytes) -> tuple[int, int, float]:
    """MP3 header probe → (sample_rate, channels, duration_ms estimate).
    Skips an ID3v2 tag (syncsafe size), locates the first Layer-III frame
    sync, reads the version/bitrate/samplerate/mode fields, and estimates
    duration from the audio byte count at that frame's bitrate — exact
    for CBR, the standard first-frame estimate for VBR. Decode (MDCT
    synthesis) is out of scope; callers use byte-stat features."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        pos = 10 + (
            (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        )
    end = min(len(payload) - 3, pos + 4096)
    while pos < end:
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
            version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 0x3
            br_idx = (b2 >> 4) & 0xF
            sr_idx = (b2 >> 2) & 0x3
            if version != 1 and layer == 1 and 0 < br_idx < 15 and sr_idx < 3:
                rate = _MP3_RATES[version][sr_idx]
                kbps = (_MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2)[br_idx]
                channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
                duration_ms = (len(payload) - pos) * 8.0 / kbps
                return rate, channels, duration_ms
        pos += 1
    raise ValueError("no MP3 frame sync found")


def ogg_vorbis_probe(payload: bytes) -> tuple[int, int, float]:
    """Ogg Vorbis probe → (sample_rate, channels, duration_ms). Reads the
    identification header on the first page and the LAST page's granule
    position (total PCM samples) for the exact stream duration."""
    import struct

    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    ident = payload.find(b"\x01vorbis", 0, 512)
    if ident < 0:
        raise ValueError("no Vorbis identification header")
    channels = payload[ident + 11]
    (rate,) = struct.unpack("<I", payload[ident + 12 : ident + 16])
    if rate == 0 or channels == 0:
        raise ValueError("bad Vorbis identification header")
    last = payload.rfind(b"OggS")
    (granule,) = struct.unpack("<q", payload[last + 6 : last + 14])
    duration_ms = max(granule, 0) * 1000.0 / rate
    return rate, channels, duration_ms


_Y4M_MAGIC = b"YUV4MPEG2"

_Y4M_FRAME_FACTOR = {  # luma+chroma bytes per frame as a multiple of w*h (×2)
    "420": 3, "420jpeg": 3, "420mpeg2": 3, "420paldv": 3,
    "422": 4, "444": 6, "mono": 2,
}


def y4m_decode(payload: bytes, frame_stride: int = 1) -> tuple[int, int, float, list[bytes]]:
    """YUV4MPEG2 (y4m — the standard uncompressed video interchange
    format) decode → (width, height, fps, sampled luma planes). Supports
    C420*/C422/C444/Cmono; every ``frame_stride``-th frame's luma plane
    is materialized (frame sampling without touching skipped frames'
    chroma — at 10⁹ frames the stride bounds the work)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a y4m stream")
    width = height = None
    fps = 0.0
    cspace = "420"
    for param in payload[len(_Y4M_MAGIC):nl].split():
        tag, val = chr(param[0]), param[1:].decode()
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = int(num) / int(den)
        elif tag == "C":
            cspace = val
    if not width or not height:
        raise ValueError("y4m without dimensions")
    factor = _Y4M_FRAME_FACTOR.get(cspace)
    if factor is None:
        raise ValueError(f"unsupported y4m colorspace C{cspace}")
    luma_bytes = width * height
    frame_bytes = luma_bytes * factor // 2
    lumas: list[bytes] = []
    pos, idx = nl + 1, 0
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad y4m frame header")
        data_off = fnl + 1
        if data_off + frame_bytes > len(payload):
            raise ValueError("truncated y4m frame")
        if idx % frame_stride == 0:
            lumas.append(payload[data_off : data_off + luma_bytes])
        pos = data_off + frame_bytes
        idx += 1
    return width, height, fps, lumas


def mp4_probe(payload: bytes) -> tuple[int, int, float]:
    """MP4/ISO-BMFF probe → (width, height, duration_ms). Walks the box
    tree to ``moov``: ``mvhd`` gives timescale+duration (version 0 and 1
    layouts), ``trak/tkhd`` gives the 16.16-fixed track dimensions (max
    across video tracks). Sample decode (H.264/AV1) is out of scope."""
    import struct

    def boxes(data: bytes, pos: int, end: int):
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            btype = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("bad MP4 box size")
            yield btype, pos + hdr, pos + size
            pos += size

    if payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    width = height = 0
    duration_ms = 0.0
    for btype, b0, b1 in boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, c0, c1 in boxes(payload, b0, b1):
            if ctype == b"mvhd":
                ver = payload[c0]
                if ver == 1:
                    (ts,) = struct.unpack(">I", payload[c0 + 20 : c0 + 24])
                    (dur,) = struct.unpack(">Q", payload[c0 + 24 : c0 + 32])
                else:
                    (ts,) = struct.unpack(">I", payload[c0 + 12 : c0 + 16])
                    (dur,) = struct.unpack(">I", payload[c0 + 16 : c0 + 20])
                if ts:
                    duration_ms = dur * 1000.0 / ts
            elif ctype == b"trak":
                for ttype, t0, t1 in boxes(payload, c0, c1):
                    if ttype == b"tkhd":
                        # width/height are the last 8 bytes, 16.16 fixed
                        w, h = struct.unpack(">II", payload[t1 - 8 : t1])
                        width = max(width, w >> 16)
                        height = max(height, h >> 16)
        break
    if width == 0 and height == 0 and duration_ms == 0.0:
        raise ValueError("MP4 without moov metadata")
    return width, height, duration_ms


def make_video_decoder(frame_stride: int = 2) -> Callable[[bytes, dict], list[float]]:
    """Real y4m video decode with frame sampling → 16-dim features
    ``[w, h, n_sampled, fps, stride, mean_luma, std_luma, luma_range,
    8-bin luma histogram]`` over every ``frame_stride``-th frame.

    MP4/ISO-BMFF containers get a real metadata probe — ``[w, h, 0,
    duration_ms, stride, byte_mean, 0, byte_std, 8-bin byte histogram]``
    — since sample decode is an H.264/AV1 codec, not plumbing. Other
    payloads fall back to the byte-histogram stand-in."""

    def decode(payload: bytes, meta: dict) -> list[float]:
        import struct

        import numpy as np

        if not payload.startswith(_Y4M_MAGIC):
            if payload[4:8] == b"ftyp":
                try:
                    w, h, dur_ms = mp4_probe(payload)
                except (ValueError, IndexError, struct.error):
                    return fake_histogram_decoder(payload, meta)
                arr = np.frombuffer(payload, dtype=np.uint8).astype("float64")
                hist = np.bincount(
                    arr.astype(np.uint8) >> 5, minlength=8
                ).astype("float64")
                hist = hist / hist.sum()
                feats = [float(w), float(h), 0.0, float(dur_ms),
                         float(frame_stride), float(arr.mean()), 0.0,
                         float(arr.std()), *hist.tolist()]
                return [float(np.float32(v)) for v in feats]
            return fake_histogram_decoder(payload, meta)
        w, h, fps, lumas = y4m_decode(payload, frame_stride=frame_stride)
        if not lumas:
            feats = [float(w), float(h), 0.0, fps, float(frame_stride)] + [0.0] * 11
            return [float(np.float32(v)) for v in feats]
        arr = np.frombuffer(b"".join(lumas), dtype=np.uint8).astype("float64")
        hist = np.bincount(arr.astype(np.uint8) >> 5, minlength=8).astype("float64")
        hist = hist / hist.sum()
        feats = [
            float(w), float(h), float(len(lumas)), fps, float(frame_stride),
            float(arr.mean()), float(arr.std()), float(arr.max() - arr.min()),
            *hist.tolist(),
        ]
        return [float(np.float32(v)) for v in feats]

    return decode


def default_registry() -> DecoderRegistry:
    """All three kinds get REAL pure-stdlib decoders with graceful
    fallback: image → PNG/BMP pixel decode + JPEG/GIF dimension probe;
    audio → PCM WAV (stdlib ``wave``); video → y4m with stride-2 frame
    sampling. Unrecognized payloads take the deterministic byte-histogram
    stand-in; a deployment swaps in PIL/ffmpeg/torchaudio via
    ``register`` without touching the pipeline."""
    reg = DecoderRegistry()
    reg.register("image", image_feature_decoder)
    reg.register("audio", audio_feature_decoder)
    reg.register("video", make_video_decoder(frame_stride=2))
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


def _png_pack_row(samples: list[int], depth: int) -> bytes:
    """Pack one scanline's raw samples at the given bit depth (MSB-first
    for sub-byte, big-endian sample<<8 for 16-bit)."""
    if depth == 8:
        return bytes(samples)
    if depth == 16:
        out = bytearray()
        for v in samples:
            out += bytes((v, 0))  # high byte carries the 8-bit value
        return bytes(out)
    out = bytearray((len(samples) * depth + 7) // 8)
    for i, v in enumerate(samples):
        shift = 8 - depth * (i % (8 // depth) + 1)
        out[i * depth // 8] |= (v & ((1 << depth) - 1)) << shift
    return bytes(out)


def synth_png(
    width: int,
    height: int,
    seed: int = 0,
    *,
    interlace: bool = False,
    depth: int = 8,
    color: str = "rgb",
    trns: bool = False,
) -> bytes:
    """Deterministic PNG (filter 0 rows, stdlib zlib) — the test/fixture
    mirror of ``png_decode``. ``color``: "rgb" (type 2; depth 8/16, the
    16-bit high byte carries the same pixel values as the 8-bit encode so
    both decode identically), "gray" (type 0; depth 1/2/4/8), "palette"
    (type 3; depth 4/8, 16-entry deterministic palette, optional short
    tRNS). ``interlace`` emits the Adam7 pass sequence over the same
    logical pixel grid."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    if color == "rgb":
        ctype_n, channels = 2, 3
        px = lambda x, y: [  # noqa: E731
            ((3 * x + c) * 7 + y * 13 + seed) % 256 for c in range(3)
        ]
    elif color == "gray":
        ctype_n, channels = 0, 1
        px = lambda x, y: [(x * 7 + y * 13 + seed) % (1 << depth)]  # noqa: E731
    elif color == "palette":
        ctype_n, channels = 3, 1
        px = lambda x, y: [(x * 7 + y * 13 + seed) % 16]  # noqa: E731
    else:
        raise ValueError(f"unknown synth_png color {color}")

    def pass_bytes(x0: int, y0: int, dx: int, dy: int) -> bytes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            return b""
        rows = []
        for j in range(ph):
            samples: list[int] = []
            for i in range(pw):
                samples.extend(px(x0 + i * dx, y0 + j * dy))
            rows.append(b"\x00" + _png_pack_row(samples, depth))
        return b"".join(rows)

    if interlace:
        raw = b"".join(pass_bytes(*p) for p in _ADAM7)
    else:
        raw = pass_bytes(0, 0, 1, 1)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype_n, 0, 0, int(interlace))
    parts = [_PNG_MAGIC, chunk(b"IHDR", ihdr)]
    if color == "palette":
        pal = bytes(
            b for j in range(16) for b in (j * 11 % 256, j * 59 % 256, j * 83 % 256)
        )
        parts.append(chunk(b"PLTE", pal))
        if trns:
            # deliberately SHORTER than the palette: indices past the end
            # must decode as alpha 255
            parts.append(chunk(b"tRNS", bytes((j * 29) % 256 for j in range(8))))
    parts += [chunk(b"IDAT", zlib.compress(raw)), chunk(b"IEND", b"")]
    return b"".join(parts)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW compression (LSB-first), emitting a clear
    code up front and again whenever the dictionary hits the 4096-entry
    spec cap. Test/fixture mirror of ``_gif_lzw_decode``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_pattern_indices(width: int, height: int, seed: int = 0) -> bytes:
    """The closed-form 8-color palette-index pattern synth_gif encodes —
    exported so tests/oracles can recompute expected pixels from (w, h,
    seed) alone."""
    return bytes(
        (x * 3 + y * 5 + seed) % 8 for y in range(height) for x in range(width)
    )


def synth_gif(
    width: int,
    height: int,
    seed: int = 0,
    interlace: bool = False,
    local_palette: bool = False,
    transparent: bool = False,
) -> bytes:
    """Deterministic GIF89a (8-color palette, real LZW compression) whose
    pixels follow ``gif_pattern_indices``. ``interlace`` emits the 4-pass
    row order; ``local_palette`` moves the table onto the image
    descriptor; ``transparent`` marks index 7 transparent via a GCE (the
    decoder composites those pixels to the background color, index 0)."""
    import struct

    pal = b"".join(
        bytes(((i * 40 + 15) % 256, (i * 80 + 7) % 256, (i * 25 + 90) % 256))
        for i in range(8)
    )
    head = b"GIF89a" + struct.pack(
        "<HHBBB", width, height, 0x00 if local_palette else 0xF2, 0, 0
    )
    if not local_palette:
        head += pal
    gce = b""
    if transparent:
        gce = b"\x21\xf9\x04\x01\x00\x00\x07\x00"
    iflags = (0x80 | 0x02 if local_palette else 0x00) | (0x40 if interlace else 0x00)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, iflags)
    if local_palette:
        desc += pal
    idx = gif_pattern_indices(width, height, seed)
    if interlace:
        rows = [idx[y * width : (y + 1) * width] for y in range(height)]
        idx = b"".join(
            rows[y]
            for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, height, step)
        )
    lzw = _gif_lzw_encode(idx, 3)
    blocks = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return head + gce + desc + b"\x03" + blocks + b"\x00" + b"\x3b"


def synth_wav(n_samples: int, rate: int = 8000, seed: int = 0) -> bytes:
    """Deterministic 16-bit mono PCM WAV (stdlib ``wave``)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", ((i * i * 31 + seed * 97) % 20000) - 10000)
                for i in range(n_samples)
            )
        )
    return buf.getvalue()


def synth_y4m(width: int, height: int, n_frames: int, seed: int = 0) -> bytes:
    """Deterministic C420 YUV4MPEG2 clip (width/height even)."""
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    frames = []
    for f in range(n_frames):
        luma = bytes((x + f * 17 + seed) % 256 for x in range(width * height))
        chroma = bytes((width * height) // 2)
        frames.append(b"FRAME\n" + luma + chroma)
    return head + b"".join(frames)


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (binary payloads + typed meta).
    Even ids carry REAL payloads (PNG / PCM WAV / y4m) so the driver
    query exercises the real codecs; odd ids keep opaque bytes to pin
    the fallback/poison-tolerance path."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if i % 2 == 0:
            if kind == "image":
                if i % 12 == 0:
                    # same closed-form dims for every PNG variant (the
                    # oracle derives width/height from the id alone);
                    # the variants pin the decoder's interlace / 16-bit /
                    # palette+tRNS branches end-to-end: 0,48 plain; 12,60
                    # Adam7; 24 16-bit; 36 palette
                    variant = i % 48
                    payload = synth_png(
                        8 + i % 4,
                        6 + i % 3,
                        seed=i,
                        interlace=variant == 12,
                        depth=16 if variant == 24 else 8,
                        color="palette" if variant == 36 else "rgb",
                        trns=variant == 36,
                    )
                    mime = "image/png"
                elif i % 36 == 18:  # GIF ids (18 interlaced at 54): real
                    # LZW pixel path with closed-form dims for the oracle
                    payload = synth_gif(
                        10 + i % 7, 7 + i % 5, seed=i, interlace=i % 72 == 54
                    )
                    mime = "image/gif"
                else:  # remaining even image ids are JPEG; every other
                    # JPEG id is a progressive (SOF2) stream with the same
                    # 16×16 closed-form pixels, pinning the multi-scan path
                    from crawl4ai_spark.operators.jpeg import synth_jpeg

                    payload = synth_jpeg(16, 16, seed=i, progressive=i % 24 == 6)
                    mime = "image/jpeg"
            elif kind == "audio":
                payload = synth_wav(160 + (i % 5) * 40, seed=i)
                mime = "audio/wav"
            else:
                payload = synth_y4m(4 + 2 * (i % 3), 4, 3 + i % 4, seed=i)
                mime = "video/x-y4m"
        else:
            payload = bytes((i * 37 + j * 11) % 256 for j in range(128 + (i % 5) * 64))
            mime = f"{kind}/x-fake"
        rows.append(
            (i, kind, payload, {"mime": mime, "width": 16 + i, "height": 9 + i, "duration_ms": 1000 + i})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
