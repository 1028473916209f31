"""Baseline JPEG pixel decoder — pure stdlib + numpy, clean-room from the
public ITU-T T.81 spec.

Retires the probe-only status of JPEG in the image feature path
(reference surface: crawl4ai scores/filter images by real dimensions,
media handling in ``content_scraping_strategy.py``; this environment has
no PIL/libjpeg, so the common web subset is decoded here directly):

- marker parse: DQT (8/16-bit tables), SOF0/SOF1, DHT, DRI, SOS
- Huffman entropy decode: DC category + diff, AC run/size with ZRL/EOB,
  byte unstuffing (FF00) and restart-marker resync
- dequantize + de-zigzag, 8×8 inverse DCT as two matrix products with
  the orthonormal DCT-II basis (numpy, exact to float64)
- chroma upsample (sample replication) for 4:2:0 / 4:2:2 / 4:1:1 grids,
  JFIF YCbCr→RGB, level shift + clip

Out of scope → ValueError (callers treat as decode_ok=false, never a job
failure): progressive (SOF2), arithmetic coding, 12-bit precision,
hierarchical, fractional sampling ratios. Per-pixel work runs inside the
``mapInPandas`` media stage, one payload per call; a deployment that
needs libjpeg-turbo throughput registers it via DecoderRegistry without
touching the pipeline (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 figure A.6): diagonal walk, odd anti-diagonals
# top-right → bottom-left, even ones reversed; _ZZ_ROWS[k]/_ZZ_COLS[k] is
# the (row, col) of the k-th coefficient in scan order
def _zigzag() -> tuple[np.ndarray, np.ndarray]:
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(s + 1) if i < 8 and 0 <= s - i < 8]
        if s % 2 == 0:
            cells = cells[::-1]
        order.extend(cells)
    rows, cols = zip(*order)
    return np.array(rows), np.array(cols)


_ZZ_ROWS, _ZZ_COLS = _zigzag()
# orthonormal DCT-II basis: spatial = M.T @ coeffs @ M reproduces T.81's
# 1/4·C(u)C(v) double sum exactly ((1/2)C(0)=sqrt(1/8), (1/2)C(u>0)=1/2)
_IDCT_M = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _MarkerHit(Exception):
    """Entropy reader ran into a real marker (RSTn / EOI / next segment)."""

    def __init__(self, marker: int) -> None:
        super().__init__(f"marker 0x{marker:02x}")
        self.marker = marker


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 annex C: (bit-length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    unstuffing; raises _MarkerHit when a real marker interrupts."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                raise ValueError("truncated JPEG entropy data")
            nxt = d[p + 1]
            if nxt != 0x00:
                raise _MarkerHit(nxt)
            self.pos = p + 2
        else:
            self.pos = p + 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Discard partial bits, consume the RSTn marker, resync."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes
        if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + (expected & 7):
            raise ValueError("missing/unexpected JPEG restart marker")
        self.pos = p + 2


def _extend(v: int, n: int) -> int:
    """T.81 F.12 sign extension of an n-bit magnitude."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_sym(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _decode_block(
    r: _BitReader,
    dc: dict[tuple[int, int], int],
    ac: dict[tuple[int, int], int],
    pred: int,
    qt: np.ndarray,
) -> tuple[np.ndarray, int]:
    """One 8×8 block: returns (spatial block float64, new DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    t = _decode_sym(r, dc)
    pred += _extend(r.receive(t), t)
    zz[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = _decode_sym(r, ac)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _extend(r.receive(size), size) * qt[k]
        k += 1
    coeffs = np.zeros((8, 8), dtype=np.float64)
    coeffs[_ZZ_ROWS, _ZZ_COLS] = zz
    return _IDCT_M.T @ coeffs @ _IDCT_M, pred


def jpeg_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG decode → (width, height, channels, raw interleaved
    8-bit pixels) — the same contract as ``multimodal.png_decode``.
    Channels: 1 (grayscale) or 3 (RGB after JFIF YCbCr conversion).

    Contract: every malformed/out-of-scope stream raises ``ValueError``
    — callers (``multimodal.image_feature_decoder``) catch exactly that
    to fall back to the dimension probe, so low-level slip-ups from a
    lying segment length (IndexError / struct.error / KeyError) are
    normalized here instead of escaping as feature-less decode failures.
    """
    try:
        return _jpeg_decode_impl(payload)
    except (IndexError, KeyError, ZeroDivisionError, struct.error) as exc:
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _jpeg_decode_impl(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (w, h, [(comp_id, h_i, v_i, tq)])
    dri = 0
    pos = 2
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    qtables[tq] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    i += 64
                else:
                    qtables[tq] = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.float64)
                    i += 128
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both huffman sequential)
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG process (progressive/arithmetic)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                symbols = seg[i + 17 : i + 17 + total]
                htables[(tc, th)] = _build_huffman(counts, symbols)
                i += 17 + total
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_idx, dc_table, ac_table)
            comp_ids = [c[0] for c in frame[2]]
            for c in range(ns):
                cid, tda = seg[1 + 2 * c : 3 + 2 * c]
                scan.append((comp_ids.index(cid), tda >> 4, tda & 0x0F))
            if len(scan) != len(frame[2]):
                raise ValueError("non-interleaved JPEG scan unsupported")
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtables, htables, dri
            )
        pos += seglen
    raise ValueError("JPEG without SOS scan")


def _decode_scan(payload, data_pos, frame, scan, qtables, htables, dri):
    width, height, comps = frame
    if not width or not height:
        raise ValueError("JPEG without dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or any(
        hmax % c[1] or vmax % c[2] for c in comps
    ):
        raise ValueError("fractional JPEG sampling ratios unsupported")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for _, hi, vi, _tq in comps:
        planes.append(np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64))
    r = _BitReader(payload, data_pos)
    preds = [0] * len(comps)
    rst_idx = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            r.restart(rst_idx)
            rst_idx = (rst_idx + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        try:
            for ci, td, ta in scan:
                _, hi, vi, tq = comps[ci]
                qt = qtables.get(tq)
                dc = htables.get((0, td))
                ac = htables.get((1, ta))
                if qt is None or dc is None or ac is None:
                    raise ValueError("JPEG scan references missing table")
                for by in range(vi):
                    for bx in range(hi):
                        block, preds[ci] = _decode_block(r, dc, ac, preds[ci], qt)
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
        except _MarkerHit as hit:
            raise ValueError(
                f"JPEG entropy data ended early at marker 0x{hit.marker:02x}"
            ) from hit
    out_planes = []
    for (cid, hi, vi, _tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(up[:height, :width] + 128.0)
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, gray.tobytes()
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    rgb = np.empty((height, width, 3), dtype=np.float64)
    rgb[:, :, 0] = y + 1.402 * (cr - 128.0)
    rgb[:, :, 1] = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    rgb[:, :, 2] = y + 1.772 * (cb - 128.0)
    return width, height, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


# ── deterministic fixture encoder ────────────────────────────────────────


def synth_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic flat-block baseline JPEG (4:4:4, all-1 quant tables,
    DC-only entropy data, neutral chroma): luma of 8×8 block (r, c) is
    ``(seed * 29) % 200 + 20 + 10 * ((r % 2) * 2 + c % 2)``, so decoded
    pixels are exactly that value (chroma 128 ⇒ RGB == luma). The JPEG
    analog of ``multimodal.synth_png`` — real marker stream, real Huffman
    entropy data, closed-form expected pixels. width/height must be
    multiples of 8."""
    if width % 8 or height % 8:
        raise ValueError("synth_jpeg needs multiple-of-8 dimensions")
    # canonical tables: DC categories 0..11 at length 8; AC: EOB alone at
    # length 2 (code 00)
    dc_bits = [0] * 7 + [12] + [0] * 8
    dc_vals = bytes(range(12))
    ac_bits = [0, 1] + [0] * 14
    ac_vals = b"\x00"

    def codes(bits, vals):
        out, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out

    dc_codes, ac_codes = codes(dc_bits, dc_vals), codes(ac_bits, ac_vals)

    bitbuf: list[int] = []

    def put(value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            bitbuf.append((value >> i) & 1)

    def encode_dc_block(level: int, pred: int) -> int:
        coeff = 8 * (level - 128)
        diff = coeff - pred
        t = abs(diff).bit_length()
        length, code = dc_codes[t]
        put(code, length)
        if t:
            put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        length, code = ac_codes[0x00]  # EOB
        put(code, length)
        return coeff

    base = (seed * 29) % 200 + 20
    preds = [0, 0, 0]
    for r in range(height // 8):
        for c in range(width // 8):
            luma = base + 10 * ((r % 2) * 2 + c % 2)
            for ci, level in enumerate((luma, 128, 128)):
                preds[ci] = encode_dc_block(level, preds[ci])
    # pad with 1-bits, byte-stuff 0xFF
    while len(bitbuf) % 8:
        bitbuf.append(1)
    entropy = bytearray()
    for i in range(0, len(bitbuf), 8):
        b = 0
        for bit in bitbuf[i : i + 8]:
            b = (b << 1) | bit
        entropy.append(b)
        if b == 0xFF:
            entropy.append(0x00)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = b"\x08" + struct.pack(">HH", height, width) + b"\x03"
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        b"\x00" + bytes(dc_bits) + dc_vals + b"\x10" + bytes(ac_bits) + ac_vals
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes(entropy) + b"\xff\xd9"
    return bytes(out)
