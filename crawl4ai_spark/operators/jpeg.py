"""Baseline JPEG pixel decoder — pure stdlib + numpy, clean-room from the
public ITU-T T.81 spec.

Retires the probe-only status of JPEG in the image feature path
(reference surface: crawl4ai scores/filter images by real dimensions,
media handling in ``content_scraping_strategy.py``; this environment has
no PIL/libjpeg, so the common web subset is decoded here directly):

- marker parse: DQT (8/16-bit tables), SOF0/SOF1/SOF2, DHT, DRI, SOS
- Huffman entropy decode: DC category + diff, AC run/size with ZRL/EOB,
  byte unstuffing (FF00) and restart-marker resync
- progressive mode (SOF2, T.81 annex G): multi-scan coefficient
  accumulation — spectral selection (Ss..Se bands), successive
  approximation (DC first/refine by bit plane, AC first with EOB runs,
  AC refinement with correction bits), interleaved DC scans and
  non-interleaved single-component AC scans, restart resync per scan
- dequantize + de-zigzag, 8×8 inverse DCT as two matrix products with
  the orthonormal DCT-II basis (numpy, exact to float64)
- chroma upsample (sample replication) for 4:2:0 / 4:2:2 / 4:1:1 grids,
  JFIF YCbCr→RGB, level shift + clip

Out of scope → ValueError (callers treat as decode_ok=false, never a job
failure): arithmetic coding, 12-bit precision,
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
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] in (0xFF, 0x00):
            # 0xFF: fill byte; 0x00: a stuffed data byte from 1-bit padding
            p += 1 if d[p + 1] == 0xFF else 2
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
    progressive = False
    coefs: list[np.ndarray] | None = None  # per-comp (by, bx, 64) zigzag ints
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
        elif marker in (0xC0, 0xC1, 0xC2):  # huffman sequential / progressive
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
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG process (lossless/arithmetic)")
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
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                pos = _progressive_scan(
                    payload, pos + seglen, frame, scan, htables, dri,
                    ss, se, ahal >> 4, ahal & 0x0F, coefs,
                )
                continue
            if len(scan) != len(frame[2]):
                raise ValueError("non-interleaved JPEG scan unsupported")
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtables, htables, dri
            )
        pos += seglen
    if progressive and coefs is not None:
        return _finish_progressive(frame, coefs, qtables)
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
    return _planes_to_pixels(planes, comps, hmax, vmax, width, height)


def _planes_to_pixels(planes, comps, hmax, vmax, width, height):
    """Upsample + level shift + (grayscale | JFIF YCbCr→RGB) → pixel bytes."""
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


# ── progressive mode (T.81 annex G) ──────────────────────────────────────
#
# Coefficients accumulate across scans in ZIGZAG order (index k == scan
# position), per component, one int32[64] per 8×8 block; dequantize +
# de-zigzag + IDCT happen once at EOI. Successive approximation operates
# on two's-complement ints, so DC refinement is a plain `|= 1 << Al` and
# AC refinement grows magnitude by ±(1 << Al) — both exact for negatives.


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _frame_grid(frame) -> tuple[int, int, int, int]:
    """(hmax, vmax, mcux, mcuy) with the shared sampling validation."""
    width, height, comps = frame
    if not width or not height:
        raise ValueError("JPEG without dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or any(hmax % c[1] or vmax % c[2] for c in comps):
        raise ValueError("fractional JPEG sampling ratios unsupported")
    return hmax, vmax, _ceil_div(width, 8 * hmax), _ceil_div(height, 8 * vmax)


def _alloc_coefs(frame) -> list[np.ndarray]:
    """Per-component (block_rows, block_cols, 64) zigzag coefficient
    arrays sized to the full interleaved-MCU grid (⊇ the non-interleaved
    grid, so both scan kinds index the same storage)."""
    _hmax, _vmax, mcux, mcuy = _frame_grid(frame)
    return [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        for (_cid, hi, vi, _tq) in frame[2]
    ]


def _ac_first(r, ac_tab, blk, ss, se, al, eobrun) -> int:
    """First AC scan for one block's Ss..Se band (G.1.2.2): run/size with
    EOBn run-length codes; new coefficients enter at magnitude << Al.
    Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_sym(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run < 15:  # EOBn: run of (1<<run)+ext blocks ending here
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.receive(run)
                return eobrun
            k += 16  # ZRL
        else:
            k += run
            if k > se:
                raise ValueError("JPEG AC run past spectral band")
            blk[k] = _extend(r.receive(size), size) << al
            k += 1
    return 0


def _ac_refine(r, ac_tab, blk, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (G.1.2.3): correction bits for
    already-nonzero coefficients; runs count zero-HISTORY positions only;
    newly nonzero coefficients arrive as ±(1 << Al). Returns the
    remaining EOB run."""
    p1 = 1 << al
    m1 = -p1

    def corr_walk(k: int) -> None:
        """Correction bits for every nonzero-history position k..Se."""
        while k <= se:
            c = int(blk[k])
            if c != 0 and r.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c > 0 else m1)
            k += 1

    if eobrun > 0:  # block fully covered by a previous block's EOB run
        corr_walk(ss)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_sym(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        val = 0
        if size == 0:
            if run < 15:
                # EOBn: the returned run covers SUBSEQUENT blocks; this
                # block's remaining band still carries its correction bits
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.receive(run)
                corr_walk(k)
                return eobrun
            # ZRL: pass 16 zero-history positions
        else:
            if size != 1:
                raise ValueError("JPEG AC refinement size must be 1")
            val = p1 if r.read_bit() else m1
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if r.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else m1)
            else:
                if run == 0:
                    if val != 0:
                        blk[k] = val
                    k += 1
                    break
                run -= 1
            k += 1
        else:
            if val != 0:
                raise ValueError("JPEG AC refinement value past band")
    return 0


def _progressive_scan(
    payload, data_pos, frame, scan, htables, dri, ss, se, ah, al, coefs
) -> int:
    """Decode one progressive scan into ``coefs``; returns the payload
    position of the next marker (resync past the entropy data)."""
    width, height, comps = frame
    hmax, vmax, mcux, mcuy = _frame_grid(frame)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if not is_dc and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if se > 63 or ss > se:
        raise ValueError("bad JPEG spectral band")

    r = _BitReader(payload, data_pos)
    preds = [0] * len(comps)
    eobrun = 0
    rst_idx = 0

    def table(tc: int, th: int):
        t = htables.get((tc, th))
        if t is None:
            raise ValueError("JPEG scan references missing huffman table")
        return t

    def dc_block(blk, ci: int, td: int) -> None:
        if ah == 0:
            t = _decode_sym(r, table(0, td))
            preds[ci] += _extend(r.receive(t), t)
            blk[0] = preds[ci] << al
        elif r.read_bit():
            blk[0] |= 1 << al

    try:
        if len(scan) > 1:  # interleaved MCU order (DC scans only)
            for m in range(mcux * mcuy):
                if dri and m and m % dri == 0:
                    r.restart(rst_idx)
                    rst_idx = (rst_idx + 1) & 7
                    preds = [0] * len(comps)
                my, mx = divmod(m, mcux)
                for ci, td, _ta in scan:
                    _cid, hi, vi, _tq = comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            dc_block(coefs[ci][my * vi + by, mx * hi + bx], ci, td)
        else:  # non-interleaved: the component's own block grid, row-major
            ci, td, ta = scan[0]
            _cid, hi, vi, _tq = comps[ci]
            bw = _ceil_div(_ceil_div(width * hi, hmax), 8)
            bh = _ceil_div(_ceil_div(height * vi, vmax), 8)
            for m in range(bw * bh):
                if dri and m and m % dri == 0:
                    r.restart(rst_idx)
                    rst_idx = (rst_idx + 1) & 7
                    preds = [0] * len(comps)
                    eobrun = 0
                by, bx = divmod(m, bw)
                blk = coefs[ci][by, bx]
                if is_dc:
                    dc_block(blk, ci, td)
                elif ah == 0:
                    eobrun = _ac_first(r, table(1, ta), blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(r, table(1, ta), blk, ss, se, al, eobrun)
    except _MarkerHit as hit:
        raise ValueError(
            f"JPEG entropy data ended early at marker 0x{hit.marker:02x}"
        ) from hit

    # resync: skip pad bits / fill bytes / stray RSTs to the next marker
    p = r.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF:
            nxt = payload[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            if nxt == 0xFF:
                p += 1
                continue
            return p
        p += 1
    return n


def _finish_progressive(frame, coefs, qtables):
    """Dequantize + de-zigzag + IDCT every accumulated block (vectorized
    einsum over the whole block grid) and assemble pixels."""
    width, height, comps = frame
    hmax, vmax, _mcux, _mcuy = _frame_grid(frame)
    planes = []
    for (_cid, _hi, _vi, tq), carr in zip(comps, coefs):
        qt = qtables.get(tq)
        if qt is None:
            raise ValueError("JPEG component references missing quant table")
        deq = carr.astype(np.float64) * qt  # broadcast over zigzag index
        blocks = np.zeros((carr.shape[0], carr.shape[1], 8, 8))
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = deq
        spatial = np.einsum("ur,yxuv,vc->yxrc", _IDCT_M, blocks, _IDCT_M)
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(
                carr.shape[0] * 8, carr.shape[1] * 8
            )
        )
    return _planes_to_pixels(planes, comps, hmax, vmax, width, height)


# ── deterministic fixture encoder ────────────────────────────────────────


def synth_jpeg(width: int, height: int, seed: int = 0, progressive: bool = False) -> bytes:
    """Deterministic flat-block JPEG (4:4:4, all-1 quant tables, DC-only
    entropy data, neutral chroma): luma of 8×8 block (r, c) is
    ``(seed * 29) % 200 + 20 + 10 * ((r % 2) * 2 + c % 2)``, so decoded
    pixels are exactly that value (chroma 128 ⇒ RGB == luma). The JPEG
    analog of ``multimodal.synth_png`` — real marker stream, real Huffman
    entropy data, closed-form expected pixels. width/height must be
    multiples of 8. ``progressive=True`` emits the same image as an SOF2
    multi-scan stream (interleaved DC first at Al=1 + DC refinement +
    per-component AC scans carried entirely by an EOB run)."""
    if width % 8 or height % 8:
        raise ValueError("synth_jpeg needs multiple-of-8 dimensions")
    # canonical tables: DC categories 0..11 at length 8; AC: EOB alone at
    # length 2 for baseline; progressive adds EOBn run symbols at length 4
    dc_bits = [0] * 7 + [12] + [0] * 8
    dc_vals = bytes(range(12))
    if progressive:
        ac_bits = [0, 0, 0, 15] + [0] * 12
        ac_vals = bytes(r << 4 for r in range(15))  # EOB, EOB2..EOB14
    else:
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

    def flush() -> bytes:
        """Pad to a byte with 1-bits, byte-stuff 0xFF, clear the buffer."""
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
        bitbuf.clear()
        return bytes(entropy)

    def put_dc_diff(diff: int) -> None:
        t = abs(diff).bit_length()
        length, code = dc_codes[t]
        put(code, length)
        if t:
            put(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def block_coef(r: int, c: int, ci: int) -> int:
        luma = (seed * 29) % 200 + 20 + 10 * ((r % 2) * 2 + c % 2)
        return 8 * (((luma, 128, 128)[ci]) - 128)

    nbr, nbc = height // 8, width // 8

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = b"\x08" + struct.pack(">HH", height, width) + b"\x03"
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += bytes([0xFF, 0xC2 if progressive else 0xC0])
    out += struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        b"\x00" + bytes(dc_bits) + dc_vals + b"\x10" + bytes(ac_bits) + ac_vals
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    if not progressive:
        sos = b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        preds = [0, 0, 0]
        for r in range(nbr):
            for c in range(nbc):
                for ci in range(3):
                    coeff = block_coef(r, c, ci)
                    put_dc_diff(coeff - preds[ci])
                    preds[ci] = coeff
                    length, code = ac_codes[0x00]  # EOB
                    put(code, length)
        out += flush() + b"\xff\xd9"
        return bytes(out)

    # progressive: DC first (Al=1, interleaved) + DC refine + one all-EOB
    # AC scan per component (band 1..63 carried by a single EOB run)
    sos = b"\x03" + b"\x01\x00\x02\x00\x03\x00" + bytes([0, 0, 1])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    preds = [0, 0, 0]
    for r in range(nbr):
        for c in range(nbc):
            for ci in range(3):
                dc1 = block_coef(r, c, ci) >> 1
                put_dc_diff(dc1 - preds[ci])
                preds[ci] = dc1
    out += flush()
    sos = b"\x03" + b"\x01\x00\x02\x00\x03\x00" + bytes([0, 0, 1 << 4])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    for _ in range(nbr * nbc * 3):
        put(0, 1)  # block coefficients are ×8 ⇒ bit 0 is always 0
    out += flush()
    nblocks = nbr * nbc
    for cid in (1, 2, 3):
        sos = bytes([1, cid, 0x00, 1, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        rr = min(14, nblocks.bit_length() - 1)
        length, code = ac_codes[rr << 4]
        put(code, length)
        if rr:
            put(nblocks - (1 << rr), rr)
        out += flush()
    out += b"\xff\xd9"
    return bytes(out)
