"""Baseline-JPEG decoder tests: a minimal independent ENCODER lives here
(canonical Huffman from DHT specs, quant=1, direct coefficient encoding)
so the decoder is exercised over real marker streams, and expected pixels
are recomputed with the textbook T.81 double-sum IDCT — not the decoder's
matrix form."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from crawl4ai_spark.operators.jpeg import jpeg_decode

# ── independent zigzag (diagonal walk per T.81 figure A.6) ───────────────


def _zigzag_order():
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(s + 1) if i < 8 and 0 <= s - i < 8]
        if s % 2 == 0:
            cells = cells[::-1]  # even diagonals walk bottom-left → top-right
        order.extend(cells)
    assert order[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    return order


_ZIGZAG = _zigzag_order()


def _textbook_idct(coeffs: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    acc += (
                        0.25 * cu * cv * coeffs[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = acc
    return out


# ── minimal baseline encoder ─────────────────────────────────────────────

_DC_BITS = [0] * 7 + [12] + [0] * 8
_DC_VALS = bytes(range(12))
_AC_SYMS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]  # EOBn (progressive EOB runs)
)
_AC_BITS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8


def _canonical_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(bw, coeffs, pred, dc_codes, ac_codes):
    zz = [int(coeffs[r][c]) for r, c in _ZIGZAG]
    diff = zz[0] - pred
    t = _category(diff)
    length, code = dc_codes[t]
    bw.put(code, length)
    if t:
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        bw.put(mag, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.put(code, length)
            run -= 16
        s = _category(zz[k])
        length, code = ac_codes[(run << 4) | s]
        bw.put(code, length)
        mag = zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1
        bw.put(mag, s)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]
        bw.put(code, length)
    return zz[0]


def build_jpeg(width, height, comps, coeff_fn, dri=0, sof=0xC0):
    """comps: [(comp_id, h_i, v_i)]; coeff_fn(ci, block_row, block_col) →
    8×8 integer coefficient matrix (natural order), quantization all-1s."""
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sofdata = b"\x08" + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, hi, vi in comps:
        sofdata += bytes([cid, (hi << 4) | vi, 0])
    out += bytes([0xFF, sof]) + struct.pack(">H", 2 + len(sofdata)) + sofdata
    dht = b"\x00" + bytes(_DC_BITS) + _DC_VALS + b"\x10" + bytes(_AC_BITS) + _AC_SYMS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)
    sos = bytes([len(comps)])
    for cid, _hi, _vi in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            bw.flush()
            out += bytes(bw.out)
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (_cid, hi, vi) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    block = coeff_fn(ci, my * vi + by, mx * hi + bx)
                    preds[ci] = _encode_block(bw, block, preds[ci], dc_codes, ac_codes)
    bw.flush()
    out += bytes(bw.out) + b"\xff\xd9"
    return bytes(out)


def _flat(level):
    """Coefficient matrix for a flat block of pixel value `level`."""
    m = [[0] * 8 for _ in range(8)]
    m[0][0] = 8 * (level - 128)
    return m


# ── tests ────────────────────────────────────────────────────────────────


def test_flat_grayscale_exact():
    data = build_jpeg(8, 8, [(1, 1, 1)], lambda ci, r, c: _flat(200))
    w, h, ch, pix = jpeg_decode(data)
    assert (w, h, ch) == (8, 8, 1)
    assert set(pix) == {200}


def test_multi_block_dc_chain_and_crop():
    levels = {(0, 0): 10, (0, 1): 130, (1, 0): 255, (1, 1): 77}
    data = build_jpeg(13, 11, [(1, 1, 1)], lambda ci, r, c: _flat(levels[(r, c)]))
    w, h, ch, pix = jpeg_decode(data)
    assert (w, h, ch) == (13, 11, 1)
    a = np.frombuffer(pix, dtype=np.uint8).reshape(11, 13)
    assert a[0, 0] == 10 and a[0, 12] == 130 and a[10, 0] == 255 and a[10, 12] == 77


def test_ac_coefficients_match_textbook_idct():
    coeffs = np.zeros((8, 8), dtype=int)
    coeffs[0][0] = 160
    coeffs[0][3] = -55
    coeffs[2][1] = 31
    coeffs[7][7] = 12
    coeffs[5][0] = -200
    data = build_jpeg(8, 8, [(1, 1, 1)], lambda ci, r, c: coeffs.tolist())
    w, h, ch, pix = jpeg_decode(data)
    want = np.clip(np.rint(_textbook_idct(coeffs.astype(float)) + 128), 0, 255)
    got = np.frombuffer(pix, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(got, want)


def test_color_444_flat_ycbcr_to_rgb():
    y, cb, cr = 120, 90, 180
    blocks = [_flat(y), _flat(cb), _flat(cr)]
    data = build_jpeg(
        8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], lambda ci, r, c: blocks[ci]
    )
    w, h, ch, pix = jpeg_decode(data)
    assert (w, h, ch) == (8, 8, 3)
    r_ = round(y + 1.402 * (cr - 128))
    g_ = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b_ = round(y + 1.772 * (cb - 128))
    a = np.frombuffer(pix, dtype=np.uint8).reshape(8, 8, 3)
    assert (a[:, :, 0] == r_).all() and (a[:, :, 1] == g_).all() and (a[:, :, 2] == b_).all()


def test_color_420_upsampling_grid():
    """2×2 luma blocks per MCU with distinct flat values; flat chroma at
    128 (zero chroma contribution) → RGB equals the per-quadrant luma."""
    ylv = {(0, 0): 60, (0, 1): 100, (1, 0): 160, (1, 1): 220}

    def coeff(ci, r, c):
        if ci == 0:
            return _flat(ylv[(r, c)])
        return _flat(128)

    data = build_jpeg(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], coeff)
    w, h, ch, pix = jpeg_decode(data)
    assert (w, h, ch) == (16, 16, 3)
    a = np.frombuffer(pix, dtype=np.uint8).reshape(16, 16, 3)
    for (r, c), lv in ylv.items():
        quad = a[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
        assert (quad == lv).all(), (r, c, lv, quad[0, 0])


def test_restart_interval_resync():
    levels = {(0, 0): 40, (0, 1): 90, (0, 2): 140, (0, 3): 190}
    data = build_jpeg(
        32, 8, [(1, 1, 1)], lambda ci, r, c: _flat(levels[(r, c)]), dri=1
    )
    assert b"\xff\xd0" in data and b"\xff\xd1" in data and b"\xff\xd2" in data
    w, h, ch, pix = jpeg_decode(data)
    a = np.frombuffer(pix, dtype=np.uint8).reshape(8, 32)
    for (r, c), lv in levels.items():
        assert (a[:, c * 8 : c * 8 + 8] == lv).all()


def test_lossless_sof3_rejected():
    data = build_jpeg(8, 8, [(1, 1, 1)], lambda ci, r, c: _flat(100), sof=0xC3)
    with pytest.raises(ValueError, match="lossless|arithmetic"):
        jpeg_decode(data)


# ── independent PROGRESSIVE encoder (T.81 annex G mirror) ────────────────


def _point_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign preserved (G.1.2.2)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _emit_eobn(bw, ac_codes, eob_blocks):
    """Flush a pending EOB run: EOBn code for the block count, then each
    covered block's correction bits in block order."""
    e = len(eob_blocks)
    if not e:
        return
    assert e < (1 << 15)
    r = min(14, e.bit_length() - 1)
    length, code = ac_codes[r << 4]
    bw.put(code, length)
    if r:
        bw.put(e - (1 << r), r)
    for bits in eob_blocks:
        for b in bits:
            bw.put(b, 1)
    eob_blocks.clear()


def _ac_first_block(bw, ac_codes, zz, ss, se, al, eob_blocks):
    v = [_point_ac(zz[k], al) for k in range(64)]
    last_nz = max((k for k in range(ss, se + 1) if v[k]), default=None)
    if last_nz is None:
        eob_blocks.append([])  # whole band zero: extend/open the EOB run
        return
    _emit_eobn(bw, ac_codes, eob_blocks)
    run = 0
    for k in range(ss, last_nz + 1):
        if v[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.put(code, length)
            run -= 16
        s = _category(v[k])
        length, code = ac_codes[(run << 4) | s]
        bw.put(code, length)
        mag = v[k] if v[k] > 0 else v[k] + (1 << s) - 1
        bw.put(mag, s)
        run = 0
    if last_nz < se:  # trailing zeros → this block opens an EOB run
        eob_blocks.append([])


def _ac_refine_block(bw, ac_codes, zz, ss, se, ah, al, eob_blocks):
    """Mirror of the decoder's refinement state machine: events per band
    position — 'z' zero history & stays zero-at-this-level, 'c' nonzero
    history (correction bit), 'n' newly nonzero (±1 sign bit)."""
    events = []
    for k in range(ss, se + 1):
        hist = _point_ac(zz[k], ah)
        now = _point_ac(zz[k], al)
        if hist != 0:
            events.append(("c", (abs(zz[k]) >> al) & 1))
        elif now != 0:
            assert abs(now) == 1, "refinement can only introduce ±1"
            events.append(("n", 1 if now > 0 else 0))
        else:
            events.append(("z", 0))
    i = 0
    segments = []  # (symbol, [bits following the code]) in emit order
    while True:
        j = i
        while j < len(events) and events[j][0] != "n":
            j += 1
        if j == len(events):
            break
        p = i
        zcount = sum(1 for (t, _b) in events[i:j] if t == "z")
        while zcount > 15:  # ZRL consumes exactly 16 zero-history slots
            taken, bits = 0, []
            while taken < 16:
                t, b = events[p]
                if t == "c":
                    bits.append(b)
                else:
                    taken += 1
                p += 1
            segments.append((0xF0, bits))
            zcount -= 16
        bits = [events[j][1]]  # sign bit first, then passed corr bits
        for t, b in events[p:j]:
            if t == "c":
                bits.append(b)
        segments.append(((zcount << 4) | 1, bits))
        i = j + 1
    if segments:
        _emit_eobn(bw, ac_codes, eob_blocks)
        for sym, bits in segments:
            length, code = ac_codes[sym]
            bw.put(code, length)
            for b in bits:
                bw.put(b, 1)
    tail = [b for (t, b) in events[i:] if t == "c"]
    if i < len(events):  # positions remain → this block joins an EOB run
        eob_blocks.append(tail)


def build_progressive_jpeg(width, height, comps, coeff_fn, dri=0):
    """Same contract as build_jpeg but emits an SOF2 multi-scan stream:
    DC first (Al=1) interleaved, DC refine, then per component AC first
    (Al=1) split into bands 1–5 / 6–63, then the two AC refinement scans
    — exercising spectral selection, successive approximation, EOB runs,
    ZRL-in-refinement, and (with dri) per-scan restart resync."""
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sofdata = b"\x08" + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, hi, vi in comps:
        sofdata += bytes([cid, (hi << 4) | vi, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sofdata)) + sofdata
    dht = b"\x00" + bytes(_DC_BITS) + _DC_VALS + b"\x10" + bytes(_AC_BITS) + _AC_SYMS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # materialize every block's zigzag coefficients on the full MCU grid
    grids = []
    for ci, (_cid, hi, vi) in enumerate(comps):
        g = {}
        for br in range(mcuy * vi):
            for bc in range(mcux * hi):
                m = coeff_fn(ci, br, bc)
                g[(br, bc)] = [int(m[r][c]) for r, c in _ZIGZAG]
        grids.append(g)

    def sos_header(scan_comps, ss, se, ah, al):
        sos = bytes([len(scan_comps)])
        for cid in scan_comps:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    rst = [0]

    def restart(bw):
        bw.flush()
        chunk = bytes(bw.out)
        bw.out.clear()
        marker = bytes([0xFF, 0xD0 + (rst[0] & 7)])
        rst[0] += 1
        return chunk + marker

    # scan 1: DC first, interleaved, Al=1
    out += sos_header([c[0] for c in comps], 0, 0, 0, 1)
    bw = _BitWriter()
    rst[0] = 0
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            out += restart(bw)
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (_cid, hi, vi) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    dc = grids[ci][(my * vi + by, mx * hi + bx)][0] >> 1
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    t = _category(diff)
                    length, code = dc_codes[t]
                    bw.put(code, length)
                    if t:
                        mag = diff if diff >= 0 else diff + (1 << t) - 1
                        bw.put(mag, t)
    bw.flush()
    out += bytes(bw.out)

    # scan 2: DC refine (Ah=1, Al=0), interleaved
    out += sos_header([c[0] for c in comps], 0, 0, 1, 0)
    bw = _BitWriter()
    rst[0] = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            out += restart(bw)
        my, mx = divmod(m, mcux)
        for ci, (_cid, hi, vi) in enumerate(comps):
            for by in range(vi):
                for bx in range(hi):
                    bw.put(grids[ci][(my * vi + by, mx * hi + bx)][0] & 1, 1)
    bw.flush()
    out += bytes(bw.out)

    # per-component non-interleaved AC scans over two spectral bands
    def comp_blocks(ci):
        _cid, hi, vi = comps[ci]
        bw_ = -(-(-(-width * hi // hmax)) // 8)
        bh_ = -(-(-(-height * vi // vmax)) // 8)
        return [(br, bc) for br in range(bh_) for bc in range(bw_)], bw_

    for ss, se in ((1, 5), (6, 63)):
        for ci, (cid, _hi, _vi) in enumerate(comps):
            out += sos_header([cid], ss, se, 0, 1)
            bw = _BitWriter()
            rst[0] = 0
            eob_blocks: list[list[int]] = []
            blocks, _bw = comp_blocks(ci)
            for m, (br, bc) in enumerate(blocks):
                if dri and m and m % dri == 0:
                    _emit_eobn(bw, ac_codes, eob_blocks)
                    out += restart(bw)
                _ac_first_block(
                    bw, ac_codes, grids[ci][(br, bc)], ss, se, 1, eob_blocks
                )
            _emit_eobn(bw, ac_codes, eob_blocks)
            bw.flush()
            out += bytes(bw.out)
    for ss, se in ((1, 5), (6, 63)):
        for ci, (cid, _hi, _vi) in enumerate(comps):
            out += sos_header([cid], ss, se, 1, 0)
            bw = _BitWriter()
            rst[0] = 0
            eob_blocks = []
            blocks, _bw = comp_blocks(ci)
            for m, (br, bc) in enumerate(blocks):
                if dri and m and m % dri == 0:
                    _emit_eobn(bw, ac_codes, eob_blocks)
                    out += restart(bw)
                _ac_refine_block(
                    bw, ac_codes, grids[ci][(br, bc)], ss, se, 1, 0, eob_blocks
                )
            _emit_eobn(bw, ac_codes, eob_blocks)
            bw.flush()
            out += bytes(bw.out)

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_flat_grayscale_exact():
    data = build_progressive_jpeg(8, 8, [(1, 1, 1)], lambda ci, r, c: _flat(200))
    w, h, ch, pix = jpeg_decode(data)
    assert (w, h, ch) == (8, 8, 1)
    assert set(pix) == {200}


def test_progressive_matches_baseline_random_grayscale():
    rng = np.random.RandomState(7)
    grids = {}

    def coeff(ci, r, c):
        if (ci, r, c) not in grids:
            m = np.zeros((8, 8), dtype=int)
            m[0][0] = int(rng.randint(-200, 200))
            for _ in range(10):
                m[rng.randint(8)][rng.randint(8)] = int(rng.randint(-12, 12))
            grids[(ci, r, c)] = m.tolist()
        return grids[(ci, r, c)]

    base = build_jpeg(24, 16, [(1, 1, 1)], coeff)
    prog = build_progressive_jpeg(24, 16, [(1, 1, 1)], coeff)
    assert jpeg_decode(base) == jpeg_decode(prog)


def test_progressive_matches_baseline_color_420_odd_dims():
    rng = np.random.RandomState(11)
    grids = {}

    def coeff(ci, r, c):
        if (ci, r, c) not in grids:
            m = np.zeros((8, 8), dtype=int)
            m[0][0] = int(rng.randint(-100, 100))
            for _ in range(8):
                m[rng.randint(8)][rng.randint(8)] = int(rng.randint(-9, 9))
            grids[(ci, r, c)] = m.tolist()
        return grids[(ci, r, c)]

    comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
    base = build_jpeg(21, 13, comps, coeff)
    prog = build_progressive_jpeg(21, 13, comps, coeff)
    assert jpeg_decode(base) == jpeg_decode(prog)


def test_progressive_restart_resync():
    rng = np.random.RandomState(5)
    grids = {}

    def coeff(ci, r, c):
        if (ci, r, c) not in grids:
            m = np.zeros((8, 8), dtype=int)
            m[0][0] = int(rng.randint(-150, 150))
            for _ in range(6):
                m[rng.randint(8)][rng.randint(8)] = int(rng.randint(-7, 7))
            grids[(ci, r, c)] = m.tolist()
        return grids[(ci, r, c)]

    base = build_jpeg(32, 16, [(1, 1, 1)], coeff)
    prog = build_progressive_jpeg(32, 16, [(1, 1, 1)], coeff, dri=3)
    assert b"\xff\xd0" in prog
    assert jpeg_decode(base) == jpeg_decode(prog)


def test_progressive_sparse_high_band_eob_runs():
    """Mostly-empty high band → long EOB runs with extension bits; one
    block carries a lone k=60 coefficient to split the run."""
    def coeff(ci, r, c):
        m = [[0] * 8 for _ in range(8)]
        m[0][0] = 80
        if (r, c) == (1, 2):
            rr, cc = _ZIGZAG[60]
            m[rr][cc] = 5
        return m

    base = build_jpeg(40, 24, [(1, 1, 1)], coeff)
    prog = build_progressive_jpeg(40, 24, [(1, 1, 1)], coeff)
    assert jpeg_decode(base) == jpeg_decode(prog)


def test_byte_stuffing_roundtrip():
    """Coefficients chosen to force 0xFF bytes in the entropy stream —
    the encoder stuffs 0x00, the decoder must unstuff."""
    rng = np.random.RandomState(3)
    found = False
    for trial in range(40):
        coeffs = np.zeros((8, 8), dtype=int)
        coeffs[0][0] = int(rng.randint(-1000, 1000))
        for _ in range(12):
            coeffs[rng.randint(8)][rng.randint(8)] = int(rng.randint(-80, 80))
        data = build_jpeg(8, 8, [(1, 1, 1)], lambda ci, r, c: coeffs.tolist())
        scan = data[data.find(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            found = True
            w, h, ch, pix = jpeg_decode(data)
            want = np.clip(np.rint(_textbook_idct(coeffs.astype(float)) + 128), 0, 255)
            got = np.frombuffer(pix, dtype=np.uint8).reshape(8, 8)
            assert np.array_equal(got, want)
    assert found, "no trial produced a stuffed byte — adjust generator"


def test_image_feature_decoder_uses_real_jpeg_pixels():
    """multimodal.image_feature_decoder must route decodable JPEGs through
    the pixel path (PNG-style per-channel means), keeping the probe
    fallback for header-only streams."""
    from crawl4ai_spark.operators.multimodal import image_feature_decoder

    y = 120
    blocks = [_flat(y), _flat(128), _flat(128)]
    data = build_jpeg(
        8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], lambda ci, r, c: blocks[ci]
    )
    feats = image_feature_decoder(data, {})
    assert feats[0] == 8.0 and feats[1] == 8.0 and feats[2] == 3.0
    # flat gray image: all three channel means equal the luma, std 0
    assert feats[3] == float(y) and feats[4] == float(y) and feats[5] == float(y)
    assert feats[7] == 0.0


def test_image_feature_decoder_progressive_pixel_path():
    """SOF2 streams must take the real pixel path too — identical
    features to the baseline encoding of the same image, not the
    dimension-probe fallback (which leaves channel stats empty)."""
    from crawl4ai_spark.operators.multimodal import image_feature_decoder

    y = 120
    blocks = [_flat(y), _flat(128), _flat(128)]
    comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
    base = build_jpeg(8, 8, comps, lambda ci, r, c: blocks[ci])
    prog = build_progressive_jpeg(8, 8, comps, lambda ci, r, c: blocks[ci])
    assert image_feature_decoder(prog, {}) == image_feature_decoder(base, {})
    assert image_feature_decoder(prog, {})[3] == float(y)


def test_synth_progressive_matches_baseline_synth():
    from crawl4ai_spark.operators.jpeg import synth_jpeg

    for seed in (0, 3, 6, 30, 54):
        assert jpeg_decode(synth_jpeg(16, 16, seed=seed, progressive=True)) == (
            jpeg_decode(synth_jpeg(16, 16, seed=seed))
        )


def test_malformed_segments_raise_value_error():
    """Lying segment lengths must surface as ValueError (the fallback
    contract image_feature_decoder relies on), never IndexError or
    struct.error."""
    import pytest

    from crawl4ai_spark.operators.jpeg import jpeg_decode

    # SOI + DHT that claims 5 symbols but truncates the symbol bytes
    bad_dht = b"\xff\xd8\xff\xc4\x00\x08\x00" + b"\x05" + b"\x00" * 0 + b"\xff\xd9"
    # SOI + SOF0 segment shorter than its header needs
    bad_sof = b"\xff\xd8\xff\xc0\x00\x04\x08\x00\xff\xd9"
    # SOI + empty SOS
    bad_sos = b"\xff\xd8\xff\xda\x00\x02\xff\xd9"
    for payload in (bad_dht, bad_sof, bad_sos, b"\xff\xd8\xff\xdd\x00\x03\x01"):
        with pytest.raises(ValueError):
            jpeg_decode(payload)
