"""Clean-room minimal PDF text/link/metadata extraction (pure stdlib).

The reference ships a PDF pipeline (``processors/pdf/processor.py``,
``NaivePDFProcessorStrategy``) built on the external ``pypdf`` package:
per-page raw text, page links (/Annots URIs), and document metadata
(/Info). That package is absent from this environment, so this module
is a from-scratch parser for a well-defined PDF subset, written from the
PDF 1.7 spec (ISO 32000-1):

- body parsing: every ``N G obj .. endobj`` span is scanned directly
  (works with classic xref tables AND broken/absent xref — the tolerant
  posture a web corpus needs); streams resolve ``/Length`` through
  indirect refs; filters: ``/FlateDecode`` (stdlib zlib),
  ``/LZWDecode`` (TIFF-style MSB-first with ``/EarlyChange``),
  ``/ASCIIHexDecode``, ``/ASCII85Decode`` (stdlib base64),
  ``/RunLengthDecode``; filterless streams pass through raw; inline
  images (``BI..EI``) are skipped so their binary bodies can't poison
  the token stream.
- page order: ``trailer /Root -> /Pages`` tree walked through ``/Kids``
  (inherited attributes not needed for text); fallback to object-number
  order over ``/Type /Page`` leaves when the trailer is missing/broken.
- text: content-stream operators ``Tj``, ``'``, ``"``, ``TJ`` inside
  BT/ET blocks; literal strings with all escape forms (incl. octal and
  line continuations) and hex strings. Fonts: ``Tf`` switches the
  active decode — fonts carrying a ``/ToUnicode`` CMap (the
  subset-embedded-font case every modern generator produces) decode
  through it (bfchar + both bfrange forms, 1- and 2-byte codes,
  unmapped codes → U+FFFD); fonts without one decode Latin-1.
  Line breaks: ``Td``/``TD``/``T*`` and the ``'``/``"`` operators start
  a new output line; ``TJ`` kern numbers are ignored. This matches the
  reference's "naive" per-page ``extract_text`` granularity, not glyph
  positioning.
- links: per-page ``/Annots`` -> ``/A /URI`` (or direct ``/URI``).
- metadata: ``trailer /Info`` Title/Author/Producer + page count +
  ``/Encrypt`` presence.

- modern (PDF 1.5+) layouts: ``/ObjStm`` object streams expand into the
  object map (page trees/annots/info hidden in compressed containers),
  and when no ``trailer`` keyword exists the ``/Type /XRef``
  cross-reference stream's dict supplies /Root /Info /Encrypt.
- encryption: the Standard Security Handler decrypts transparently
  when the EMPTY user password verifies — the "owner-password-only"
  protection that dominates encrypted PDFs on the open web and that
  the reference's pypdf backend also opens without a password. All
  four mainstream variants: RC4 (ISO 32000-1 §7.6.3: /V 1-2, /R 2-3,
  40..128-bit), AES-128 (/V 4 /R 4 crypt filters, /CFM /AESV2) and
  AES-256 (/V 5 /R 5-6, ISO 32000-2 Algorithm 2.B hash) — AES is a
  clean-room FIPS-197 implementation pinned by the published appendix-C
  known-answer vectors. Per-object keys per Algorithm 1 (file key
  direct for V5); strings and streams decrypt before filter decoding;
  ObjStm-embedded objects inherit the container's decryption (spec:
  their strings are not individually encrypted). Docs whose user
  password is non-empty stay flagged ``encrypted`` with empty text.

Out of scope (documented; such pages yield empty/garbled text with the
whole row still poison-tolerant): CID fonts WITHOUT a /ToUnicode CMap
(pure CIDSystemInfo/Identity-H glyph ids), image filters (DCT/JBIG2/
JPX), xref-stream predictors (not needed — the body scan replaces xref
lookup), password-protected (non-empty) user passwords, and exotic /V 4
crypt-filter layouts (per-stream /Crypt filter overrides, /Identity
string filter with AES streams).
"""

from __future__ import annotations

import functools
import hashlib
import re
import struct
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_TRAILER_RE = re.compile(rb"trailer\b", re.S)


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Ref({self.num})"


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to EOL
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """Literal string ``( .. )`` with escapes and balanced parens."""
    out = bytearray()
    depth = 1
    pos += 1
    n = len(data)
    while pos < n and depth:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: PDF spec says drop the backslash
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    return bytes(out), pos


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.index(b">", pos)
    hexes = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1 : end])
    if len(hexes) % 2:
        hexes += b"0"
    return bytes.fromhex(hexes.decode("ascii")), end + 1


_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")


def _parse_name(data: bytes, pos: int) -> tuple[str, int]:
    pos += 1
    start = pos
    n = len(data)
    while pos < n and data[pos] not in _WS and data[pos] not in _DELIM:
        pos += 1
    raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]), data[start:pos])
    return raw.decode("latin-1"), pos


_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_EI_RE = re.compile(rb"\bEI\b")


def parse_value(data: bytes, pos: int):
    """Parse one PDF object value at ``pos`` → (value, next_pos). Indirect
    references become ``_Ref``; names become ``'/Name'`` strings."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise ValueError("unexpected end of PDF data")
    c = data[pos]
    if c == 0x3C:  # < : dict or hex string
        if data[pos : pos + 2] == b"<<":
            d = {}
            pos += 2
            while True:
                pos = _skip_ws(data, pos)
                if data[pos : pos + 2] == b">>":
                    return d, pos + 2
                if data[pos] != 0x2F:
                    raise ValueError("bad PDF dict key")
                key, pos = _parse_name(data, pos)
                val, pos = parse_value(data, pos)
                d["/" + key] = val
        return _parse_hex_string(data, pos)
    if c == 0x28:
        return _parse_string(data, pos)
    if c == 0x2F:
        name, pos = _parse_name(data, pos)
        return "/" + name, pos
    if c == 0x5B:  # array
        arr = []
        pos += 1
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            val, pos = parse_value(data, pos)
            arr.append(val)
    if data[pos : pos + 4] == b"true":
        return True, pos + 4
    if data[pos : pos + 5] == b"false":
        return False, pos + 5
    if data[pos : pos + 4] == b"null":
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if not m:
        raise ValueError(f"bad PDF token at {pos}: {data[pos:pos+16]!r}")
    # "N G R" indirect reference lookahead (anchored match at pos —
    # a data[pos:] slice here is a full-buffer copy per numeric token,
    # O(n²) on large web-corpus PDFs)
    ref = _REF_RE.match(data, pos)
    if ref:
        return _Ref(int(ref.group(1))), ref.end()
    tok = m.group(0)
    num = float(tok) if b"." in tok else int(tok)
    return num, m.end()


def _scan_objects(data: bytes) -> dict[int, tuple]:
    """All ``N G obj`` spans → {num: (value, raw_stream_or_None)}. The raw
    stream keeps its bytes unresolved (length fixed up in a second pass)."""
    objects: dict[int, tuple] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        try:
            val, pos = parse_value(data, m.end())
        except (ValueError, IndexError):
            continue
        pos = _skip_ws(data, pos)
        stream = None
        if data[pos : pos + 6] == b"stream":
            pos += 6
            if data[pos : pos + 2] == b"\r\n":
                pos += 2
            elif pos < len(data) and data[pos : pos + 1] in (b"\n", b"\r"):
                pos += 1
            stream = pos  # start offset; sliced after /Length resolves
        objects[num] = (val, stream)
    return objects


def _resolve(objects: dict, v, depth: int = 0):
    while isinstance(v, _Ref) and depth < 32:
        v = objects.get(v.num, (None, None))[0]
        depth += 1
    return v


def _lzw_decode_pdf(data: bytes, early_change: int = 1) -> bytes:
    """PDF /LZWDecode (TIFF-style): MSB-first bit packing, 8-bit symbols
    (clear=256, EOD=257), code width 9→12 with the ``/EarlyChange``
    one-early widening every writer uses by default."""
    clear, eod = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    code_size = 9
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # spec-tolerant: EOD may be omitted
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = 9
            prev = None
            continue
        if code == eod:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("bad initial LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # full table: stop adding (deferred clear)
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("bad LZW code")
        out += entry
        prev = entry
        # the decoder's table lags the encoder's next_code by one (the
        # first code after a clear adds no entry), hence the −1
        if len(table) >= (1 << code_size) - early_change - 1 and code_size < 12:
            code_size += 1


def _stream_bytes(
    data: bytes, objects: dict, num: int, decryptor=None
) -> bytes | None:
    val, start = objects.get(num, (None, None))
    if start is None or not isinstance(val, dict):
        return None
    length = _resolve(objects, val.get("/Length"))
    if isinstance(length, (int, float)) and length >= 0:
        raw = data[start : start + int(length)]
    else:  # broken /Length: scan to endstream
        end = data.find(b"endstream", start)
        raw = data[start : end if end >= 0 else len(data)]
    if decryptor is not None:  # encryption wraps OUTSIDE the filters
        raw = decryptor(num, raw)
    filt = _resolve(objects, val.get("/Filter"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    for f in filters:
        if f == "/FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream in obj {num}") from exc
        elif f in ("/ASCIIHexDecode", "/AHx"):
            body = raw.split(b">")[0]
            hexes = re.sub(rb"[^0-9A-Fa-f]", b"", body)
            if len(hexes) % 2:
                hexes += b"0"
            raw = bytes.fromhex(hexes.decode("ascii"))
        elif f in ("/ASCII85Decode", "/A85"):
            import base64

            body = raw.split(b"~>")[0]
            body = re.sub(rb"\s", b"", body)
            if body.startswith(b"<~"):
                body = body[2:]
            try:
                raw = base64.a85decode(body)
            except ValueError as exc:
                raise ValueError(f"bad ASCII85 stream in obj {num}") from exc
        elif f in ("/LZWDecode", "/LZW"):
            parms = _resolve(objects, val.get("/DecodeParms")) or {}
            ec = parms.get("/EarlyChange", 1) if isinstance(parms, dict) else 1
            try:
                raw = _lzw_decode_pdf(raw, int(ec))
            except ValueError as exc:
                raise ValueError(f"bad LZW stream in obj {num}") from exc
        elif f in ("/RunLengthDecode", "/RL"):
            out = bytearray()
            i = 0
            while i < len(raw):
                l = raw[i]
                if l == 128:
                    break
                if l < 128:
                    out += raw[i + 1 : i + 2 + l]
                    i += 2 + l
                else:
                    out += raw[i + 1 : i + 2] * (257 - l)
                    i += 2
            raw = bytes(out)
        elif f is None:
            continue
        else:  # LZW/DCT/JBIG2/...: out of the documented subset
            raise ValueError(f"unsupported PDF filter {f}")
    return raw


_TEXT_OPS = {b"Tj", b"'", b'"', b"TJ"}
# BT included: each text object starts a new output line (pypdf-like
# block granularity); TJ deliberately absent (same-line continuation)
_NEWLINE_OPS = {b"Td", b"TD", b"T*", b"'", b'"', b"BT"}
_OP_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")


def _hex_utf16(hexs: bytes) -> str:
    b = bytes.fromhex(hexs.decode("ascii"))
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse_tounicode(raw: bytes) -> tuple[int, dict[int, str]]:
    """/ToUnicode CMap → (code byte-width, {code: unicode}). Supports
    begincodespacerange, beginbfchar, and both beginbfrange forms
    (continuous <lo> <hi> <dstStart> — last UTF-16 unit increments — and
    the explicit-array form)."""
    width = 1
    mapping: dict[int, str] = {}
    for m in re.finditer(rb"begincodespacerange(.*?)endcodespacerange", raw, re.S):
        for h in re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1)):
            width = max(width, len(h) // 2)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", raw, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            width = max(width, len(src) // 2)
            mapping[int(src, 16)] = _hex_utf16(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", raw, re.S):
        body = m.group(1)
        for lo, hi, arr in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", body, re.S
        ):
            width = max(width, len(lo) // 2)
            for i, d in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                mapping[int(lo, 16) + i] = _hex_utf16(d)
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", body
        ):
            width = max(width, len(lo) // 2)
            base = int(dst, 16)
            for i in range(int(hi, 16) - int(lo, 16) + 1):
                h = format(base + i, f"0{len(dst)}x").encode("ascii")
                mapping[int(lo, 16) + i] = _hex_utf16(h)
    return width, mapping


def _decode_shown(
    raw: bytes, font: tuple[int, dict[int, str]] | None
) -> str:
    """One shown string → text: Latin-1 byte-per-glyph without a CMap;
    with a /ToUnicode CMap, split into width-byte codes and map
    (unmapped codes → U+FFFD, the honest signal for a subset hole)."""
    if font is None:
        return raw.decode("latin-1")
    width, mapping = font
    if width <= 1:
        return "".join(mapping.get(b, chr(b)) for b in raw)
    out = []
    for i in range(0, len(raw) - width + 1, width):
        code = int.from_bytes(raw[i : i + width], "big")
        out.append(mapping.get(code, "�"))
    return "".join(out)


def _content_text(content: bytes, fonts: dict | None = None) -> str:
    """Show-text operators → text. Operand stack discipline: values
    accumulate until an operator token; text ops consume the last string
    (or array for TJ); line-move ops emit a newline. ``fonts`` maps
    resource names ("/F1") to parsed /ToUnicode CMaps (or None); the
    ``Tf`` operator switches the active decode."""
    fonts = fonts or {}
    cur_font: tuple[int, dict[int, str]] | None = None
    out: list[str] = []
    stack: list = []
    pos, n = 0, len(content)
    line_open = False
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos]
        if c == 0x28:
            s, pos = _parse_string(content, pos)
            stack.append(s)
            continue
        if c == 0x3C and content[pos : pos + 2] != b"<<":
            s, pos = _parse_hex_string(content, pos)
            stack.append(s)
            continue
        if c == 0x3C:  # inline dict (BDC etc.)
            try:
                v, pos = parse_value(content, pos)
            except (ValueError, IndexError):
                pos += 2
            stack.clear()
            continue
        if c == 0x5B:
            try:
                v, pos = parse_value(content, pos)
                stack.append(v)
            except (ValueError, IndexError):
                pos += 1
            continue
        if c == 0x2F:
            name, pos = _parse_name(content, pos)
            stack.append("/" + name)
            continue
        m = _NUM_RE.match(content, pos)
        if m:  # numbers and operators are disjoint token classes
            stack.append(m.group(0))
            pos = m.end()
            continue
        op_m = _OP_RE.match(content, pos)
        if not op_m:
            pos += 1
            continue
        op = op_m.group(0)
        pos = op_m.end()
        if op == b"BI":  # inline image: skip to EI (binary body would
            # otherwise poison the token stream)
            end = _EI_RE.search(content, pos)
            pos = end.end() if end else n
            stack.clear()
            continue
        if op == b"Tf":
            name = next(
                (s for s in reversed(stack)
                 if isinstance(s, str) and s.startswith("/")),
                None,
            )
            cur_font = fonts.get(name)
            stack.clear()
            continue
        if op in _NEWLINE_OPS and line_open:
            out.append("\n")
            line_open = False
        if op in _TEXT_OPS:
            if op == b"TJ":
                arr = stack[-1] if stack and isinstance(stack[-1], list) else []
                text = "".join(
                    _decode_shown(e, cur_font) for e in arr if isinstance(e, bytes)
                )
            else:
                last = next(
                    (s for s in reversed(stack) if isinstance(s, bytes)), b""
                )
                text = _decode_shown(last, cur_font)
            if text:
                out.append(text)
                line_open = True
        stack.clear()
    return "".join(out)


# ── Standard Security Handler (ISO 32000-1 §7.6.3, RC4 /V 1-2 /R 2-3) ────

# the 32-byte password pad string from the spec (Table 3.19 / §7.6.3.3)
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (public algorithm; KSA + PRGA)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    o: bytes,
    p: int,
    file_id: bytes,
    r: int,
    n: int,
    password: bytes = b"",
    extra: bytes = b"",
) -> bytes:
    """Algorithm 2: padded password + /O + /P (4-byte LE two's
    complement) + first file ID [+ ffffffff when R≥4 and
    /EncryptMetadata false] → MD5 (+50 rounds when R≥3) → n-byte
    file encryption key."""
    digest = hashlib.md5(
        (password + _PW_PAD)[:32]
        + o[:32]
        + struct.pack("<I", p & 0xFFFFFFFF)
        + file_id
        + extra
    ).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def _std_user_matches(key: bytes, u: bytes, r: int, file_id: bytes) -> bool:
    """Algorithms 4 (R2) / 5 (R3): does the candidate file key reproduce
    the stored /U entry?"""
    if r == 2:
        return _rc4(key, _PW_PAD) == u[:32]
    exp = _rc4(key, hashlib.md5(_PW_PAD + file_id).digest())
    for i in range(1, 20):
        exp = _rc4(bytes(b ^ i for b in key), exp)
    return exp == u[:16]


def _std_owner_entry(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry (used by the fixture encoder)."""
    okey = hashlib.md5((owner_pw + _PW_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey[:n]).digest()
    okey = okey[:n]
    o = _rc4(okey, (user_pw + _PW_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    return o


def _std_user_entry(key: bytes, r: int, file_id: bytes) -> bytes:
    """Algorithms 4/5 forward direction: the /U entry for a file key."""
    if r == 2:
        return _rc4(key, _PW_PAD)
    u = _rc4(key, hashlib.md5(_PW_PAD + file_id).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


# ── AES (FIPS-197, clean-room, table-driven; CBC for /AESV2 /AESV3) ──────


def _build_aes_tables():
    """GF(2^8) log/exp tables (generator 3), the S-box via inverse +
    affine map, and per-coefficient multiply tables for MixColumns —
    all derived from the public FIPS-197 definitions."""
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= ((x << 1) & 0xFF) ^ (0x1B if x & 0x80 else 0)  # x *= 3
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def gmul(a, b):
        return exp[log[a] + log[b]] if a and b else 0

    sbox = [0] * 256
    inv_sbox = [0] * 256
    for b in range(256):
        inv = exp[255 - log[b]] if b else 0
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        s ^= 0x63
        sbox[b] = s
        inv_sbox[s] = b
    mul = {c: [gmul(b, c) for b in range(256)] for c in (2, 3, 9, 11, 13, 14)}
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _GMUL = _build_aes_tables()


def _aes_round_keys(key: bytes):
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[t[1]] ^ rcon, _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
            rcon = ((rcon << 1) ^ (0x1B if rcon & 0x80 else 0)) & 0xFF
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        prev = w[i - nk]
        w.append([prev[j] ^ t[j] for j in range(4)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)], nr


def _aes_encrypt_block(rk, nr, block):
    m2, m3 = _GMUL[2], _GMUL[3]
    s = [block[i] ^ rk[0][i] for i in range(16)]
    for rnd in range(1, nr + 1):
        # SubBytes + ShiftRows (column-major state: index = row + 4*col)
        s = [_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)]
        if rnd != nr:
            t = []
            for c in (0, 4, 8, 12):
                a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
                t += [
                    m2[a0] ^ m3[a1] ^ a2 ^ a3,
                    a0 ^ m2[a1] ^ m3[a2] ^ a3,
                    a0 ^ a1 ^ m2[a2] ^ m3[a3],
                    m3[a0] ^ a1 ^ a2 ^ m2[a3],
                ]
            s = t
        k = rk[rnd]
        s = [s[i] ^ k[i] for i in range(16)]
    return s


def _aes_decrypt_block(rk, nr, block):
    m9, m11, m13, m14 = _GMUL[9], _GMUL[11], _GMUL[13], _GMUL[14]
    s = [block[i] ^ rk[nr][i] for i in range(16)]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows + InvSubBytes
        s = [_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)]
        k = rk[rnd]
        s = [s[i] ^ k[i] for i in range(16)]
        if rnd != 0:
            t = []
            for c in (0, 4, 8, 12):
                a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
                t += [
                    m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3],
                    m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3],
                    m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3],
                    m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3],
                ]
            s = t
    return s


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt; ``data`` length must be a 16 multiple."""
    rk, nr = _aes_round_keys(key)
    out = bytearray()
    prev = list(iv)
    for off in range(0, len(data), 16):
        blk = [data[off + i] ^ prev[i] for i in range(16)]
        prev = _aes_encrypt_block(rk, nr, blk)
        out += bytes(prev)
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk, nr = _aes_round_keys(key)
    out = bytearray()
    prev = list(iv)
    for off in range(0, len(data) - len(data) % 16, 16):
        blk = list(data[off : off + 16])
        dec = _aes_decrypt_block(rk, nr, blk)
        out += bytes(d ^ p for d, p in zip(dec, prev))
        prev = blk
    return bytes(out)


def _aes_decrypt_pdf(key: bytes, data: bytes) -> bytes:
    """PDF AES payload layout (§7.6.2): 16-byte IV prefix, CBC body,
    PKCS#7 padding. Malformed payloads yield b'' (poison-tolerant)."""
    if len(data) < 32 or (len(data) - 16) % 16:
        return b""
    pt = _aes_cbc_decrypt(key, data[:16], data[16:])
    pad = pt[-1] if pt else 0
    return pt[:-pad] if 1 <= pad <= 16 else pt


def _aes_encrypt_pdf(key: bytes, iv: bytes, data: bytes) -> bytes:
    pad = 16 - len(data) % 16
    return iv + _aes_cbc_encrypt(key, iv, data + bytes([pad]) * pad)


@functools.lru_cache(maxsize=256)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 password hash): iterated
    SHA-256/384/512 selected by an AES-CBC feedback block."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _v5_password_hash(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    # R5 (the deprecated Acrobat-9 extension) is a single SHA-256
    return (
        _hash_2b(password, salt, udata)
        if r == 6
        else hashlib.sha256(password + salt + udata).digest()
    )


def _object_key(file_key: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    """Algorithm 1: per-object key = MD5(file key + obj num low 3 LE +
    gen low 2 LE [+ b'sAlT' for AESV2]), truncated to min(n+5, 16)."""
    digest = hashlib.md5(
        file_key
        + struct.pack("<I", num)[:3]
        + struct.pack("<I", gen)[:2]
        + (b"sAlT" if aes else b"")
    ).digest()
    return digest[: min(len(file_key) + 5, 16)]


def _decrypt_strings(val, key: bytes, dec):
    """Recursively decrypt every string (bytes) inside a parsed object
    value with its per-object key and cipher primitive."""
    if isinstance(val, bytes):
        return dec(key, val)
    if isinstance(val, list):
        return [_decrypt_strings(v, key, dec) for v in val]
    if isinstance(val, dict):
        return {k: _decrypt_strings(v, key, dec) for k, v in val.items()}
    return val


def _setup_decryption(objects: dict, trailer: dict):
    """If the trailer names a Standard-handler /Encrypt dict whose EMPTY
    user password verifies, return ``(cipher, file_key)`` with cipher in
    {'rc4' (/V 1-2 /R 2-3), 'aesv2' (/V 4 /R 4 /CFM /AESV2), 'aesv3'
    (/V 5 /R 5-6 AES-256)}; else None (docs needing a real user
    password stay locked)."""
    enc_ref = trailer.get("/Encrypt")
    enc = _resolve(objects, enc_ref)
    if not (isinstance(enc, dict) and enc.get("/Filter") == "/Standard"):
        return None
    try:
        v = int(_resolve(objects, enc.get("/V")) or 0)
        r = int(_resolve(objects, enc.get("/R")) or 0)
        nbits = int(_resolve(objects, enc.get("/Length")) or 40)
        p = int(_resolve(objects, enc.get("/P", -1)))
    except (TypeError, ValueError):
        return None
    o, u = enc.get("/O"), enc.get("/U")
    if not (isinstance(o, bytes) and isinstance(u, bytes)):
        return None

    if v == 5 and r in (5, 6):
        # ISO 32000-2 §7.6.4.4 Algorithms 2.A/8: /U = hash(48) where
        # bytes 32-39 are the validation salt, 40-47 the key salt; the
        # file key is AES-256-CBC(iv=0) of /UE under the key-salt hash.
        ue = enc.get("/UE")
        if len(u) < 48 or not (isinstance(ue, bytes) and len(ue) >= 32):
            return None
        vsalt, ksalt = u[32:40], u[40:48]
        if _v5_password_hash(b"", vsalt, b"", r) != u[:32]:
            return None
        ik = _v5_password_hash(b"", ksalt, b"", r)
        return ("aesv3", _aes_cbc_decrypt(ik, bytes(16), ue[:32]))

    ids = trailer.get("/ID")
    file_id = (
        ids[0] if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
    )
    if v == 4 and r == 4:
        # /V 4: crypt filters. Only the common layout — /StmF and /StrF
        # both /StdCF with /CFM /AESV2 (AES-128) or /V2 (RC4-128).
        cf = _resolve(objects, enc.get("/CF"))
        stdcf = _resolve(objects, cf.get("/StdCF")) if isinstance(cf, dict) else None
        cfm = stdcf.get("/CFM") if isinstance(stdcf, dict) else None
        if cfm not in ("/AESV2", "/V2"):
            return None
        extra = b"" if enc.get("/EncryptMetadata", True) else b"\xff\xff\xff\xff"
        key = _std_file_key(o, p, file_id, r, max(5, nbits // 8), extra=extra)
        if _std_user_matches(key, u, 3, file_id):
            return ("aesv2" if cfm == "/AESV2" else "rc4", key)
        return None

    if v not in (1, 2) or r not in (2, 3):
        return None
    key = _std_file_key(o, p, file_id, r, max(5, nbits // 8))
    if _std_user_matches(key, u, r, file_id):
        return ("rc4", key)
    return None


def _make_decryptor(cipher: str, file_key: bytes):
    """(per-object-key fn, cipher primitive) for a verified handler."""
    if cipher == "rc4":
        return (lambda num: _object_key(file_key, num)), _rc4
    if cipher == "aesv2":
        return (lambda num: _object_key(file_key, num, aes=True)), _aes_decrypt_pdf
    return (lambda num: file_key), _aes_decrypt_pdf  # aesv3: file key direct


def _expand_object_streams(data: bytes, objects: dict, decryptor=None) -> None:
    """PDF 1.5+ object streams (``/Type /ObjStm``): compressed containers
    holding many small objects (page dicts, annots, info) that have no
    ``N 0 obj`` marker of their own — a body scan alone would miss them
    entirely, which is most modern writers' layout. Decompress each
    container, parse the ``N``-pair header (obj-number, offset), and
    merge the embedded objects into the map (container objects never
    carry streams, so the stream slot is None). First-wins against
    direct body objects? No — spec says later incremental updates win,
    and body objects were scanned in document order already, so embedded
    objects only fill numbers the scan did not see."""
    for num in list(objects):
        val, start = objects[num]
        if not (isinstance(val, dict) and val.get("/Type") == "/ObjStm"):
            continue
        try:
            raw = _stream_bytes(data, objects, num, decryptor)
            if raw is None:
                continue
            n_objs = int(_resolve(objects, val.get("/N")) or 0)
            first = int(_resolve(objects, val.get("/First")) or 0)
            pairs = []
            pos = 0
            for _ in range(n_objs):
                m1 = _NUM_RE.match(raw, _skip_ws(raw, pos))
                m2 = _NUM_RE.match(raw, _skip_ws(raw, m1.end()))
                pairs.append((int(m1.group(0)), int(m2.group(0))))
                pos = m2.end()
            for onum, off in pairs:
                if onum in objects:  # a direct body object wins
                    continue
                oval, _pos = parse_value(raw, first + off)
                objects[onum] = (oval, None)
        except (ValueError, IndexError, AttributeError, zlib.error):
            continue  # a broken container degrades, never fails the doc


def _walk_pages(objects: dict, node, acc: list[int], seen: set[int]) -> None:
    if not isinstance(node, _Ref) or node.num in seen:
        return
    seen.add(node.num)
    val = objects.get(node.num, (None, None))[0]
    if not isinstance(val, dict):
        return
    if val.get("/Type") == "/Page":
        acc.append(node.num)
        return
    kids = _resolve(objects, val.get("/Kids"))
    if isinstance(kids, list):
        for kid in kids:
            _walk_pages(objects, kid, acc, seen)


def _pdf_string(v) -> str | None:
    if isinstance(v, bytes):
        if v[:2] == b"\xfe\xff":  # UTF-16BE per spec
            try:
                return v[2:].decode("utf-16-be")
            except UnicodeDecodeError:
                return v.decode("latin-1")
        return v.decode("latin-1")
    return None


def parse_pdf(data: bytes) -> dict:
    """Parse PDF bytes → ``{"n_pages", "encrypted", "title", "author",
    "producer", "pages": [{"page_number", "text", "links"}]}``.
    Raises ValueError on non-PDF input; tolerates broken xref (body
    scan), bad /Length, missing trailer."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    objects = _scan_objects(data)
    if not objects:
        raise ValueError("PDF with no parseable objects")

    trailer: dict = {}
    for m in _TRAILER_RE.finditer(data):
        try:
            t, _ = parse_value(data, m.end())
        except (ValueError, IndexError):
            continue
        if isinstance(t, dict):
            trailer.update(t)
    if "/Root" not in trailer:
        # PDF 1.5+ cross-reference STREAMS replace the trailer keyword:
        # the /Type /XRef object's dict carries /Root /Info /Encrypt
        for val, _s in objects.values():
            if isinstance(val, dict) and val.get("/Type") == "/XRef":
                for k in ("/Root", "/Info", "/Encrypt", "/ID"):
                    if k in val and k not in trailer:
                        trailer[k] = val[k]

    encrypted = "/Encrypt" in trailer
    decryptor = None
    if encrypted:
        handler = _setup_decryption(objects, trailer)
        if handler is not None:
            cipher, file_key = handler
            okey, dec = _make_decryptor(cipher, file_key)
            # Decrypt every direct body object's strings in place with
            # its per-object key (the /Encrypt dict itself is exempt per
            # spec); streams decrypt lazily inside _stream_bytes.
            enc_ref = trailer.get("/Encrypt")
            skip_num = enc_ref.num if isinstance(enc_ref, _Ref) else -1
            for num, (val, start) in list(objects.items()):
                if num == skip_num:
                    continue
                objects[num] = (_decrypt_strings(val, okey(num), dec), start)

            def decryptor(num, raw):
                return dec(okey(num), raw)

    # ObjStm expansion AFTER decryption: container streams decrypt as
    # streams; their embedded objects' strings are plaintext (spec —
    # not individually encrypted).
    _expand_object_streams(data, objects, decryptor)
    readable = not encrypted or decryptor is not None
    info = _resolve(objects, trailer.get("/Info")) if readable else None
    meta = {
        "title": _pdf_string(info.get("/Title")) if isinstance(info, dict) else None,
        "author": _pdf_string(info.get("/Author")) if isinstance(info, dict) else None,
        "producer": _pdf_string(info.get("/Producer"))
        if isinstance(info, dict)
        else None,
    }

    page_nums: list[int] = []
    root = _resolve(objects, trailer.get("/Root"))
    if isinstance(root, dict):
        pages_ref = root.get("/Pages")
        if isinstance(pages_ref, _Ref):
            _walk_pages(objects, pages_ref, page_nums, set())
        elif isinstance(_resolve(objects, pages_ref), dict):
            # direct /Pages dict: walk its kids
            kids = _resolve(objects, _resolve(objects, pages_ref).get("/Kids"))
            if isinstance(kids, list):
                seen: set[int] = set()
                for kid in kids:
                    _walk_pages(objects, kid, page_nums, seen)
    if not page_nums:  # broken/absent catalog: object-order fallback
        page_nums = sorted(
            num
            for num, (val, _s) in objects.items()
            if isinstance(val, dict) and val.get("/Type") == "/Page"
        )

    def _page_fonts(page_val: dict) -> dict:
        """Resource /Font dict (with /Parent inheritance) → {"/F1":
        (width, cmap) | None} for _content_text's Tf switching."""
        res = None
        node, hops = page_val, 0
        while isinstance(node, dict) and hops < 32:
            res = _resolve(objects, node.get("/Resources"))
            if isinstance(res, dict):
                break
            node = _resolve(objects, node.get("/Parent"))
            hops += 1
        fonts: dict = {}
        fdict = _resolve(objects, res.get("/Font")) if isinstance(res, dict) else None
        if isinstance(fdict, dict):
            for fname, fref in fdict.items():
                fval = _resolve(objects, fref)
                tounicode = None
                if isinstance(fval, dict) and isinstance(
                    fval.get("/ToUnicode"), _Ref
                ):
                    try:
                        raw = _stream_bytes(
                            data, objects, fval["/ToUnicode"].num, decryptor
                        )
                        if raw:
                            tounicode = _parse_tounicode(raw)
                    except ValueError:
                        tounicode = None  # broken CMap: latin-1 fallback
                fonts["/" + fname.lstrip("/")] = tounicode
        return fonts

    pages = []
    for idx, num in enumerate(page_nums, start=1):
        val = objects[num][0]
        text = ""
        if readable:
            contents = _resolve(objects, val.get("/Contents"))
            refs = (
                contents
                if isinstance(contents, list)
                else [val.get("/Contents")]
                if isinstance(val.get("/Contents"), _Ref)
                else []
            )
            chunks = []
            for ref in refs:
                if isinstance(ref, _Ref):
                    raw = _stream_bytes(data, objects, ref.num, decryptor)
                    if raw is not None:
                        chunks.append(raw)
            text = (
                _content_text(b"\n".join(chunks), _page_fonts(val))
                if chunks
                else ""
            )
        links: list[str] = []
        annots = _resolve(objects, val.get("/Annots")) if readable else None
        if isinstance(annots, list):
            for a in annots:
                ad = _resolve(objects, a)
                if not isinstance(ad, dict):
                    continue
                action = _resolve(objects, ad.get("/A"))
                uri = None
                if isinstance(action, dict):
                    uri = _pdf_string(_resolve(objects, action.get("/URI")))
                if uri is None:
                    uri = _pdf_string(_resolve(objects, ad.get("/URI")))
                if uri:
                    links.append(uri)
        pages.append({"page_number": idx, "text": text, "links": links})

    return {
        "n_pages": len(pages),
        "encrypted": encrypted,
        **meta,
        "pages": pages,
    }


# ── deterministic fixture encoder (test/oracle mirror) ───────────────────


def synth_pdf(
    n_pages: int = 2,
    seed: int = 0,
    compress: bool = True,
    hex_strings: bool = False,
    with_links: bool = True,
    encrypt: str | None = None,
    user_password: bytes = b"",
) -> bytes:
    """Deterministic valid PDF (classic xref, FlateDecode content
    streams, /Info metadata, URI link annotations). Page ``p`` shows two
    lines whose text is closed-form in (p, seed) — see
    ``synth_pdf_page_text`` — so oracles re-derive the extraction
    analytically. ``encrypt``: None, ``"rc4-40"`` (/V 1 /R 2),
    ``"rc4-128"`` (/V 2 /R 3 /Length 128), ``"aes-128"`` (/V 4 /R 4
    /CFM /AESV2) or ``"aes-256"`` (/V 5 /R 6 /CFM /AESV3, ISO 32000-2)
    — Standard Security Handler with owner password ``synth-owner`` and
    the given user password (empty ⇒ parse_pdf decrypts transparently;
    the extracted content is byte-identical to the unencrypted
    document's)."""

    file_key = None
    enc_cipher = None
    enc_obj: bytes | None = None
    if encrypt is not None:
        file_id = hashlib.md5(b"synth-pdf-id-%d-%d" % (seed, n_pages)).digest()
        p_flags = -44
        if encrypt == "aes-256":
            enc_cipher = "aesv3"
            file_key = hashlib.sha256(
                b"synth-file-key-%d-%d" % (seed, n_pages)
            ).digest()
            s16 = hashlib.md5(b"u-salts-%d-%d" % (seed, n_pages)).digest()
            vsalt, ksalt = s16[:8], s16[8:16]
            u_entry = _v5_password_hash(user_password, vsalt, b"", 6) + vsalt + ksalt
            ue = _aes_cbc_encrypt(
                _v5_password_hash(user_password, ksalt, b"", 6), bytes(16), file_key
            )
            o16 = hashlib.md5(b"o-salts-%d-%d" % (seed, n_pages)).digest()
            ovs, oks = o16[:8], o16[8:16]
            o_entry = _hash_2b(b"synth-owner", ovs, u_entry) + ovs + oks
            oe = _aes_cbc_encrypt(
                _hash_2b(b"synth-owner", oks, u_entry), bytes(16), file_key
            )
            # /Perms: single-block AES-ECB (== CBC, zero IV) of P + pad
            perms = _aes_cbc_encrypt(
                file_key,
                bytes(16),
                struct.pack("<i", p_flags) + b"\xff\xff\xff\xffTadb\x00\x00\x00\x00",
            )
            enc_obj = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
                b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
                % (
                    p_flags,
                    o_entry.hex().encode(),
                    u_entry.hex().encode(),
                    oe.hex().encode(),
                    ue.hex().encode(),
                    perms.hex().encode(),
                )
            )
        else:
            r, n, v = {
                "rc4-40": (2, 5, 1),
                "rc4-128": (3, 16, 2),
                "aes-128": (4, 16, 4),
            }[encrypt]
            enc_cipher = "aesv2" if encrypt == "aes-128" else "rc4"
            o_entry = _std_owner_entry(b"synth-owner", user_password, r, n)
            file_key = _std_file_key(o_entry, p_flags, file_id, r, n, user_password)
            u_entry = _std_user_entry(file_key, min(r, 3), file_id)
            cf = (
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
                if encrypt == "aes-128"
                else b""
            )
            enc_obj = (
                b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
                b"/O <%s> /U <%s>%s >>"
                % (
                    v,
                    r,
                    n * 8,
                    p_flags,
                    o_entry.hex().encode(),
                    u_entry.hex().encode(),
                    cf,
                )
            )

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ).encode("latin-1")

    def enc_payload(objnum: int, payload: bytes) -> bytes:
        if enc_cipher == "rc4":
            return _rc4(_object_key(file_key, objnum), payload)
        key = (
            _object_key(file_key, objnum, aes=True)
            if enc_cipher == "aesv2"
            else file_key
        )
        iv = hashlib.md5(b"iv-%d-%d-" % (seed, objnum) + payload[:16]).digest()
        return _aes_encrypt_pdf(key, iv, payload)

    def pstr(s: str, objnum: int) -> bytes:
        """A PDF string literal; encrypted (emitted hex) when the
        document is encrypted."""
        if file_key is None:
            return b"(" + esc(s) + b")"
        return b"<" + enc_payload(objnum, s.encode("latin-1")).hex().encode() + b">"

    def pstream(payload: bytes, objnum: int) -> bytes:
        return payload if file_key is None else enc_payload(objnum, payload)

    objs: dict[int, bytes] = {}
    n_fixed = 3  # catalog=1, pages=2, info=3
    page_ids = [n_fixed + 1 + i * 3 for i in range(n_pages)]

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % pid for pid in page_ids)
    objs[2] = b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    objs[3] = (
        b"<< /Title " + pstr(f"synthetic pdf {seed}", 3)
        + b" /Author " + pstr("crawl4ai-spark", 3)
        + b" /Producer " + pstr("synth_pdf", 3) + b" >>"
    )

    for i, pid in enumerate(page_ids):
        line1, line2 = synth_pdf_page_lines(i + 1, seed)
        if hex_strings:
            shown1 = b"<" + line1.encode("latin-1").hex().encode() + b"> Tj"
        else:
            shown1 = b"(" + esc(line1) + b") Tj"
        content = (
            b"BT /F1 12 Tf 50 700 Td " + shown1 + b" 0 -20 Td ("
            + esc(line2) + b") Tj ET"
        )
        if compress:
            payload = zlib.compress(content)
            stream_dict_tpl = b"<< /Length %d /Filter /FlateDecode >>"
        else:
            payload = content
            stream_dict_tpl = b"<< /Length %d >>"
        payload = pstream(payload, pid + 1)
        stream_dict = stream_dict_tpl % len(payload)
        annots = b" /Annots [%d 0 R]" % (pid + 2) if with_links else b""
        objs[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 << /Type /Font /Subtype /Type1 "
            b"/BaseFont /Helvetica >> >> >> /Contents %d 0 R" % (pid + 1)
        ) + annots + b" >>"
        objs[pid + 1] = (stream_dict, payload)
        if with_links:
            objs[pid + 2] = (
                b"<< /Type /Annot /Subtype /Link /Rect [50 680 300 700] "
                b"/A << /S /URI /URI "
                + pstr(synth_pdf_link(i + 1, seed), pid + 2)
                + b" >> >>"
            )

    if enc_obj is not None:
        objs[max(objs) + 1] = enc_obj
        enc_num = max(objs)

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        body = objs[num]
        out += b"%d 0 obj\n" % num
        if isinstance(body, tuple):
            d, payload = body
            out += d + b"\nstream\n" + payload + b"\nendstream"
        else:
            out += body
        out += b"\nendobj\n"
    xref_pos = len(out)
    max_num = max(objs)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    extra = b""
    if enc_obj is not None:
        idh = file_id.hex().encode()
        extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_num, idh, idh)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info 3 0 R" % (max_num + 1)
        + extra
        + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    )
    return bytes(out)


def synth_pdf_page_lines(page_number: int, seed: int) -> tuple[str, str]:
    """The two closed-form text lines synth_pdf draws on a page."""
    words = " ".join(
        f"w{(page_number * 7 + seed * 3 + j) % 23}" for j in range(8)
    )
    return (
        f"synthetic pdf seed {seed} page {page_number}",
        f"body {words} end",
    )


def synth_pdf_page_text(page_number: int, seed: int) -> str:
    """Exactly what parse_pdf extracts for a synth_pdf page."""
    a, b = synth_pdf_page_lines(page_number, seed)
    return a + "\n" + b


def synth_pdf_link(page_number: int, seed: int) -> str:
    return f"http://pdf{seed}.test/page/{page_number}"


# ── Spark operator ───────────────────────────────────────────────────────

PDF_PAGES_SCHEMA = (
    "doc_id long, page_number int, text string, links array<string>, "
    "n_pages int, title string, producer string, encrypted boolean, "
    "decode_ok boolean"
)


def extract_pdf_pages(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Distributed per-page PDF extraction: one output row per page
    (``PDF_PAGES_SCHEMA``), Arrow-batched ``mapInPandas``, poison-
    tolerant — an unparseable payload yields one ``decode_ok=false`` row
    instead of failing the batch (the contract every decoder in this
    engine follows; see operators/multimodal.py)."""
    import pandas as pd

    cols = [id_col, payload_col]

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    parsed = parse_pdf(bytes(payload))
                    for page in parsed["pages"]:
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "page_number": page["page_number"],
                                "text": page["text"],
                                "links": page["links"],
                                "n_pages": parsed["n_pages"],
                                "title": parsed["title"],
                                "producer": parsed["producer"],
                                "encrypted": parsed["encrypted"],
                                "decode_ok": True,
                            }
                        )
                    if not parsed["pages"]:
                        raise ValueError("PDF with zero pages")
                except (ValueError, IndexError, KeyError, OverflowError):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "page_number": 0,
                            "text": "",
                            "links": [],
                            "n_pages": 0,
                            "title": None,
                            "producer": None,
                            "encrypted": False,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "page_number", "text", "links", "n_pages",
                    "title", "producer", "encrypted", "decode_ok",
                ],
            )

    return df.select(*cols).mapInPandas(run, PDF_PAGES_SCHEMA)
