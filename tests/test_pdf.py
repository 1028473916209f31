"""Clean-room PDF extraction (extraction/pdf.py): parser round-trips
against the deterministic synth_pdf mirror encoder, content-stream
string/escape semantics, tolerant parsing fallbacks, and the
poison-tolerant Spark operator (reference surface:
processors/pdf/processor.py NaivePDFProcessorStrategy via pypdf)."""

import hashlib
import zlib

import pytest

from crawl4ai_spark.extraction.pdf import (
    parse_pdf,
    synth_pdf,
    synth_pdf_link,
    synth_pdf_page_lines,
    synth_pdf_page_text,
)

from tests.conftest import spark  # noqa: F401


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"compress": False},
        {"hex_strings": True},
        {"with_links": False},
        {"n_pages": 5, "seed": 9},
    ],
)
def test_parse_pdf_roundtrips_synth_variants(kw):
    n = kw.get("n_pages", 2)
    seed = kw.get("seed", 0)
    doc = parse_pdf(synth_pdf(**kw))
    assert doc["n_pages"] == n
    assert doc["title"] == f"synthetic pdf {seed}"
    assert doc["author"] == "crawl4ai-spark"
    assert doc["producer"] == "synth_pdf"
    assert not doc["encrypted"]
    for p in doc["pages"]:
        assert p["text"] == synth_pdf_page_text(p["page_number"], seed)
        if kw.get("with_links", True):
            assert p["links"] == [synth_pdf_link(p["page_number"], seed)]
        else:
            assert p["links"] == []


def _splice_content(seed: int, new_content: bytes) -> bytes:
    """Replace page 1's (uncompressed) content stream with raw operators."""
    pdf = synth_pdf(1, seed, compress=False)
    l1, l2 = synth_pdf_page_lines(1, seed)
    orig = (
        "BT /F1 12 Tf 50 700 Td (" + l1 + ") Tj 0 -20 Td (" + l2 + ") Tj ET"
    ).encode("latin-1")
    assert orig in pdf
    return pdf.replace(orig, new_content)


def test_string_escapes_and_line_ops():
    # \( \) \\ octal \101='A' \12='\n'-in-string, T* newline, ' shows on
    # a new line, TJ concatenates array strings ignoring kern numbers
    content = (
        rb"BT (a\(b\)c\\d\101) Tj T* (f) Tj "
        rb"(next) ' [(x) -250 (y) 120 (z)] TJ ET"
    )
    doc = parse_pdf(_splice_content(0, content))
    # TJ continues the line the ' op opened — no line move of its own
    assert doc["pages"][0]["text"] == "a(b)c\\dA\nf\nnextxyz"


def test_hex_strings_and_octal_overflow():
    content = rb"BT <48656C6C6F2> Tj (\377) Tj ET"  # odd hex pads with 0
    doc = parse_pdf(_splice_content(0, content))
    assert doc["pages"][0]["text"] == "Hello \xff"


def test_indirect_length_and_multiple_content_streams():
    """/Length as an indirect ref and /Contents as an array of streams."""
    c1 = b"BT (part one) Tj ET"
    c2 = b"BT (part two) Tj ET"
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 6 0 R] >>\nendobj\n",
        b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + c1 + b"\nendstream\nendobj\n",
        b"5 0 obj\n" + str(len(c1)).encode() + b"\nendobj\n",
        b"6 0 obj\n<< /Length " + str(len(c2)).encode() + b" >>\nstream\n" + c2
        + b"\nendstream\nendobj\n",
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n",
    ]
    doc = parse_pdf(b"".join(parts))
    assert doc["n_pages"] == 1
    assert doc["pages"][0]["text"] == "part one\npart two"


def test_broken_xref_and_missing_trailer_fallback():
    """A body with no trailer/catalog still extracts pages in object
    order (the tolerant posture for truncated web PDFs)."""
    content = zlib.compress(b"BT (rescued) Tj ET")
    pdf = b"".join(
        [
            b"%PDF-1.4\n",
            b"7 0 obj\n<< /Type /Page /Contents 8 0 R >>\nendobj\n",
            b"8 0 obj\n<< /Length " + str(len(content)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + content
            + b"\nendstream\nendobj\n",
        ]
    )
    doc = parse_pdf(pdf)
    assert doc["n_pages"] == 1 and doc["pages"][0]["text"] == "rescued"
    assert doc["title"] is None


def test_additional_filters_and_inline_image_skip():
    """ASCIIHex / ASCII85 / RunLength filter chains decode, and a BI..EI
    inline image's binary body never leaks into the extracted text."""
    import base64

    content = b"BT (before) Tj BI /W 2 /H 2 /BPC 8 ID \x00\xff(\\junk ET EI (after) Tj ET"
    # splice as an uncompressed stream first: inline image skip
    doc = parse_pdf(_splice_content(0, content))
    # same line (no line-move op after EI); the binary body never leaks
    assert doc["pages"][0]["text"] == "beforeafter"

    plain = b"BT (filtered) Tj ET"

    def one_filter_pdf(fname: str, body: bytes) -> bytes:
        return b"".join(
            [
                b"%PDF-1.4\n",
                b"1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n",
                b"2 0 obj\n<< /Length " + str(len(body)).encode()
                + b" /Filter " + fname.encode() + b" >>\nstream\n" + body
                + b"\nendstream\nendobj\n",
            ]
        )

    hex_body = plain.hex().encode() + b">"
    assert parse_pdf(one_filter_pdf("/ASCIIHexDecode", hex_body))["pages"][0][
        "text"
    ] == "filtered"
    a85_body = base64.a85encode(plain) + b"~>"
    assert parse_pdf(one_filter_pdf("/ASCII85Decode", a85_body))["pages"][0][
        "text"
    ] == "filtered"
    # RunLength: literal run (len-1 prefix) + EOD marker 128
    rl_body = bytes([len(plain) - 1]) + plain + b"\x80"
    assert parse_pdf(one_filter_pdf("/RunLengthDecode", rl_body))["pages"][0][
        "text"
    ] == "filtered"
    # RunLength replicate run: 257-250=7 copies of 'x'
    rl2 = bytes([250]) + b"x" + b"\x80"
    pdf2 = one_filter_pdf("/RunLengthDecode", bytes([1]) + b"BT" + rl2)
    # decoded stream is "BT" + "x"*7 — no text ops, but must not crash
    assert parse_pdf(pdf2)["pages"][0]["text"] == ""


def _lzw_encode_pdf(data: bytes, early_change: int = 1) -> bytes:
    """Independent MSB-first TIFF-LZW mirror encoder for the filter test."""
    clear, eod = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = eod + 1
    code_size = 9
    emit(clear, code_size)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code >= (1 << code_size) - early_change and code_size < 12:
            code_size += 1
        if next_code >= 4095:  # mid-stream clear before the table fills
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(256)}
            next_code = eod + 1
            code_size = 9
        run = bytes([b])
    if run:
        emit(table[run], code_size)
    emit(eod, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_filter_roundtrip():
    import random

    from crawl4ai_spark.extraction.pdf import _lzw_decode_pdf

    rng = random.Random(5)
    for n in (10, 500, 20000):
        data = bytes(rng.randrange(8) for _ in range(n))  # repetitive
        assert _lzw_decode_pdf(_lzw_encode_pdf(data)) == data, n
    content = b"BT (lzw filtered) Tj ET"
    body = _lzw_encode_pdf(content)
    pdf = b"".join(
        [
            b"%PDF-1.4\n",
            b"1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n",
            b"2 0 obj\n<< /Length " + str(len(body)).encode()
            + b" /Filter /LZWDecode >>\nstream\n" + body
            + b"\nendstream\nendobj\n",
        ]
    )
    assert parse_pdf(pdf)["pages"][0]["text"] == "lzw filtered"


def test_encrypted_flagged_not_decrypted():
    """/Encrypt pointing at a non-Standard dict: flagged, nothing
    readable, nothing leaked."""
    pdf = synth_pdf(1, 3)
    pdf = pdf.replace(
        b"/Root 1 0 R /Info 3 0 R", b"/Root 1 0 R /Info 3 0 R /Encrypt 3 0 R"
    )
    doc = parse_pdf(pdf)
    assert doc["encrypted"] and doc["pages"][0]["text"] == ""
    assert doc["title"] is None


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128", "aes-256"])
@pytest.mark.parametrize(
    "kw",
    [{}, {"hex_strings": True}, {"compress": False}, {"with_links": False}],
)
def test_encrypted_decrypts_transparently(mode, kw):
    """Standard Security Handler — RC4 (/V 1 /R 2, /V 2 /R 3), AES-128
    (/V 4 /R 4 /AESV2) and AES-256 (/V 5 /R 6 /AESV3) — with an empty
    user password: pages, links, and /Info must equal the unencrypted
    document's byte-for-byte (ISO 32000-1 §7.6.3 Algorithms 1-5;
    ISO 32000-2 §7.6.4 Algorithms 2.A/2.B/8)."""
    plain = parse_pdf(synth_pdf(3, seed=11, **kw))
    doc = parse_pdf(synth_pdf(3, seed=11, encrypt=mode, **kw))
    assert doc["encrypted"] is True
    for k in ("n_pages", "title", "author", "producer", "pages"):
        assert doc[k] == plain[k]


@pytest.mark.parametrize("mode", ["rc4-128", "aes-128", "aes-256"])
def test_nonempty_user_password_stays_locked(mode):
    doc = parse_pdf(
        synth_pdf(2, seed=7, encrypt=mode, user_password=b"secret")
    )
    assert doc["encrypted"] is True and doc["n_pages"] == 2
    assert all(p["text"] == "" and p["links"] == [] for p in doc["pages"])
    assert doc["title"] is None and doc["producer"] is None


def test_aes_fips197_known_answer_vectors():
    """The clean-room AES core must reproduce the published FIPS-197
    appendix-C cipher examples (and invert them)."""
    from crawl4ai_spark.extraction.pdf import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _aes_round_keys,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for key, ct_hex in [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]:
        rk, nr = _aes_round_keys(key)
        assert bytes(_aes_encrypt_block(rk, nr, list(pt))).hex() == ct_hex
        assert bytes(_aes_decrypt_block(rk, nr, list(bytes.fromhex(ct_hex)))) == pt


def test_rc4_encrypted_objstm_layout():
    """Encryption × modern layout: the /ObjStm container decrypts as a
    stream; its embedded objects' strings are NOT individually encrypted
    (spec), while direct body streams/strings are."""
    from crawl4ai_spark.extraction.pdf import (
        _object_key,
        _rc4,
        _std_file_key,
        _std_owner_entry,
        _std_user_entry,
    )

    r, n = 3, 16
    file_id = hashlib.md5(b"objstm-enc-id").digest()
    o_entry = _std_owner_entry(b"synth-owner", b"", r, n)
    key = _std_file_key(o_entry, -44, file_id, r, n, b"")
    u_entry = _std_user_entry(key, r, file_id)

    content = b"BT (modern encrypted) Tj ET"
    embedded = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        (4, b"<< /Title (objstm enc title) /Producer (mirror) >>"),
    ]
    offsets, body = [], b""
    for num, obj in embedded:
        offsets.append((num, len(body)))
        body += obj + b" "
    header = " ".join(f"{nu} {o}" for nu, o in offsets).encode() + b" "
    objstm = _rc4(_object_key(key, 6), zlib.compress(header + body))
    enc_content = _rc4(_object_key(key, 5), content)
    idh = file_id.hex().encode()
    parts = [
        b"%PDF-1.5\n",
        b"6 0 obj\n<< /Type /ObjStm /N 4 /First " + str(len(header)).encode()
        + b" /Length " + str(len(objstm)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + objstm
        + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Length " + str(len(enc_content)).encode()
        + b" >>\nstream\n" + enc_content + b"\nendstream\nendobj\n",
        b"8 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O <"
        + o_entry.hex().encode() + b"> /U <" + u_entry.hex().encode()
        + b"> >>\nendobj\n",
        b"7 0 obj\n<< /Type /XRef /Size 9 /Root 1 0 R /Info 4 0 R "
        b"/Encrypt 8 0 R /ID [<" + idh + b"> <" + idh + b">] "
        b"/W [1 2 1] /Length 2 >>\nstream\n\x00\x00\nendstream\nendobj\n",
        b"startxref\n0\n%%EOF\n",
    ]
    doc = parse_pdf(b"".join(parts))
    assert doc["encrypted"] is True
    assert doc["n_pages"] == 1
    assert doc["pages"][0]["text"] == "modern encrypted"
    assert doc["title"] == "objstm enc title" and doc["producer"] == "mirror"


def test_utf16be_metadata_string():
    pdf = synth_pdf(1, 0)
    title_utf16 = b"\xfe\xff" + "Tïtle".encode("utf-16-be")
    pdf = pdf.replace(b"(synthetic pdf 0)", b"<" + title_utf16.hex().encode() + b">")
    assert parse_pdf(pdf)["title"] == "Tïtle"


def test_tounicode_cmap_two_byte_codes():
    """A subset-embedded font with a /ToUnicode CMap (the modern-writer
    layout): 2-byte codes map through bfchar + both bfrange forms; a
    Tf switch to a CMap-less font falls back to Latin-1; unmapped codes
    become U+FFFD."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <00DC> <0002> <006E> endbfchar\n"
        b"1 beginbfrange <0010> <0012> <0061> endbfrange\n"        # a b c
        b"1 beginbfrange <0020> <0021> [<20AC> <D83DDE00>] endbfrange\n"
        b"endcmap\n"
    )
    # shown 2-byte codes: 0001 0002 0010 0011 0012 0020 0021 0099
    shown = b"\x00\x01\x00\x02\x00\x10\x00\x11\x00\x12\x00\x20\x00\x21\x00\x99"
    content = (
        b"BT /FU 12 Tf <" + shown.hex().encode() + b"> Tj "
        b"/F1 12 Tf (plain) Tj ET"
    )
    parts = [
        b"%PDF-1.5\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /FU 5 0 R /F1 << /Subtype /Type1 >> >> >>"
        b" >>\nendobj\n",
        b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Subtype /Type0 /ToUnicode 6 0 R >>\nendobj\n",
        b"6 0 obj\n<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n",
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n",
    ]
    doc = parse_pdf(b"".join(parts))
    # \U0001F600 arrives via the surrogate-pair bfrange entry
    assert doc["pages"][0]["text"] == "Ünabc€\U0001F600�plain"


def test_objstm_layout_modern_pdf():
    """PDF 1.5+ layout: catalog/pages/page/info dicts live INSIDE a
    compressed /ObjStm container (no 'N 0 obj' markers of their own) and
    the trailer is an xref STREAM dict, not a trailer keyword. The body
    scan alone would see zero pages; ObjStm expansion + /Type /XRef
    trailer fallback must recover everything."""
    content = b"BT (modern layout) Tj ET"
    embedded = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        (4, b"<< /Title (objstm title) /Producer (mirror) >>"),
    ]
    offsets, body = [], b""
    for num, obj in embedded:
        offsets.append((num, len(body)))
        body += obj + b" "
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b" "
    objstm_raw = header + body
    objstm = zlib.compress(objstm_raw)
    parts = [
        b"%PDF-1.5\n",
        b"6 0 obj\n<< /Type /ObjStm /N 4 /First " + str(len(header)).encode()
        + b" /Length " + str(len(objstm)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + objstm
        + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n",
        # xref stream dict carries /Root + /Info; its data is irrelevant
        # to the body scan, so a stub stream suffices
        b"7 0 obj\n<< /Type /XRef /Size 8 /Root 1 0 R /Info 4 0 R "
        b"/W [1 2 1] /Length 2 >>\nstream\n\x00\x00\nendstream\nendobj\n",
        b"startxref\n0\n%%EOF\n",
    ]
    doc = parse_pdf(b"".join(parts))
    assert doc["n_pages"] == 1
    assert doc["pages"][0]["text"] == "modern layout"
    assert doc["title"] == "objstm title" and doc["producer"] == "mirror"


def test_malformed_inputs_raise():
    for bad in (b"", b"not a pdf", b"%PDF-1.4\njunk", synth_pdf(2, 1)[:150]):
        with pytest.raises(ValueError):
            doc = parse_pdf(bad)
            if not doc["pages"]:  # header-only shells must not pass silently
                raise ValueError("no pages")


def test_extract_pdf_pages_distributed_poison_tolerant(spark):  # noqa: F811
    from crawl4ai_spark.extraction.pdf import extract_pdf_pages

    rows = [
        (0, bytearray(synth_pdf(3, seed=4))),
        (1, bytearray(b"%PDF-1.4\ngarbage everywhere")),
        (2, bytearray(synth_pdf(1, seed=5, hex_strings=True))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(3)
    got = extract_pdf_pages(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 3 and all(r.decode_ok for r in by_doc[0])
    assert sorted(r.page_number for r in by_doc[0]) == [1, 2, 3]
    for r in by_doc[0]:
        assert r.text == synth_pdf_page_text(r.page_number, 4)
        assert list(r.links) == [synth_pdf_link(r.page_number, 4)]
        assert r.title == "synthetic pdf 4" and r.n_pages == 3
    assert len(by_doc[1]) == 1 and not by_doc[1][0].decode_ok
    assert by_doc[1][0].text == "" and by_doc[1][0].n_pages == 0
    assert by_doc[2][0].decode_ok
    assert by_doc[2][0].text == synth_pdf_page_text(1, 5)
