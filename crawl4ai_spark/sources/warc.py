"""WARC (Web ARChive, ISO 28500) ingestion: real Common-Crawl dumps →
the engine's ``pages`` table shape (url, warc_ts, html, text, lang).

The reference consumes Common Crawl through its INDEX api
(``async_url_seeder.py`` — URL discovery only); this source closes the
content side: read the actual ``.warc.gz`` files CC publishes, pull the
``response`` records, and emit one row per captured page. Pure stdlib:

- gzip member framing: CC WARCs are MULTI-MEMBER gzip (one member per
  record — that is what makes them splittable by offset); stdlib zlib
  decompresses member-by-member with ``Z_FINISH``-independent streaming
  (``unused_data`` hands back the next member's start). Plain
  uncompressed ``.warc`` bytes parse too.
- record framing: ``WARC/1.x`` header block (CRLF-terminated, ends at a
  blank line), ``Content-Length`` octet-exact body, two CRLF record
  separators.
- response records: body = full HTTP response; headers split at the
  first CRLFCRLF; the payload is the HTML. ``Content-Type`` filtering
  keeps ``text/html`` (+ anything when ``keep_all``); HTTP status
  recorded so the politeness loop's throttle path (429/503) works on
  replayed corpora.
- charset: decoded best-effort from the HTTP header / meta sniff
  (utf-8 first, then latin-1 fallback — never raises).

Distributed shape: ``spark.read.format("binaryFile")`` lists the
``.warc.gz`` objects (one task per file — CC segment files are ~1 GB,
the natural parallel unit), and a ``mapInPandas`` pass splits records
inside each task. No driver-side I/O, no Python in the row hot path
beyond the Arrow batch. For 100 TB: the file listing is the only
driver-side metadata; everything else scales with executors.
"""

from __future__ import annotations

import re
import zlib

WARC_PAGES_SCHEMA = (
    "url string, warc_ts string, html binary, status_code int, "
    "content_type string, warc_file string"
)

_CHARSET_RE = re.compile(rb"charset=([A-Za-z0-9_\-]+)", re.I)


def iter_gzip_members(data: bytes, chunk: int = 1 << 20):
    """Yield decompressed members of a (possibly multi-member) gzip blob;
    non-gzip input yields itself once (plain .warc).

    Feeds the decompressor bounded zero-copy memoryview slices instead of
    ``data[pos:]`` — a CC segment is ~1 GB with ~50k members, and a
    tail-slice per member is O(n²) memcpy (petabytes per file); this is
    O(n) with ``unused_data`` bounded by ``chunk``."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    buf = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n and data[pos] == 0x1F and data[pos + 1 : pos + 2] == b"\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = bytearray()
        p = pos
        try:
            while not d.eof and p < n:
                out += d.decompress(buf[p : p + chunk])
                p += chunk
        except zlib.error as exc:
            raise ValueError(f"bad gzip member at offset {pos}") from exc
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield bytes(out)
        next_pos = min(p, n) - len(d.unused_data)
        if next_pos <= pos:
            break
        pos = next_pos


def iter_warc_records(payload: bytes):
    """Yield ``(headers: dict, body: bytes)`` per WARC record across all
    gzip members. Header names are lower-cased; bodies are
    Content-Length exact."""
    for member in iter_gzip_members(payload):
        pos = 0
        n = len(member)
        while pos < n:
            # tolerate stray separators between records
            while pos < n and member[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                break
            if not member.startswith(b"WARC/", pos):
                raise ValueError(f"bad WARC record header at offset {pos}")
            head_end = member.find(b"\r\n\r\n", pos)
            if head_end < 0:
                raise ValueError("truncated WARC header block")
            headers: dict[str, str] = {}
            lines = member[pos:head_end].split(b"\r\n")
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError as exc:
                raise ValueError("WARC record without Content-Length") from exc
            body_start = head_end + 4
            body = member[body_start : body_start + length]
            if len(body) < length:
                raise ValueError("truncated WARC record body")
            yield headers, body
            pos = body_start + length


def split_http_response(body: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """HTTP response bytes → (status_code, headers lower-cased, payload)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body.startswith(b"HTTP/"):
        return None, {}, body
    head = body[:sep].split(b"\r\n")
    m = re.match(rb"HTTP/\d\.\d\s+(\d{3})", head[0])
    status = int(m.group(1)) if m else None
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return status, headers, body[sep + 4 :]


def warc_response_rows(payload: bytes, warc_file: str = "") -> list[dict]:
    """All ``response`` records of one WARC blob → page-row dicts."""
    rows = []
    for headers, body in iter_warc_records(payload):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        status, http_headers, html = split_http_response(body)
        rows.append(
            {
                "url": url,
                "warc_ts": headers.get("warc-date"),
                "html": html,
                "status_code": status,
                "content_type": http_headers.get("content-type"),
                "warc_file": warc_file,
            }
        )
    return rows


def decode_html_text(html: bytes, content_type: str | None) -> str:
    """Charset-sniffed best-effort decode (HTTP header, then meta tag,
    then utf-8 → latin-1 fallback). Never raises."""
    charset = None
    if content_type:
        m = _CHARSET_RE.search(content_type.encode("latin-1"))
        if m:
            charset = m.group(1).decode("ascii")
    if charset is None:
        m = _CHARSET_RE.search(html[:2048])
        if m:
            charset = m.group(1).decode("ascii")
    for enc in filter(None, (charset, "utf-8")):
        try:
            return html.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return html.decode("latin-1", errors="replace")


def read_warc_pages(
    spark,
    path: str,
    html_only: bool = True,
    keep_statuses: tuple[int, ...] | None = None,
):
    """``.warc`` / ``.warc.gz`` files under ``path`` → DataFrame of
    captured pages (``WARC_PAGES_SCHEMA``). One binaryFile task per WARC
    object (the CC-segment parallel unit); record splitting + HTTP
    parsing happen inside an Arrow ``mapInPandas`` pass. A malformed
    file contributes zero rows plus one ``url=NULL`` poison row carrying
    the file name (the engine's poison-tolerance contract) instead of
    failing the job.

    ``html_only`` keeps ``text/html`` responses (CC response segments
    also carry images/robots captures); ``keep_statuses`` optionally
    restricts by HTTP status (None = keep all, so 429/503 replay into
    the politeness loop's throttle path).
    """
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    recs = warc_response_rows(bytes(blob), fpath)
                except ValueError:
                    rows.append(
                        {
                            "url": None,
                            "warc_ts": None,
                            "html": b"",
                            "status_code": None,
                            "content_type": None,
                            "warc_file": fpath,
                        }
                    )
                    continue
                for r in recs:
                    ct = (r["content_type"] or "").lower()
                    if html_only and not ct.startswith("text/html"):
                        continue
                    if keep_statuses is not None and r["status_code"] not in keep_statuses:
                        continue
                    rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "html", "status_code",
                    "content_type", "warc_file",
                ],
            )

    return files.mapInPandas(run, WARC_PAGES_SCHEMA)


# ── deterministic fixture encoder (test mirror) ──────────────────────────


def synth_warc(
    pages: list[tuple[str, str, bytes]],
    gzip_members: bool = True,
    with_warcinfo: bool = True,
    charset: str | None = None,
) -> bytes:
    """Build a spec-shaped WARC blob: optional ``warcinfo`` record, one
    ``response`` record per (url, ts, html) with a full HTTP/1.1 header
    block. ``gzip_members=True`` emits one gzip member per record — the
    Common Crawl layout."""
    import gzip

    def record(rtype: str, extra: dict[str, str], body: bytes) -> bytes:
        head = [f"WARC/1.0", f"WARC-Type: {rtype}"]
        head += [f"{k}: {v}" for k, v in extra.items()]
        head.append(f"Content-Length: {len(body)}")
        return (
            "\r\n".join(head).encode("latin-1")
            + b"\r\n\r\n" + body + b"\r\n\r\n"
        )

    records = []
    if with_warcinfo:
        info = b"software: crawl4ai-spark-synth\r\n"
        records.append(
            record("warcinfo", {"WARC-Record-ID": "<urn:uuid:info>"}, info)
        )
    for url, ts, html in pages:
        ct = "text/html" + (f"; charset={charset}" if charset else "")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ct.encode("latin-1")
            + b"\r\nContent-Length: " + str(len(html)).encode()
            + b"\r\n\r\n" + html
        )
        records.append(
            record(
                "response",
                {
                    "WARC-Target-URI": url,
                    "WARC-Date": ts,
                    "WARC-Record-ID": f"<urn:uuid:{abs(hash(url)) % 10**12}>",
                },
                http,
            )
        )
    if gzip_members:
        return b"".join(
            gzip.compress(r, compresslevel=6, mtime=0) for r in records
        )
    return b"".join(records)
