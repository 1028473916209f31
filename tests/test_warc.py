"""WARC ingestion (sources/warc.py): Common-Crawl-layout .warc.gz files
→ the engine's pages shape, distributed via binaryFile + mapInPandas,
with the poison-tolerance contract and an end-to-end hand-off into the
extraction UDF path."""

import os

import pytest

from crawl4ai_spark.sources.warc import (
    decode_html_text,
    iter_gzip_members,
    iter_warc_records,
    read_warc_pages,
    synth_warc,
    warc_response_rows,
)

from tests.conftest import spark  # noqa: F401


PAGES = [
    ("http://a.test/1", "2026-01-01T00:00:00Z", b"<html><body><p>one</p></body></html>"),
    ("http://b.test/2", "2026-01-02T00:00:00Z", b"<html><body><p>two</p></body></html>"),
    ("http://c.test/3", "2026-01-03T00:00:00Z", b"<html><body><p>three</p></body></html>"),
]


def test_multi_member_gzip_framing():
    blob = synth_warc(PAGES, gzip_members=True)
    members = list(iter_gzip_members(blob))
    assert len(members) == 4  # warcinfo + 3 responses: one member each
    # plain concatenation of members parses identically to the raw form
    raw = synth_warc(PAGES, gzip_members=False)
    assert b"".join(members) == raw


def test_response_rows_and_non_response_filtering():
    rows = warc_response_rows(synth_warc(PAGES), "seg-0.warc.gz")
    assert [r["url"] for r in rows] == [p[0] for p in PAGES]
    assert all(r["status_code"] == 200 for r in rows)
    assert all(r["content_type"].startswith("text/html") for r in rows)
    assert [r["html"] for r in rows] == [p[2] for p in PAGES]
    assert rows[0]["warc_ts"] == "2026-01-01T00:00:00Z"


def test_charset_decode_paths():
    latin = "prix fixe café".encode("latin-1")
    assert decode_html_text(latin, "text/html; charset=latin-1") == "prix fixe café"
    meta = b'<html><meta charset="utf-8"><body>caf\xc3\xa9</body></html>'
    assert "café" in decode_html_text(meta, "text/html")
    # undecodable under every hint: latin-1 fallback never raises
    assert decode_html_text(b"\xff\xfe\x00", None)


def test_malformed_warcs_raise():
    ok = synth_warc(PAGES)
    for bad in (b"NOT A WARC", ok[:40]):
        with pytest.raises(ValueError):
            list(iter_warc_records(bad))
    # bad gzip member
    with pytest.raises(ValueError):
        list(iter_gzip_members(b"\x1f\x8b" + b"\x00" * 30))


def test_read_warc_pages_distributed_poison_tolerant(spark, tmp_path):  # noqa: F811
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "seg-0.warc.gz"), "wb") as fh:
        fh.write(synth_warc(PAGES[:2], gzip_members=True))
    with open(os.path.join(d, "seg-1.warc"), "wb") as fh:
        fh.write(synth_warc(PAGES[2:], gzip_members=False))
    with open(os.path.join(d, "seg-bad.warc.gz"), "wb") as fh:
        fh.write(b"\x1f\x8b garbage that is not gzip at all")

    out = read_warc_pages(spark, d).collect()
    good = sorted((r for r in out if r.url is not None), key=lambda r: r.url)
    assert [r.url for r in good] == [p[0] for p in PAGES]
    assert [bytes(r.html) for r in good] == [p[2] for p in PAGES]
    assert all(r.status_code == 200 for r in good)
    poison = [r for r in out if r.url is None]
    assert len(poison) == 1 and poison[0].warc_file.endswith("seg-bad.warc.gz")


def test_warc_pages_feed_the_extraction_udf(spark, tmp_path):  # noqa: F811
    """End-to-end: WARC bytes → pages frame → the crawl engine's full
    extraction UDF — raw_markdown carries the page text."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.extraction.udfs import udf_full_extract

    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "seg.warc.gz"), "wb") as fh:
        fh.write(synth_warc(PAGES, gzip_members=True))
    pages = read_warc_pages(spark, d).where(F.col("url").isNotNull())
    ex = pages.select(
        "url", udf_full_extract("html", "url").alias("e")
    ).collect()
    got = {r.url: r.e.markdown.raw_markdown for r in ex}
    assert got["http://a.test/1"].strip() == "one"
    assert got["http://c.test/3"].strip() == "three"
