"""WARC source connector: write the deterministic corpus as WARC (plain and
gzip-member layouts), read it back through the Spark source, and run the
full extraction to byte-identity — the Common-Crawl-native path end to end."""

import pytest
from pyspark.sql import functions as F

from pbx_ds_ocr_server_spark.corpus import make_warc, synthesize_row
from pbx_ds_ocr_server_spark.operators.extract import extract
from pbx_ds_ocr_server_spark.sources.warc import parse_warc, read_warc


@pytest.fixture(scope="module")
def warc_rows():
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    return [synthesize_row(i, text.strip(), "en") for i in range(40)]


def test_parse_roundtrip_plain(warc_rows):
    blob = make_warc(warc_rows)
    parsed = parse_warc(blob)
    assert len(parsed) == len(warc_rows)
    for got, want in zip(parsed, warc_rows):
        assert got["url"] == want["url"]
        assert got["html"] == want["html"]
        assert got["warc_ts"] == want["warc_ts"]


def test_parse_roundtrip_gzip_members(warc_rows):
    blob = make_warc(warc_rows, gzip_members=True)
    parsed = parse_warc(blob)
    assert len(parsed) == len(warc_rows)
    assert all(g["html"] == w["html"] for g, w in zip(parsed, warc_rows))


def test_non_response_records_skipped(warc_rows):
    blob = make_warc(warc_rows[:2])
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x.example/\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    assert len(parse_warc(req + blob)) == 2


def test_truncated_warc_no_crash():
    assert parse_warc(b"WARC/1.0\r\nWARC-Type: resp") == []
    assert parse_warc(b"") == []


def test_write_warc_round_trip(spark, warc_rows, tmp_path):
    """write_warc is the inverse of read_warc: export → re-read must give
    byte-identical payloads per url (both gzip-member and plain layouts)."""
    from pbx_ds_ocr_server_spark.sources.warc import write_warc

    src = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytearray(r["html"])) for r in warc_rows],
        "url string, warc_ts timestamp, html binary",
    ).repartition(3)
    for gz in (True, False):
        out = str(tmp_path / f"sink_{gz}")
        n_files = write_warc(src, out, gzip_members=gz)
        assert 1 <= n_files <= 3
        back = read_warc(spark, out + "/*")
        got = {r.url: bytes(r.html) for r in back.collect()}
        want = {r["url"]: r["html"] for r in warc_rows}
        assert got == want


def test_write_warc_content_type_and_null_payloads(spark, tmp_path):
    """Curated exports carry non-HTML payloads: the HTTP Content-Type must
    follow the payload magic, and a null html row must export as an empty
    body instead of failing the partition task (round-3 ADVICE finding)."""
    from pbx_ds_ocr_server_spark.corpus import make_pdf, pdf_pages_for
    from pbx_ds_ocr_server_spark.sources.warc import write_warc

    pdf_bytes = make_pdf(pdf_pages_for("pdf body words", 1))
    ts = __import__("datetime").datetime(2024, 1, 2, 3, 4, 5)
    rows = [
        ("https://x.example/page", ts, bytearray(b"<html><p>hi</p></html>")),
        ("https://x.example/doc.pdf", ts, bytearray(pdf_bytes)),
        ("https://x.example/null", None, None),  # null ts AND payload
    ]
    src = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).coalesce(1)
    out = str(tmp_path / "typed")
    assert write_warc(src, out, gzip_members=False) == 1
    raw = next((tmp_path / "typed").glob("*.warc")).read_bytes()
    assert b"Content-Type: application/pdf" in raw
    assert b"Content-Type: text/html" in raw
    back = {r.url: bytes(r.html) for r in read_warc(spark, out + "/*").collect()}
    assert back["https://x.example/doc.pdf"] == pdf_bytes
    assert back["https://x.example/null"] == b""


def test_warc_record_bytes_non_latin1_content_type_falls_back():
    """A caller-supplied content_type outside latin-1 must not raise (one
    bad metadata value would kill the whole export task) — it falls back
    to the magic-sniffed type (round-4 ADVICE finding)."""
    from pbx_ds_ocr_server_spark.corpus import warc_record_bytes

    rec = warc_record_bytes(
        {
            "url": "https://x.example/bad-meta",
            "warc_ts": None,
            "html": b"<html><p>ok</p></html>",
            "content_type": "text/html; charset=текст",
        }
    )
    assert b"Content-Type: text/html\r\n" in rec


def test_spark_read_and_extract_byte_identity(spark, warc_rows, tmp_path):
    half = len(warc_rows) // 2
    (tmp_path / "a.warc").write_bytes(make_warc(warc_rows[:half]))
    (tmp_path / "b.warc.gz").write_bytes(
        make_warc(warc_rows[half:], gzip_members=True)
    )
    pages = read_warc(spark, str(tmp_path) + "/*")
    assert pages.count() == len(warc_rows)
    result = extract(pages).filter(F.col("status") == "succeeded")
    expected = {r["url"]: r["expected_text"] for r in warc_rows}
    for row in result.collect():
        if expected[row.url] is not None:
            assert row.text == expected[row.url]


def test_missing_content_length_does_not_fabricate_records_from_body():
    """Tenth-review fix: a record without Content-Length has an unknown
    body extent; the scan must resume at the next record BOUNDARY, not
    inside this record's body, where a page that merely MENTIONS the
    WARC format would be parsed as a real record."""
    body_with_mention = (
        b"<html>The WARC format header looks like: WARC/1.0\r\n"
        b"WARC-Type: response\r\nWARC-Target-URI: http://fake.example/\r\n"
        b"Content-Length: 5\r\n\r\nAAAAA and more text</html>"
    )
    broken = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://broken.example/\r\n"
        b"\r\n" + body_with_mention + b"\r\n\r\n"
    )
    good_body = b"<html>real</html>"
    good = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://good.example/\r\n"
        + f"Content-Length: {len(good_body)}\r\n\r\n".encode()
        + good_body + b"\r\n\r\n"
    )
    rows = parse_warc(broken + good)
    urls = [r["url"] for r in rows]
    assert "http://fake.example/" not in urls
    assert urls == ["http://good.example/"]


def test_write_warc_failed_attempt_removes_tmp(spark, tmp_path):
    """Twelfth-review fix: attempt-suffixed tmp names mean retries never
    overwrite a failed attempt's leftover, so a failed task must unlink
    its own tmp or out_dir is littered permanently. Inject a failure
    AFTER the first record is written (None url → TypeError in
    warc_record_bytes) and assert no orphan survives."""
    import glob
    import os

    from pbx_ds_ocr_server_spark.sources.warc import write_warc

    out = str(tmp_path / "warc_fail")
    df = spark.createDataFrame(
        [
            ("http://ok.example/", None, bytearray(b"<html>ok</html>")),
            (None, None, bytearray(b"<html>boom</html>")),
        ],
        "url string, warc_ts timestamp, html binary",
    ).coalesce(1)
    with pytest.raises(Exception):
        write_warc(df, out)
    assert glob.glob(os.path.join(out, "*.tmp")) == []
    assert glob.glob(os.path.join(out, "*.warc.gz")) == []  # nothing committed
