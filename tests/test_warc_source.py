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
