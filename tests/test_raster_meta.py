"""Raster metadata kernel: PNG tEXt/iTXt, JPEG COM/EXIF (FIXTURES §3c+)."""

import struct
import zlib

from pbx_ds_ocr_server_spark.corpus import make_jpeg, make_png
from pbx_ds_ocr_server_spark.kernels.raster_meta import (
    extract_raster_meta,
    jpeg_text_segments,
    png_text_chunks,
)


def test_png_text_chunks_round_trip():
    png = make_png([("Title", "My Doc"), ("Description", "héllo wörld")])
    assert png_text_chunks(png) == [
        ("Title", "My Doc"),
        ("Description", "héllo wörld"),
    ]


def test_png_itxt_utf8():
    png = make_png([("Description", "中文文本 here")])
    assert png_text_chunks(png) == [("Description", "中文文本 here")]


def test_png_compressed_itxt():
    comp = zlib.compress("deflated text".encode("utf-8"))
    data = b"Note\x00\x01\x00\x00\x00" + comp
    chunk = (
        len(data).to_bytes(4, "big") + b"iTXt" + data
        + zlib.crc32(b"iTXt" + data).to_bytes(4, "big")
    )
    png = make_png([])[:33] + chunk + make_png([])[33:]
    assert ("Note", "deflated text") in png_text_chunks(png)


def test_png_truncated_chunk_is_safe():
    png = make_png([("Title", "ok")])
    assert png_text_chunks(png[:-7]) == [("Title", "ok")]  # IEND crc cut
    assert png_text_chunks(png[:20]) == []


def test_jpeg_com_segments():
    jpg = make_jpeg(["first comment", "second comment"])
    assert jpeg_text_segments(jpg) == [
        ("com", "first comment"),
        ("com", "second comment"),
    ]


def _exif_app1(desc: str) -> bytes:
    """APP1 Exif segment with one IFD0 ImageDescription (0x010E) entry."""
    val = desc.encode("latin-1") + b"\x00"
    # II, magic 42, IFD at 8; 1 entry; value offset right after IFD
    ifd = struct.pack("<H", 1)
    entry = struct.pack("<HHII", 0x010E, 2, len(val), 8 + 2 + 12 + 4)
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd + entry + struct.pack("<I", 0) + val
    data = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(data) + 2).to_bytes(2, "big") + data


def test_jpeg_exif_image_description():
    jpg = b"\xff\xd8" + _exif_app1("shot of a harbor") + b"\xff\xd9"
    assert jpeg_text_segments(jpg) == [("exif:ImageDescription", "shot of a harbor")]


def test_extract_raster_meta_assembles_page():
    png = make_png([("Title", "A  Title"), ("Description", "body   text")])
    page = extract_raster_meta(png, "png")
    assert page.text == "A Title\n\nbody text"
    assert page.title == "A Title"
    assert [s.kind for s in page.spans] == ["meta", "meta"]
    raw = page.text.encode("utf-8")
    for s in page.spans:
        assert raw[s.start : s.end].decode() == s.text


def test_extract_raster_meta_none_when_no_text():
    assert extract_raster_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "png") is None
    assert extract_raster_meta(make_jpeg([]), "jpeg") is None


def test_jpeg_fill_byte_padding_before_markers():
    # 0xFF fill bytes before a marker are legal; the walker must not read
    # the length from the wrong offset
    data = "padded comment".encode("utf-8")
    jpg = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill bytes
        + b"\xff\xfe" + (len(data) + 2).to_bytes(2, "big") + data
        + b"\xff\xd9"
    )
    assert jpeg_text_segments(jpg) == [("com", "padded comment")]


def test_make_jpeg_long_comment_splits_segments():
    from pbx_ds_ocr_server_spark.corpus import make_jpeg, split_for_com

    text = "word " * 20000  # ~100KB, over the 65533-byte COM cap
    jpg = make_jpeg([text.strip()])
    got = jpeg_text_segments(jpg)
    assert len(got) == len(split_for_com(text.strip())) >= 2
    assert " ".join(v for _s, v in got) == text.strip()


def test_split_for_com_handles_oversized_single_token():
    from pbx_ds_ocr_server_spark.corpus import split_for_com

    blob = "x" * 150000  # one unbroken 150KB token
    chunks = split_for_com(blob)
    assert all(len(c.encode("utf-8")) <= 60000 for c in chunks)
    assert "".join(chunks) == blob
    # and multibyte chars never split mid-codepoint
    cjk = "中" * 30000  # 90KB utf-8
    chunks = split_for_com(cjk)
    assert all(len(c.encode("utf-8")) <= 60000 for c in chunks)
    assert "".join(chunks) == cjk
