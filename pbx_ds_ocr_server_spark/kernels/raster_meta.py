"""Raster (PNG/JPEG) metadata-text extraction kernel.

The reference's second input family is single-image OCR
(``/root/reference/app/services/dsocr_model.py:397-406``); per the north
rule there is no deterministic OCR, but raster files routinely CARRY text as
metadata — PNG ``tEXt``/``iTXt`` chunks, JPEG ``COM`` segments and EXIF
ASCII tags — so the raster branch extracts that instead of being a pure
no-op. Pure byte parsing (zlib only), deterministic, no image libraries.

Frozen output spec (mirrors the HTML/PDF kernels):
  * items are emitted in FILE ORDER (chunk/segment appearance)
  * each value is whitespace-collapsed (``" ".join(v.split())``); empties
    are skipped
  * items join with the page separator; spans carry kind ``meta`` and UTF-8
    byte offsets
  * the first PNG ``Title`` keyword (case-sensitive, per the PNG spec's
    registered keyword) becomes the document title
"""

from __future__ import annotations

import struct
import zlib

from pbx_ds_ocr_server_spark.config import DEFAULT_CONFIG, ExtractConfig
from pbx_ds_ocr_server_spark.kernels.html_extract import (
    PageResult,
    assemble_page,
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# EXIF IFD0 ASCII tags worth surfacing as text
_EXIF_ASCII_TAGS = {
    0x010E: "ImageDescription",
    0x013B: "Artist",
}


def png_text_chunks(payload: bytes) -> list[tuple[str, str]]:
    """(keyword, text) pairs from tEXt and iTXt chunks, in chunk order.

    tEXt is latin-1; iTXt is UTF-8 and may be zlib-deflated (compression
    flag 1, method 0). CRCs are not verified — a corrupt trailing CRC must
    not cost the text that already parsed."""
    out: list[tuple[str, str]] = []
    if len(payload) < 16 or not payload.startswith(_PNG_MAGIC):
        return out
    i = 8
    n = len(payload)
    while i + 8 <= n:
        length = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length:
            break
        if ctype == b"tEXt":
            k, _, v = data.partition(b"\x00")
            out.append(
                (k.decode("latin-1", "replace"), v.decode("latin-1", "replace"))
            )
        elif ctype == b"iTXt":
            k, _, rest = data.partition(b"\x00")
            if len(rest) >= 2:
                comp_flag = rest[0]
                rest = rest[2:]  # skip compression flag + method
                _lang, _, rest = rest.partition(b"\x00")
                _translated, _, txt = rest.partition(b"\x00")
                if comp_flag == 1:
                    try:
                        txt = zlib.decompress(txt)
                    except zlib.error:
                        txt = b""
                if txt:
                    out.append(
                        (k.decode("latin-1", "replace"),
                         txt.decode("utf-8", "replace"))
                    )
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    return out


def _exif_ascii_strings(app1: bytes) -> list[tuple[str, str]]:
    """IFD0 ASCII tags from one APP1 Exif segment body (after the marker)."""
    if not app1.startswith(b"Exif\x00\x00"):
        return []
    tiff = app1[6:]
    if len(tiff) < 8:
        return []
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return []
    try:
        (magic,) = struct.unpack_from(endian + "H", tiff, 2)
        if magic != 42:
            return []
        (ifd_off,) = struct.unpack_from(endian + "I", tiff, 4)
        (n_entries,) = struct.unpack_from(endian + "H", tiff, ifd_off)
    except struct.error:
        return []
    out: list[tuple[str, str]] = []
    for e in range(n_entries):
        base = ifd_off + 2 + 12 * e
        try:
            tag, typ, count = struct.unpack_from(endian + "HHI", tiff, base)
        except struct.error:
            break
        if typ != 2 or tag not in _EXIF_ASCII_TAGS:  # type 2 = ASCII
            continue
        if count <= 4:
            raw = tiff[base + 8 : base + 8 + count]
        else:
            try:
                (off,) = struct.unpack_from(endian + "I", tiff, base + 8)
            except struct.error:
                continue
            raw = tiff[off : off + count]
        s = raw.split(b"\x00")[0].decode("latin-1", "replace")
        if s:
            out.append((f"exif:{_EXIF_ASCII_TAGS[tag]}", s))
    return out


def jpeg_text_segments(payload: bytes) -> list[tuple[str, str]]:
    """(source, text) pairs from COM segments and EXIF APP1 ASCII tags, in
    segment order. COM bytes are decoded as UTF-8 with replacement (the
    segment has no declared encoding)."""
    out: list[tuple[str, str]] = []
    if len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return out
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # 0xFF fill-byte padding before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0xDA:  # SOS: entropy-coded data follows — stop walking
            break
        try:
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        except struct.error:
            break
        data = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xFE:  # COM
            s = data.decode("utf-8", "replace")
            out.append(("com", s))
        elif marker == 0xE1:  # APP1 (Exif)
            out.extend(_exif_ascii_strings(data))
        i += 2 + seg_len
    return out


def extract_raster_meta(
    payload: bytes, kind: str, cfg: ExtractConfig = DEFAULT_CONFIG
) -> PageResult | None:
    """PNG/JPEG payload → one PageResult of its metadata text, or None when
    the file carries no text (the caller passes the row through as
    ``succeeded_noop``, FIXTURES.md §3c)."""
    if kind == "png":
        items = png_text_chunks(payload)
        title_raw = next((v for k, v in items if k == "Title"), None)
    elif kind == "jpeg":
        items = jpeg_text_segments(payload)
        title_raw = None
    else:
        return None
    texts = [" ".join(v.split()) for _k, v in items]
    texts = [t for t in texts if t]
    if not texts:
        return None
    title = " ".join(title_raw.split()) if title_raw else None
    # same frozen span/offset assembly as the HTML kernels (one source of
    # truth for the byte-offset math); 'meta' is not a markdown-rendered kind
    return assemble_page([("meta", None, t) for t in texts], cfg, title or None)
