"""Magic-bytes content-type sniff (op S4, SURVEY.md §2.1).

Replaces the reference's filename-extension whitelist
(``/root/reference/app/storage/local.py:34-37`` — {.pdf,.png,.jpg,.jpeg}) with
payload sniffing, since table rows carry bytes, not filenames. The same four
families are recognized, plus HTML as the default web-page case.
"""

from __future__ import annotations

PDF = "pdf"
PNG = "png"
JPEG = "jpeg"
HTML = "html"
EMPTY = "empty"
UNKNOWN = "unknown"

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def detect_content_type(payload: bytes | None) -> str:
    """Classify a payload into {pdf,png,jpeg,html,empty,unknown}."""
    if not payload:
        return EMPTY
    if payload.startswith(b"%PDF-"):
        return PDF
    if payload.startswith(_PNG_MAGIC):
        return PNG
    if payload.startswith(b"\xff\xd8\xff"):
        return JPEG
    head = payload[:1024].lstrip(b" \t\r\n\f\xef\xbb\xbf")
    low = head[:256].lower()
    if low.startswith(b"<!doctype html") or low.startswith(b"<html"):
        return HTML
    if b"<" in head[:64] and b">" in head:
        return HTML  # permissive: fragments without doctype still parse as HTML
    # Text-looking payloads (no NUL in first KB) are treated as HTML-ish text.
    if b"\x00" not in payload[:1024]:
        return HTML
    return UNKNOWN
