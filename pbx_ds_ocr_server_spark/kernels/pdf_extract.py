"""PDF layout-parse kernel (replaces ops T1+T6 for the PDF branch).

The reference renders PDF pages to rasters at 144 DPI and OCRs them
(``/root/reference/app/services/dsocr_model.py:144-174,415-457``); per the
north rule we parse the PDF text/layout directly instead:

  object scan → page tree (/Pages /Kids order, falling back to appearance
  order) → content-stream decode (plain or FlateDecode) → text-operator
  interpreter (BT/ET, Tm/Td/TD/T*, Tj/TJ/') tracking the text cursor →
  reading-order sort of text items by ``(-round(y), x)`` (PDF y grows upward,
  so visual top-to-bottom = descending y) → span assembly.

Page-count semantics mirror ``get_pdf_page_count``
(``/root/reference/app/utils/pdf.py:12-23``): ``None`` on any parse failure
(e.g. the reference's own 14-byte fixture ``b"%PDF-1.4\\n%EOF"``), never an
exception. Page selection honors the reference's ``_parse_page_ranges`` order
(``dsocr_model.py:106-141``) including its quirk that ``"5,1"`` processes page
5 before page 1 — the merged text follows processing order.

Pure function of (payload bytes, config); zlib is the only dependency.
"""

from __future__ import annotations

import re
import zlib

from pbx_ds_ocr_server_spark.config import DEFAULT_CONFIG, ExtractConfig
from pbx_ds_ocr_server_spark.kernels.html_extract import PageResult, Span
from pbx_ds_ocr_server_spark.kernels.page_ranges import parse_page_ranges

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_FLATE_RE = re.compile(rb"/Filter\s*/FlateDecode\b")

# content-stream tokens: strings, arrays, numbers, names, operators
_TOK_RE = re.compile(
    rb"""\((?:[^()\\]|\\.)*\)      # literal string
      | \[ | \]
      | /[A-Za-z0-9.#_-]+
      | [-+]?\d*\.?\d+
      | [A-Za-z'"*]+
    """,
    re.VERBOSE | re.DOTALL,
)

_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string body (between parens) incl. escapes."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and raw[j : j + 1].isdigit():
                    oct_digits += raw[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return out.decode("utf-8", errors="replace")


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_N_RE = re.compile(rb"/N\s+(\d+)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _expand_objstm(body: bytes, out: dict[int, bytes]) -> None:
    """Unpack a cross-reference object stream (/Type /ObjStm): header is N
    (obj-number, offset) integer pairs, then the concatenated objects at
    /First. Objects inside are invisible to the raw ``N 0 obj`` scan, so
    modern xref-stream PDFs need this expansion."""
    nm = _N_RE.search(body)
    fm = _FIRST_RE.search(body)
    sm = _STREAM_RE.search(body)
    if not (nm and fm and sm):
        return
    data = sm.group(1)
    if _FLATE_RE.search(body):
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return
    n = int(nm.group(1))
    first = int(fm.group(1))
    header = data[:first].split()
    if len(header) < 2 * n:
        return
    pairs = [
        (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
    ]
    for i, (obj_num, off) in enumerate(pairs):
        start = first + off
        end = first + pairs[i + 1][1] if i + 1 < n else len(data)
        out.setdefault(obj_num, data[start:end])


def _parse_objects(payload: bytes) -> dict[int, bytes]:
    out = {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(payload)}
    for body in list(out.values()):
        if _OBJSTM_RE.search(body):
            _expand_objstm(body, out)
    return out


def _page_object_ids(objects: dict[int, bytes]) -> list[int]:
    """Page ids in document order: via the /Pages /Kids tree when present,
    else object-appearance order."""
    page_ids = [oid for oid, body in objects.items() if _TYPE_PAGE_RE.search(body)]
    if not page_ids:
        return []
    page_set = set(page_ids)
    for body in objects.values():
        if _TYPE_PAGES_RE.search(body):
            kids = _KIDS_RE.search(body)
            if kids:
                ordered = [
                    int(m.group(1))
                    for m in _REF_RE.finditer(kids.group(1))
                    if int(m.group(1)) in page_set
                ]
                if ordered:
                    # append any orphan pages not reachable from the tree
                    ordered += [p for p in page_ids if p not in set(ordered)]
                    return ordered
    return page_ids


def pdf_page_count(payload: bytes) -> int | None:
    """None on parse failure (mirrors /root/reference/app/utils/pdf.py:12-23)."""
    if not payload or not payload.startswith(b"%PDF-"):
        return None
    try:
        pages = _page_object_ids(_parse_objects(payload))
    except Exception:
        return None
    return len(pages) if pages else None


def _content_stream(objects: dict[int, bytes], page_body: bytes) -> bytes:
    m = _CONTENTS_RE.search(page_body)
    body = objects.get(int(m.group(1)), b"") if m else page_body
    sm = _STREAM_RE.search(body)
    if not sm:
        return b""
    data = sm.group(1)
    if _FLATE_RE.search(body):
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return b""
    return data


def _text_items(stream: bytes) -> list[tuple[float, float, str]]:
    """Interpret text-showing operators → [(x, y, text)] in stream order."""
    items: list[tuple[float, float, str]] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (for T*)
    leading = 0.0
    stack: list[bytes] = []
    in_array: list[bytes] | None = None
    for m in _TOK_RE.finditer(stream):
        tok = m.group(0)
        if tok == b"[":
            in_array = []
            continue
        if tok == b"]":
            stack.append(b"ARRAY")
            continue
        if tok.startswith(b"("):
            if in_array is not None:
                in_array.append(tok)
            else:
                stack.append(tok)
            continue
        if tok.startswith(b"/") or re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            if in_array is not None and not tok.startswith(b"/"):
                continue  # kerning numbers inside TJ arrays are ignored
            stack.append(tok)
            continue
        # operator
        op = tok
        if op == b"Td" or op == b"TD":
            if len(stack) >= 2:
                try:
                    ty = float(stack[-1])
                    tx = float(stack[-2])
                    lx, ly = lx + tx, ly + ty
                    x, y = lx, ly
                    if op == b"TD":
                        leading = -ty
                except ValueError:
                    pass
        elif op == b"Tm":
            if len(stack) >= 6:
                try:
                    f = float(stack[-1]); e = float(stack[-2])
                    x = lx = e
                    y = ly = f
                except ValueError:
                    pass
        elif op == b"T*":
            ly -= leading
            x, y = lx, ly
        elif op == b"TL":
            if stack:
                try:
                    leading = float(stack[-1])
                except ValueError:
                    pass
        elif op == b"Tj" or op == b"'":
            if op == b"'":
                ly -= leading
                x, y = lx, ly
            if stack and stack[-1].startswith(b"("):
                s = _decode_pdf_string(stack[-1][1:-1])
                if s:
                    items.append((x, y, s))
        elif op == b"TJ":
            if in_array is not None:
                s = "".join(
                    _decode_pdf_string(t[1:-1]) for t in in_array
                )
                if s:
                    items.append((x, y, s))
            in_array = None
        elif op == b"BT":
            x = y = lx = ly = 0.0
            leading = 0.0
        in_array = None
        stack = []
    return items


_DO_RE = re.compile(rb"/([A-Za-z0-9]+)\s+Do\b")
_INFO_TITLE_RE = re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)")


def pdf_title(payload: bytes) -> str | None:
    """Document title from the Info dictionary (``/Title (...)``), if any."""
    m = _INFO_TITLE_RE.search(payload)
    if not m:
        return None
    t = " ".join(_decode_pdf_string(m.group(1)).split())
    return t or None


def extract_pdf(
    payload: bytes, cfg: ExtractConfig = DEFAULT_CONFIG
) -> list[PageResult]:
    """Extract selected pages → list[PageResult] in *processing order*
    (the parse_page_ranges output order — part of the byte-identity
    contract, see module docstring)."""
    objects = _parse_objects(payload)
    page_ids = _page_object_ids(objects)
    total = len(page_ids)
    if total == 0:
        return []
    wanted = parse_page_ranges(cfg.page_ranges, total)
    results: list[PageResult] = []
    sep_bytes = len(cfg.page_separator.encode("utf-8"))
    for page_index in wanted:
        body = objects.get(page_ids[page_index - 1], b"")
        stream = _content_stream(objects, body)
        items = _text_items(stream)
        # reading-order sort: visual top-to-bottom (descending y), then x
        items.sort(key=lambda it: (-round(it[1], 1), round(it[0], 1)))
        spans: list[Span] = []
        parts: list[str] = []
        byte_off = 0
        for ix, iy, itext in items:
            t = itext.strip()
            if not t:
                continue
            if parts:
                byte_off += sep_bytes
            blen = len(t.encode("utf-8"))
            spans.append(
                Span(
                    page_index=page_index,
                    kind="text",
                    bbox=[ix, iy, ix, iy],
                    start=byte_off,
                    end=byte_off + blen,
                    text=t,
                )
            )
            parts.append(t)
            byte_off += blen
        for fm in _DO_RE.finditer(stream):
            spans.append(
                Span(
                    page_index=page_index,
                    kind="figure",
                    bbox=[0.0, 0.0, 0.0, 0.0],
                    start=byte_off,
                    end=byte_off,
                    text="",
                )
            )
        results.append(
            PageResult(
                page_index=page_index,
                text=cfg.page_separator.join(parts),
                spans=spans,
            )
        )
    return results
