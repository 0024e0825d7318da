"""Pure-Python PNG pixel codec — closes the round-5 multimodal decode stub.

Same dependency footprint as the PDF kernel (stdlib ``zlib``/``struct``
only). Scope is the curation-features subset, not a full libpng:

  * decode: 8-bit greyscale (colour type 0), truecolour (2) and
    truecolour+alpha (6), non-interlaced, all five scanline filters
    (None/Sub/Up/Average/Paeth per the PNG spec §9 filter algorithms).
    Palette, sub-8-bit, 16-bit and Adam7-interlaced images decline with a
    typed :class:`PngUnsupported` — never garbage pixels.
  * encode: the same subset, used by tests and the driver slot's
    deterministic synthetic images (the per-row filter CYCLE exercises
    every unfilter path on decode — a broken Paeth shows up as a wrong
    luminance mean, which the DuckDB oracle predicts in closed form).

Reference analog: the reference routes raster payloads to a GPU OCR model
(`/root/reference/app/services/dsocr_model.py:368-405`) and therefore
consumes pixels; this kernel gives the Spark engine the same pixel access
for curation features without an image library.

Decompression safety: IDAT is inflated with a decompressobj bounded to the
exact expected scanline byte count — a zlib bomb cannot expand past
``height*(1+width*channels)`` bytes, and a stream that disagrees with the
header declines typed.
"""

from __future__ import annotations

import math
import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # grey, RGB, RGBA

# Cap decode WORK, not just allocation: this is a per-byte pure-Python
# unfilter loop, so the bound must be what the loop can actually chew in
# bounded time, matching the PDF kernel's capped-cost-per-doc convention
# (_MAX_CMAP_ENTRIES, the 0x10000 CIDToGIDMap cap). 2 MPx covers
# 1920x1080; an in-bounds worst case (RGBA, all-Paeth rows) is ~8M loop
# iterations ≈ seconds, not the minutes+GB a 64 MPx bound would permit.
MAX_PIXELS = 2 * 1024 * 1024


class PngUnsupported(ValueError):
    """Valid-but-out-of-scope PNG (palette/16-bit/interlaced) or a stream
    that contradicts its own header."""


def _chunks(payload: bytes):
    i = 8
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        # the FULL chunk (data + 4-byte CRC) must be present: a payload
        # cut inside the trailing CRC is as truncated as one cut inside
        # the data, and must decline the same way
        if i + 12 + length > n:
            raise PngUnsupported("truncated chunk")
        yield ctype, payload[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise PngUnsupported("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw pixel bytes row-major). Raises
    :class:`PngUnsupported` for out-of-scope or inconsistent streams and
    ``ValueError`` for non-PNG bytes."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            # spec (11.2.2): IHDR is the FIRST chunk and appears once — a
            # second IHDR is a forgery vector (header-vs-pixels mismatch)
            if width is not None:
                raise PngUnsupported("duplicate IHDR")
            if len(data) < 13:
                raise PngUnsupported("short IHDR")
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data[:13])
            )
            if depth != 8:
                raise PngUnsupported(f"bit depth {depth} out of scope")
            if color not in _CHANNELS:
                raise PngUnsupported(f"colour type {color} out of scope")
            if interlace != 0:
                raise PngUnsupported("Adam7 interlace out of scope")
            if comp != 0 or filt != 0:
                raise PngUnsupported("nonzero compression/filter method")
            if width == 0 or height == 0 or width * height > MAX_PIXELS:
                raise PngUnsupported(f"dimensions {width}x{height}")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise PngUnsupported("missing IHDR")
    stride = width * channels
    expected = height * (1 + stride)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expected)
    except zlib.error as e:
        raise PngUnsupported(f"IDAT inflate failed: {e}") from None
    if len(raw) != expected or d.unconsumed_tail:
        raise PngUnsupported(
            f"scanline bytes {len(raw)} != expected {expected}"
        )
    out = bytearray(height * stride)
    prev = bytes(stride)
    bpp = channels
    for y in range(height):
        off = y * (1 + stride)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngUnsupported(f"filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def png_chunk(ctype: bytes, data: bytes) -> bytes:
    """length + type + data + crc32 framing — shared with the corpus
    generator so the two writers cannot drift."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_cycle: bool = True,
) -> bytes:
    """Encode raw row-major pixel bytes. ``filter_cycle`` applies filter
    ``y % 5`` to row y (all five filter paths round-trip through decode);
    False writes filter 0 everywhere."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    if color_type not in _CHANNELS:
        raise ValueError(
            f"colour type {color_type} out of scope (grey/RGB/RGBA only)"
        )
    channels = _CHANNELS[color_type]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match dimensions")
    bpp = channels
    lines = bytearray()
    prev = bytes(stride)
    for y in range(height):
        rawl = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5 if filter_cycle else 0
        enc = bytearray(rawl)
        if ftype == 1:
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (enc[i] - rawl[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = rawl[i - bpp] if i >= bpp else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = rawl[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                enc[i] = (enc[i] - _paeth(a, prev[i], c)) & 0xFF
        lines.append(ftype)
        lines += enc
        prev = rawl
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + png_chunk(b"IEND", b"")
    )


def png_pixel_stats(payload: bytes) -> dict:
    """Decode and summarize for curation: verified dimensions + luminance
    statistics + byte entropy of the luminance plane.

    luma for RGB/RGBA is the exact rational (r+g+b)/3 per pixel (alpha
    ignored); entropy is Shannon bits over the 256-bin histogram of
    FLOORED luma, summed in ascending bin order (the DuckDB oracle mirrors
    the same histogram algebra)."""
    width, height, channels, raw = png_decode(payload)
    n = width * height
    hist = [0] * 256
    if channels == 1:
        total = 0
        for b in raw:
            hist[b] += 1
            total += b
        mean = total / n
    else:
        total3 = 0
        for i in range(0, len(raw), channels):
            s = raw[i] + raw[i + 1] + raw[i + 2]
            hist[s // 3] += 1
            total3 += s
        mean = total3 / (3 * n)
    ent = 0.0
    for c in hist:
        if c:
            p = c / n
            ent -= p * math.log2(p)
    return {
        "px_width": width,
        "px_height": height,
        "channels": channels,
        "n_px": n,
        "luma_mean": mean,
        "luma_entropy": ent,
    }
