"""Pure-Python PNG pixel codec — closes the round-5 multimodal decode stub.

Same dependency footprint as the PDF kernel (stdlib ``zlib``/``struct``
only). Scope is the curation-features subset, not a full libpng — round 7
closed the round-6 decline surfaces (palette, sub-8/16-bit, Adam7):

  * decode: colour types 0 (grey), 2 (RGB), 3 (palette, expanded to RGB),
    4 (grey+alpha) and 6 (RGBA); bit depths 8 everywhere, 16 for the
    non-palette types (downsampled to the most-significant byte — the
    standard 8-bit reduction), and 1/2/4 for grey and palette (grey
    samples scale by 255/(2^d-1), palette indices look up PLTE); both
    sequential and Adam7-interlaced pixel layouts; all five scanline
    filters (None/Sub/Up/Average/Paeth per spec §9) applied per
    interlace pass. Output is always logical 8-bit samples, row-major.
  * strictness: every chunk's CRC32 is verified against its trailer;
    any chunk before IHDR, a duplicate IHDR, a truncated chunk, a
    missing IEND, an out-of-range palette index, trailing garbage after
    the zlib stream, an unterminated stream, or a scanline byte count
    that disagrees with the header all decline with a typed
    :class:`PngUnsupported` — never garbage pixels.
  * encode: the same subset (used by tests and the driver slot's
    deterministic synthetic images — the per-row filter CYCLE exercises
    every unfilter path on decode, and the palette/16-bit/Adam7 encode
    variants exercise every layout path; a broken Paeth or a misplaced
    Adam7 pixel shows up as a wrong luminance mean, which the DuckDB
    oracle predicts in closed form).

Reference analog: the reference routes raster payloads to a GPU OCR model
(`/root/reference/app/services/dsocr_model.py:368-405`) after PIL opens
any mode (`dsocr_model.py:58-78`); this kernel gives the Spark engine the
same pixel access for curation features without an image library.

Decompression safety: IDAT is inflated with a decompressobj bounded to the
exact expected scanline byte count — a zlib bomb cannot expand past the
header-implied total, and a stream that disagrees with the header (too
short, too long, unterminated, or followed by garbage) declines typed.
"""

from __future__ import annotations

import math
import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel as stored in the stream / as returned by png_decode
# (palette indices expand to RGB on output)
_SRC_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_OUT_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
           4: (8, 16), 6: (8, 16)}

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per spec §8.2
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# Cap decode WORK, not just allocation: this is a per-byte pure-Python
# unfilter loop, so the bound must be what the loop can actually chew in
# bounded time, matching the PDF kernel's capped-cost-per-doc convention
# (_MAX_CMAP_ENTRIES, the 0x10000 CIDToGIDMap cap). 2 MPx covers
# 1920x1080; an in-bounds worst case (RGBA-16, all-Paeth rows) is ~16M
# loop iterations ≈ seconds, not the minutes+GB a 64 MPx bound permits.
MAX_PIXELS = 2 * 1024 * 1024


class PngUnsupported(ValueError):
    """Valid-but-out-of-scope PNG or a stream that contradicts its own
    header / framing (bad CRC, trailing garbage, truncation...)."""


def _chunks(payload: bytes):
    i = 8
    n = len(payload)
    seen_ihdr = False
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        # the FULL chunk (data + 4-byte CRC) must be present: a payload
        # cut inside the trailing CRC is as truncated as one cut inside
        # the data, and must decline the same way
        if i + 12 + length > n:
            raise PngUnsupported("truncated chunk")
        # spec (11.2.2): IHDR is the FIRST chunk — any other chunk before
        # it means the stream is not a conforming PNG
        if not seen_ihdr:
            if ctype != b"IHDR":
                raise PngUnsupported(
                    f"chunk {ctype!r} before IHDR"
                )
            seen_ihdr = True
        data = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[i + 8 + length : i + 12 + length]
        )
        # a bit-corrupted but length-consistent chunk must not decode to
        # wrong pixels with decode_ok=true — verify, don't just frame
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngUnsupported(f"chunk {ctype!r} CRC mismatch")
        yield ctype, data
        i += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            # ninth-review fix, strictness parity with the JPEG codec's
            # trailing-data-after-EOI decline: bytes after IEND are the
            # classic append-smuggling vector (PNG+ZIP polyglots) and
            # must not get decode_ok
            if i != n:
                raise PngUnsupported("trailing data after IEND")
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


def _pass_dims(width: int, height: int, interlace: int):
    """→ list of (x0, y0, xstep, ystep, pass_w, pass_h), empty passes
    dropped. Sequential layout is the single full-frame 'pass'."""
    if interlace == 0:
        return [(0, 0, 1, 1, width, height)]
    out = []
    for x0, y0, xs, ys in ADAM7_PASSES:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if pw > 0 and ph > 0:
            out.append((x0, y0, xs, ys, pw, ph))
    return out


def _unfilter_pass(raw: bytes, off: int, w: int, h: int,
                   bits_per_px: int) -> tuple[list[bytearray], int]:
    """Unfilter one (sub-)image of ``h`` scanlines of ``w`` pixels at
    ``bits_per_px`` starting at ``raw[off]``. → (scanlines, bytes read)."""
    stride = (w * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)
    prev = bytes(stride)
    lines = []
    for _ in range(h):
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
        lines.append(line)
        prev = bytes(line)
        off += 1 + stride
    return lines, h * (1 + stride)


def _line_samples(line: bytes | bytearray, w: int, depth: int,
                  src_ch: int, scale: bool) -> list[int]:
    """One unfiltered scanline → ``w * src_ch`` logical samples. depth 16
    keeps the high byte; depths 1/2/4 unpack MSB-first and (for grey)
    scale by 255/(2^d-1); depth 8 is the identity."""
    n = w * src_ch
    if depth == 8:
        return list(line[:n])
    if depth == 16:
        return list(line[0 : 2 * n : 2])
    # sub-8-bit: only valid with src_ch == 1 (grey or palette indices)
    factor = 255 // ((1 << depth) - 1) if scale else 1
    mask = (1 << depth) - 1
    out = []
    per_byte = 8 // depth
    for i in range(n):
        byte = line[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append(((byte >> shift) & mask) * factor)
    return out


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, logical-8-bit pixel bytes row-major;
    palette images expand to RGB). Raises :class:`PngUnsupported` for
    out-of-scope or inconsistent streams and ``ValueError`` for non-PNG
    bytes."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    width = height = None
    depth = color = interlace = 0
    palette: list[tuple[int, int, int]] | None = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            # _chunks guarantees IHDR came first; a SECOND IHDR is a
            # forgery vector (header-vs-pixels mismatch)
            if width is not None:
                raise PngUnsupported("duplicate IHDR")
            if len(data) < 13:
                raise PngUnsupported("short IHDR")
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data[:13])
            )
            if color not in _SRC_CHANNELS:
                raise PngUnsupported(f"colour type {color} out of scope")
            if depth not in _DEPTHS[color]:
                raise PngUnsupported(
                    f"bit depth {depth} invalid for colour type {color}"
                )
            if interlace not in (0, 1):
                raise PngUnsupported(f"interlace method {interlace}")
            if comp != 0 or filt != 0:
                raise PngUnsupported("nonzero compression/filter method")
            if width == 0 or height == 0 or width * height > MAX_PIXELS:
                raise PngUnsupported(f"dimensions {width}x{height}")
        elif ctype == b"PLTE":
            if color in (0, 4):
                raise PngUnsupported("PLTE forbidden for greyscale")
            if palette is not None or idat:
                raise PngUnsupported("duplicate or post-IDAT PLTE")
            if len(data) == 0 or len(data) % 3:
                raise PngUnsupported(f"PLTE length {len(data)}")
            palette = [
                (data[j], data[j + 1], data[j + 2])
                for j in range(0, len(data), 3)
            ]
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise PngUnsupported("missing IHDR")
    if color == 3 and palette is None:
        raise PngUnsupported("palette image without PLTE")
    src_ch = _SRC_CHANNELS[color]
    out_ch = _OUT_CHANNELS[color]
    bits_per_px = depth * src_ch
    passes = _pass_dims(width, height, interlace)
    expected = sum(
        ph * (1 + (pw * bits_per_px + 7) // 8)
        for _, _, _, _, pw, ph in passes
    )
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expected)
        if not d.eof and d.unconsumed_tail:
            # the cap stopped us mid-stream: either the 4-byte adler
            # trailer is pending (fine) or the stream keeps producing
            # output past the header-implied total (bomb — decline)
            if d.decompress(d.unconsumed_tail, 1):
                raise PngUnsupported(
                    "IDAT stream exceeds header dimensions"
                )
    except zlib.error as e:
        raise PngUnsupported(f"IDAT inflate failed: {e}") from None
    if len(raw) != expected or not d.eof:
        raise PngUnsupported(
            f"scanline bytes {len(raw)} != expected {expected}"
            if len(raw) != expected
            else "unterminated zlib stream"
        )
    if d.unused_data:
        raise PngUnsupported("trailing garbage after zlib stream")
    stride_out = width * out_ch
    out = bytearray(height * stride_out)
    off = 0
    for x0, y0, xs, ys, pw, ph in passes:
        lines, consumed = _unfilter_pass(raw, off, pw, ph, bits_per_px)
        off += consumed
        for j, line in enumerate(lines):
            samples = _line_samples(line, pw, depth, src_ch,
                                    scale=(color != 3))
            y = y0 + j * ys
            for i in range(pw):
                x = x0 + i * xs
                base = y * stride_out + x * out_ch
                if color == 3:
                    idx = samples[i]
                    if idx >= len(palette):
                        raise PngUnsupported(
                            f"palette index {idx} out of range"
                        )
                    out[base : base + 3] = bytes(palette[idx])
                else:
                    out[base : base + out_ch] = bytes(
                        samples[i * src_ch : (i + 1) * src_ch]
                    )
    return width, height, out_ch, bytes(out)


def png_chunk(ctype: bytes, data: bytes) -> bytes:
    """length + type + data + crc32 framing — shared with the corpus
    generator so the two writers cannot drift."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_line(rawl: bytes, prev: bytes, ftype: int, bpp: int,
                 stride: int) -> bytearray:
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
    return enc


def _pack_line(samples: list[int], depth: int, scale: bool) -> bytes:
    """Logical 8-bit samples → one raw scanline at ``depth``. 16-bit
    writes each sample as v*257 (so the high-byte downsample on decode is
    the exact inverse); 1/2/4-bit requires grey samples to be exact
    multiples of the scale factor (palette indices pass through)."""
    if depth == 8:
        return bytes(samples)
    if depth == 16:
        return b"".join(bytes((v, v)) for v in samples)
    factor = 255 // ((1 << depth) - 1) if scale else 1
    per_byte = 8 // depth
    out = bytearray((len(samples) + per_byte - 1) // per_byte)
    for i, v in enumerate(samples):
        code = v // factor
        if code * factor != v or code >= (1 << depth):
            raise ValueError(
                f"sample {v} not representable at bit depth {depth}"
            )
        shift = 8 - depth * (i % per_byte + 1)
        out[i // per_byte] |= code << shift
    return bytes(out)


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_cycle: bool = True,
    depth: int = 8,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode logical 8-bit row-major samples (palette images take one
    INDEX byte per pixel and require ``palette``). ``filter_cycle``
    applies filter ``row % 5`` within each pass (all five filter paths
    round-trip through decode); ``interlace`` writes Adam7 layout."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    if color_type not in _SRC_CHANNELS:
        raise ValueError(f"colour type {color_type} out of scope")
    if depth not in _DEPTHS[color_type]:
        raise ValueError(
            f"bit depth {depth} invalid for colour type {color_type}"
        )
    if (color_type == 3) != (palette is not None):
        raise ValueError("palette iff colour type 3")
    src_ch = _SRC_CHANNELS[color_type]
    if len(pixels) != height * width * src_ch:
        raise ValueError("pixel buffer does not match dimensions")
    if color_type == 3 and any(p >= len(palette) for p in pixels):
        raise ValueError("palette index out of range")
    bits_per_px = depth * src_ch
    bpp = max(1, bits_per_px // 8)
    lines = bytearray()
    for x0, y0, xs, ys, pw, ph in _pass_dims(
        width, height, 1 if interlace else 0
    ):
        stride = (pw * bits_per_px + 7) // 8
        prev = bytes(stride)
        for j in range(ph):
            y = y0 + j * ys
            samples = []
            for i in range(pw):
                x = x0 + i * xs
                samples.extend(
                    pixels[(y * width + x) * src_ch
                           : (y * width + x + 1) * src_ch]
                )
            rawl = _pack_line(samples, depth, scale=(color_type != 3))
            ftype = j % 5 if filter_cycle else 0
            lines.append(ftype)
            lines += _filter_line(rawl, prev, ftype, bpp, stride)
            prev = rawl
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    chunks = PNG_MAGIC + png_chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += png_chunk(
            b"PLTE", b"".join(bytes(rgb) for rgb in palette)
        )
    return (
        chunks
        + png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + png_chunk(b"IEND", b"")
    )


def pixel_stats(width: int, height: int, channels: int,
                raw: bytes) -> dict:
    """Decoded pixels → curation summary: luminance mean + Shannon entropy
    of the 256-bin histogram of FLOORED luma, summed in ascending bin
    order (the DuckDB oracle mirrors the same histogram algebra).

    luma per channel count: 1 → the sample; 2 (grey+alpha) → the grey
    sample (alpha ignored); 3/4 → the exact rational (r+g+b)/3."""
    n = width * height
    hist = [0] * 256
    if channels == 1:
        total = 0
        for b in raw:
            hist[b] += 1
            total += b
        mean = total / n
    elif channels == 2:
        total = 0
        for i in range(0, len(raw), 2):
            v = raw[i]
            hist[v] += 1
            total += v
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


def png_pixel_stats(payload: bytes) -> dict:
    """Decode and summarize for curation — see :func:`pixel_stats`."""
    width, height, channels, raw = png_decode(payload)
    return pixel_stats(width, height, channels, raw)
